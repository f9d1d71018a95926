"""KMV sketch: accuracy bounds, small-set exactness, merge law, plan shape."""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from dq import sketch
from dq.dedup import fingerprint_col


def _fps(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return df.select(fingerprint_col(F.col("text")).alias("fp"))


def test_distinct_estimate_within_bound(spark):
    n = 5000
    fps = _fps(spark, [f"doc body {i}" for i in range(n)])
    row = sketch.kmv_estimate(sketch.kmv_sketch(fps)).collect()[0]
    rel_err = abs(row["est_distinct"] - n) / n
    assert rel_err < 3 / math.sqrt(sketch.KMV_K), rel_err  # ~3 sigma


def test_small_set_is_exact(spark):
    fps = _fps(spark, [f"tiny {i}" for i in range(37)])
    row = sketch.kmv_estimate(sketch.kmv_sketch(fps)).collect()[0]
    assert row["n_sketch"] == 37
    assert row["est_distinct"] == 37.0  # sketch IS the set below k


def test_duplicates_do_not_inflate(spark):
    base = [f"dup doc {i}" for i in range(30)]
    fps = _fps(spark, base * 10)  # 300 rows, 30 distinct
    row = sketch.kmv_estimate(sketch.kmv_sketch(fps)).collect()[0]
    assert row["est_distinct"] == 30.0


def test_sketch_merge_law(spark):
    a = _fps(spark, [f"left {i}" for i in range(800)])
    b = _fps(spark, [f"right {i}" for i in range(800)])
    direct = sketch.kmv_sketch(a.unionByName(b))
    merged = (
        sketch.kmv_sketch(a)
        .unionByName(sketch.kmv_sketch(b))
        .distinct()
        .orderBy("h")
        .limit(sketch.KMV_K)
    )
    assert sorted(r["h"] for r in direct.collect()) == sorted(
        r["h"] for r in merged.collect()
    )


def test_jaccard_estimate_tracks_truth(spark):
    # |A| = |B| = 1200, |A n B| = 600 -> J = 600/1800 = 1/3
    shared = [f"shared {i}" for i in range(600)]
    a = _fps(spark, shared + [f"only-a {i}" for i in range(600)])
    b = _fps(spark, shared + [f"only-b {i}" for i in range(600)])
    row = sketch.kmv_overlap(a, b).collect()[0]
    assert abs(row["jaccard_est"] - 1 / 3) < 0.12  # k=256 -> sigma ~ 0.03
    assert row["est_distinct_a"] == pytest.approx(1200, rel=0.2)


def test_sketch_plan_is_take_ordered(spark):
    fps = _fps(spark, [f"plan {i}" for i in range(100)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sketch.kmv_sketch(fps).explain(mode="formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
