"""dq.mixture — multiplicative-weights domain reweighting: python-twin
bit-equality, mass conservation, tilt monotonicity, uniform fixed point,
single-scan rate aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq.heuristics import keep_expr, with_heuristic_metrics
from dq.mixture import (
    MIX_BP,
    MIX_ROUNDS,
    domain_keep_rates,
    mixture_weights,
    mixture_weights_py,
)

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "source", "text"
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def weights(docs):
    return {
        r.domain: (r.keep_bp, r.excess_bp, r.weight_bp)
        for r in mixture_weights(docs).collect()
    }


def test_python_twin_bit_equality(docs, weights):
    m = with_heuristic_metrics(
        docs.select(F.col("source").alias("domain"), "text")
    )
    agg = (
        m.select(
            "domain",
            F.when(keep_expr(), F.lit(1)).otherwise(F.lit(0)).alias("k"),
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("nk"))
        .collect()
    )
    py = mixture_weights_py({r.domain: (r.n, r.nk) for r in agg})
    assert {d: w for d, (_, _, w) in weights.items()} == py


def test_mass_conserved_up_to_floor_remainder(weights):
    """Floor renormalization loses < 1 bp per domain per round — never
    more, never gains."""
    s = sum(w for _, _, w in weights.values())
    assert MIX_BP - len(weights) < s <= MIX_BP


def test_tilt_monotone_in_excess(weights):
    """More excess never gets less weight, zero-excess domains all end
    equal, and any positive-excess domain beats every zero-excess one."""
    by_excess = sorted((e, w) for _, e, w in weights.values())
    for (e1, w1), (e2, w2) in zip(by_excess, by_excess[1:]):
        if e1 == e2:
            assert w1 == w2
        else:
            assert w1 <= w2
    zero = [w for _, e, w in weights.values() if e == 0]
    pos = [w for _, e, w in weights.values() if e > 0]
    if zero and pos:
        assert max(zero) < min(pos)


def test_uniform_signal_stays_uniform(spark):
    """All domains identical => excess 0 everywhere => the update is a
    no-op and the mixture stays uniform (the Hedge fixed point)."""
    rows = [(i, f"d{i % 4}", "word " * 40) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {r.domain: r.weight_bp for r in mixture_weights(df).collect()}
    assert set(got.values()) == {MIX_BP // 4}


def test_rates_single_scan_single_exchange(spark, docs):
    """(domain, n, n_keep) is ONE map-side-combinable hash agg: exactly one
    exchange in the plan, and the corpus is read once."""
    spark.catalog.clearCache()
    plan = (
        domain_keep_rates(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert MIX_ROUNDS >= 1  # constants wired
