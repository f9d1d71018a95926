"""Salting: exactness vs unsalted formulations on a hot-key corpus."""

import pytest
from pyspark.sql import functions as F

from dq import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows on one hot domain (the synth corpus's HOT_DOMAIN shape)."""
    rows = [
        (i, "hot.example.com" if i % 10 != 0 else f"cold{i % 97}.example.org", f"user{i % 400}")
        for i in range(4000)
    ]
    return spark.createDataFrame(rows, "id long, domain string, user string").cache()


def test_salted_distinct_count_exact(spark, skewed):
    got = {
        r.domain: r.user_distinct
        for r in skew.salted_distinct_count(skewed, ["domain"], "user", buckets=8).collect()
    }
    want = {
        r.domain: r.d
        for r in skewed.groupBy("domain").agg(F.count_distinct("user").alias("d")).collect()
    }
    assert got == want


def test_salted_join_exact(spark, skewed):
    small = spark.createDataFrame(
        [("hot.example.com", 1), ("cold0.example.org", 2), ("absent.example", 3)],
        "domain string, w int",
    )
    got = skew.salted_join(skewed, small, "domain", "id", buckets=4).groupBy("domain").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    want = skewed.join(small, "domain").groupBy("domain").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_left_keeps_unmatched(spark, skewed):
    small = spark.createDataFrame([("hot.example.com", 1)], "domain string, w int")
    out = skew.salted_join(skewed, small, "domain", "id", buckets=4, how="left")
    assert out.count() == skewed.count()
    assert out.where(F.col("w").isNull()).count() == skewed.where("domain != 'hot.example.com'").count()


def test_top_keys_detects_hot(spark, skewed):
    hot = skew.top_keys(skewed, "domain", min_fraction=0.5).collect()
    assert len(hot) == 1 and hot[0].domain == "hot.example.com"
    assert hot[0].fraction == pytest.approx(0.9)


def test_hybrid_hot_cold_join_exact(spark, skewed):
    """Hybrid split equals the plain join, inner and left (unmatched hot
    and cold big rows both survive a left join)."""
    small = spark.createDataFrame(
        [("hot.example.com", 1), ("cold0.example.org", 2), ("absent.example", 3)],
        "domain string, w int",
    )
    for how in ("inner", "left"):
        got = skew.hybrid_hot_cold_join(skewed, small, "domain", 0.5, how=how)
        want = skewed.join(small, "domain", how)
        assert sorted(map(tuple, got.select("id", "domain", "w").collect())) == sorted(
            map(tuple, want.select("id", "domain", "w").collect())
        )


def test_hybrid_hot_cold_join_rejects_small_preserving(spark, skewed):
    small = spark.createDataFrame([("hot.example.com", 1)], "domain string, w int")
    with pytest.raises(ValueError, match="hybrid_hot_cold_join supports"):
        skew.hybrid_hot_cold_join(skewed, small, "domain", 0.5, how="right")


def test_hybrid_hot_cold_join_hot_slice_broadcasts(spark, skewed):
    """Plan shape: the hot slice joins via broadcast (its rows never enter
    a join exchange); no cartesian anywhere."""
    import contextlib
    import io

    small = spark.createDataFrame(
        [("hot.example.com", 1), ("cold0.example.org", 2)], "domain string, w int"
    )
    out = skew.hybrid_hot_cold_join(skewed, small, "domain", 0.5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_salt_deterministic(spark, skewed):
    a = skewed.select("id", skew.salt_from(F.col("user"), 8).alias("s")).collect()
    b = skewed.select("id", skew.salt_from(F.col("user"), 8).alias("s")).collect()
    assert a == b
    buckets = {r.s for r in a}
    assert buckets <= set(range(8)) and len(buckets) == 8


# ---------------------------------------------------------------- gini ------


def _gini_row(spark, rows):
    from dq.skew import gini_concentration

    df = spark.createDataFrame([(k,) for k in rows], "source string")
    r = gini_concentration(df, "source").collect()[0]
    return (r.n_keys, r.total_rows, r.gini_ppm, r.top_share_ppm)


def test_gini_uniform_is_zero(spark):
    got = _gini_row(spark, [f"d{i}" for i in range(5) for _ in range(4)])
    assert got == (5, 20, 0, 200_000)


def test_gini_total_concentration_approaches_one(spark):
    """One key owns everything but one row across many keys: G -> (n-1)/n."""
    rows = ["hot"] * 96 + ["c1", "c2", "c3", "c4"]
    n, tot, gini, top = _gini_row(spark, rows)
    assert (n, tot, top) == (5, 100, 960_000)
    # exact integer value: ranks 1..4 on the singles, 5 on the hot key
    ix = 1 + 2 + 3 + 4 + 5 * 96
    expect = (2 * ix - 6 * 100) * 1_000_000 // (5 * 100)
    assert gini == expect and gini > 700_000


def test_gini_matches_python_twin_and_tie_invariance(spark):
    import random

    rng = random.Random(7)
    rows = [f"d{rng.randrange(8)}" for _ in range(200)]
    n, tot, gini, top = _gini_row(spark, rows)
    from collections import Counter

    xs = sorted(Counter(rows).values())
    ix = sum((i + 1) * x for i, x in enumerate(xs))
    assert gini == (2 * ix - (len(xs) + 1) * tot) * 1_000_000 // (len(xs) * tot)
    assert top == max(xs) * 1_000_000 // tot
    # tie-order invariance: equal counts permuted -> same Σ i*x_i
    xs2 = sorted(Counter(rows).values(), reverse=False)
    assert sum((i + 1) * x for i, x in enumerate(xs2)) == ix
