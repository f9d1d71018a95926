"""As-of join and range join semantics."""

from pyspark.sql import functions as F

from dq.joins import asof_join, range_join_small


def _frames(spark):
    quotes = spark.createDataFrame(
        [("a", 1, 10), ("a", 5, 50), ("a", 5, 51), ("b", 3, 30)],
        "k string, t long, px long",
    )
    trades = spark.createDataFrame(
        [("a", 0, "t0"), ("a", 1, "t1"), ("a", 4, "t2"), ("a", 7, "t3"), ("b", 2, "t4"), ("c", 9, "t5")],
        "k string, t long, tid string",
    )
    return trades, quotes


def test_asof_basic_semantics(spark):
    trades, quotes = _frames(spark)
    # dedup right per (key,time) as the contract requires
    q = quotes.groupBy("k", "t").agg(F.max("px").alias("px"))
    out = {
        r.tid: r.px
        for r in asof_join(trades, q, "k", "k", "t", "t", ["px"]).collect()
    }
    assert out == {
        "t0": None,   # before any quote
        "t1": 10,     # equal time matches (<=)
        "t2": 10,     # latest at-or-before t=4
        "t3": 51,     # t=5 tie deduped to max px
        "t4": None,   # b's quote is at t=3 > 2
        "t5": None,   # key with no right rows at all
    }
    assert asof_join(trades, q, "k", "k", "t", "t", ["px"]).count() == trades.count()


def test_asof_single_exchange_per_side(spark):
    trades, quotes = _frames(spark)
    import contextlib
    import io

    q = quotes.groupBy("k", "t").agg(F.max("px").alias("px"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(trades, q, "k", "k", "t", "t", ["px"]).explain(mode="simple")
    plan = buf.getvalue()
    # no range-explosion joins: the whole thing is union + one window sort
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_range_join_boundaries(spark):
    facts = spark.createDataFrame([(0.0,), (50.0,), (50.5,), (150.0,), (151.0,)], "v double")
    ranges = spark.createDataFrame([("r", 50.0, 150.0)], "range_name string, lo double, hi double")
    got = sorted(r.v for r in range_join_small(facts, ranges, "v").collect())
    assert got == [50.5, 150.0]  # lo exclusive, hi inclusive


def test_langid_broadcast_variant_equal(spark, pages):
    from dq.langid import langid_udf, langid_udf_broadcast

    u1 = pages.select("url", langid_udf(F.col("text")).alias("a")).toPandas()
    u2 = pages.select("url", langid_udf_broadcast(spark)(F.col("text")).alias("a")).toPandas()
    # labels exact; margins agree to float noise (the module-path UDF
    # groups repeated grams before summing, the broadcast path does not)
    assert all(x["lang_pred"] == y["lang_pred"] for x, y in zip(u1["a"], u2["a"]))
    assert all(abs(x["lang_margin"] - y["lang_margin"]) < 1e-9 for x, y in zip(u1["a"], u2["a"]))


def test_asof_carries_whole_row_not_stitched_columns(spark):
    """A newer matching right row's NULL column must stay NULL — per-column
    ignoreNulls carries would reach back to an older row's value and emit a
    composite right row that never existed."""
    from dq.joins import asof_join

    right = spark.createDataFrame(
        [("k", 1, 1, 2), ("k", 2, 3, None)], "rk string, rt int, a int, b int"
    )
    left = spark.createDataFrame([("k", 3)], "lk string, lt int")
    out = asof_join(left, right, "lk", "rk", "lt", "rt", ["a", "b"]).collect()[0]
    assert (out.a, out.b) == (3, None)  # the t=2 row, atomically


def test_asof_rejects_column_collision(spark):
    import pytest

    from dq.joins import asof_join

    right = spark.createDataFrame([("k", 1, 5)], "rk string, rt int, px int")
    left = spark.createDataFrame([("k", 2, 9)], "lk string, lt int, px int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "lk", "rk", "lt", "rt", ["px"])


def test_asof_awkward_right_column_names(spark):
    """Right columns needing quoting (spaces, hyphens) must survive: the
    NULL-struct type is built programmatically from the right schema, not a
    DDL string that would fail to parse on such names (ADVICE r3)."""
    right = spark.createDataFrame(
        [("k", 1, 5, "x")], ["rk", "rt", "px value", "tag-name"]
    )
    left = spark.createDataFrame([("k", 2), ("k", 0)], ["lk", "lt"])
    out = {
        r.lt: (r["px value"], r["tag-name"])
        for r in asof_join(
            left, right, "lk", "rk", "lt", "rt", ["px value", "tag-name"]
        ).collect()
    }
    assert out == {2: (5, "x"), 0: (None, None)}
