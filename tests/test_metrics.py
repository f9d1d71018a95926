"""Qualitativo family: band edges, conditional aggs, profile ratios."""

from decimal import Decimal

from pyspark.sql import functions as F

from dq import metrics


def test_band_col_boundaries(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (50.01,), (100.0,), (999.0,)], "v double")
    out = [
        r.b
        for r in df.select(
            metrics.band_col(F.col("v"), [50.0, 100.0], ["lo", "mid", "hi"]).alias("b")
        ).collect()
    ]
    assert out == ["lo", "lo", "mid", "mid", "hi"]  # upper bounds inclusive


def test_value_band_histogram(spark):
    df = spark.createDataFrame([("a", 10.0), ("a", 60.0), ("b", 10.0)], "g string, v double")
    out = {
        (r.g, r.valor_faixa): r.valor_faixa_qtde
        for r in metrics.value_band_histogram(df, "v", [50.0], group_cols=["g"]).collect()
    }
    assert out == {("a", "<= 50"): 1, ("a", "> 50"): 1, ("b", "<= 50"): 1}


def test_conditional_distinct_counts(spark):
    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 1, 10.0), ("g", 2, 200.0), ("g", 3, 200.0)],
        "g string, uid int, valor double",
    )
    out = metrics.conditional_distinct_counts(
        df, ["g"], "uid",
        {"big_users": F.col("valor") > 100, "all_users": F.lit(True)},
    ).collect()[0]
    assert (out.big_users, out.all_users) == (2, 3)


def test_profile_decimal_sums_and_ratio(spark):
    df = spark.createDataFrame([("g", "1.10"), ("g", "2.20")], "g string, v string").select(
        "g", F.col("v").cast("decimal(10,2)").alias("v")
    )
    out = metrics.profile(
        df, ["g"],
        sums={"total": F.col("v")},
        ratios={"half": (F.sum("v"), F.lit(2))},
    ).collect()[0]
    assert out.total == Decimal("3.30")
    assert out.half == Decimal("1.65")
