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


def test_doclen_quantile_sketch_rank_error_bound(spark):
    """percentile_approx's GK guarantee: each estimate's true rank is within
    eps*n (+1 slack for the discrete pick) of the target rank, per group."""
    from collections import defaultdict

    from dq.queries import QUANTILE_ACCURACY, QUANTILE_PROBS, doclen_quantiles_approx

    sf = "/root/testdata/sf0.001"
    rows = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("lang", "n_chars")
        .collect()
    )
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r.n_chars)
    out = {r.lang: r for r in doclen_quantiles_approx(spark, sf).collect()}
    assert set(out) == set(by_lang)
    eps = 1.0 / QUANTILE_ACCURACY
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        assert out[lang].n_docs == n
        ests = [out[lang].p25_len, out[lang].p50_len, out[lang].p75_len]
        for p, est in zip(QUANTILE_PROBS, ests):
            rank_lo = sum(1 for v in vals if v < est)   # lowest rank est could hold
            rank_hi = sum(1 for v in vals if v <= est)  # highest rank
            target = p * n
            assert rank_lo - eps * n - 1 <= target <= rank_hi + eps * n + 1, (
                lang, p, est, rank_lo, rank_hi, target)


# ------------------------------------------------------------- benford ------


def test_benford_matches_python_twin(spark):
    from dq.metrics import BENFORD_MICRO, benford_digits

    vals = [2 ** k for k in range(1, 60)] + [0, -5, 7, 77, 777]  # 0/-5 excluded
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    got = {r.digit: (r.obs_cnt, r.exp_micro, r.dev_micro)
           for r in benford_digits(df).collect()}
    pos = [v for v in vals if v > 0]
    n = len(pos)
    from collections import Counter
    obs = Counter(int(str(v)[0]) for v in pos)
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        exp = BENFORD_MICRO[d - 1]
        assert got[d] == (obs.get(d, 0), exp, obs.get(d, 0) * 1_000_000 - exp * n)


def test_benford_powers_of_two_conform(spark):
    """Powers of 2 are a textbook Benford sequence: every digit's absolute
    deviation over 2^1..2^200 stays under 2% of N in micro-units."""
    from dq.metrics import benford_digits

    df = spark.createDataFrame([(str(2 ** k),) for k in range(1, 201)], "s string")
    # keep the magnitude in int64 range: first digit only needs the string
    from pyspark.sql import functions as F
    df = df.select(F.substring("s", 1, 3).cast("long").alias("cents"))
    rows = benford_digits(df).collect()
    n = 200
    assert sum(r.obs_cnt for r in rows) == n
    for r in rows:
        assert abs(r.dev_micro) < 20_000 * n  # < 2% absolute per digit


def test_benford_all_digits_present_even_when_unobserved(spark):
    from dq.metrics import benford_digits

    df = spark.createDataFrame([(100,), (11,), (1,)], "cents long")
    rows = {r.digit: r.obs_cnt for r in benford_digits(df).collect()}
    assert rows == {1: 3, **{d: 0 for d in range(2, 10)}}
