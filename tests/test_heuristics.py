"""Heuristic rules: Spark expressions ≡ pandas oracle (the label contract)."""

import pandas as pd

from dq import heuristics

METRIC_COLS = [
    "n_chars_m",
    "n_words_m",
    "mean_word_len",
    "symbol_ratio",
    "stop_ratio",
    "n_distinct_stops",
    "dup_line_ratio",
    "ellipsis_line_ratio",
    "alpha_word_ratio",
]


def test_metrics_and_label_match_oracle(spark, pages):
    got = (
        heuristics.with_heuristic_metrics(pages)
        .withColumn("keep_heuristic", heuristics.keep_expr())
        .select("url", "text", *METRIC_COLS, "keep_heuristic")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = heuristics.heuristic_metrics_pdf(got["text"])
    for c in METRIC_COLS:
        pd.testing.assert_series_equal(
            got[c], want[c].astype(got[c].dtype), check_names=False, rtol=0, atol=0
        )
    assert (got["keep_heuristic"] == want["keep_heuristic"]).all()


def test_label_f1_vs_oracle(spark, pages):
    """North-rule gate: keep/drop F1 >= 0.99 vs the reference labels."""
    got = (
        heuristics.with_heuristic_metrics(pages)
        .withColumn("keep_heuristic", heuristics.keep_expr())
        .select("text", "keep_heuristic")
        .toPandas()
    )
    want = heuristics.heuristic_metrics_pdf(got["text"])["keep_heuristic"]
    tp = int((got["keep_heuristic"] & want).sum())
    fp = int((got["keep_heuristic"] & ~want).sum())
    fn = int((~got["keep_heuristic"] & want).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99


def test_degenerate_docs_dropped(spark, pages):
    """Planted degenerate docs (short/symbol/repetitive) must fail rules."""
    pdf = pages.select("text").toPandas()
    m = heuristics.heuristic_metrics_pdf(pdf["text"])
    short = m[m.n_words_m < 8]
    assert len(short) > 0 and not short["keep_heuristic"].any()
    symbol = m[m.symbol_ratio > 0.2]
    assert len(symbol) > 0 and not symbol["keep_heuristic"].any()
    repetitive = m[m.dup_line_ratio > 0.5]
    assert len(repetitive) > 0 and not repetitive["keep_heuristic"].any()


def test_empty_and_null_text():
    m = heuristics.heuristic_metrics_pdf(pd.Series(["", None, "word"]))
    assert (m["n_words_m"] == [0, 0, 1]).all()
    assert not m["keep_heuristic"].any()


def test_rule_fail_exprs_conjunction_equals_keep_expr(spark):
    """RULE_DEFS is the single source: the conjunction of the rule
    negations must BE keep_expr — a drifted threshold or missing rule
    fails here before it can desynchronize filter_overlap_matrix."""
    from dq.heuristics import keep_expr, rule_fail_exprs, with_heuristic_metrics

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = with_heuristic_metrics(docs)
    none_fail = None
    for c in rule_fail_exprs().values():
        none_fail = ~c if none_fail is None else none_fail & ~c
    assert m.select((keep_expr() != none_fail).alias("d")).where("d").count() == 0


def test_filter_overlap_matrix_matches_pandas_twin(spark):
    """Pair counts recomputed from the pandas metric oracle
    (heuristic_metrics_pdf — the same batch function the UDF tier uses)."""
    import operator

    from dq.heuristics import (
        RULE_DEFS,
        SPARK_METRIC_COLS,
        THRESHOLDS,
        heuristic_metrics_pdf,
    )
    from dq.queries import filter_overlap_matrix

    sf = "/root/testdata/sf0.001"
    texts = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("text")
        .toPandas()["text"]
    )
    pdf = heuristic_metrics_pdf(texts)  # spells word count n_words_m
    ops = {"<": operator.lt, ">": operator.gt}
    flags = {
        name: (
            ops[op](pdf[SPARK_METRIC_COLS.get(metric, metric)], THRESHOLDS[thr])
        ).astype(int)
        for name, metric, op, thr in RULE_DEFS
    }
    got = {
        (r["rule_a"], r["rule_b"]): (
            r["n_both"], r["n_a_fail"], r["n_b_fail"], r["jaccard_bp"]
        )
        for r in filter_overlap_matrix(spark, sf).collect()
    }
    names = [n for n, *_ in RULE_DEFS]
    assert len(got) == len(names) * (len(names) + 1) // 2
    for (a, b), (n_both, n_a, n_b, j_bp) in got.items():
        exp_both = int((flags[a] * flags[b]).sum())
        exp_a, exp_b = int(flags[a].sum()), int(flags[b].sum())
        assert (n_both, n_a, n_b) == (exp_both, exp_a, exp_b)
        union = exp_a + exp_b - exp_both
        assert j_bp == (10000 * exp_both // union if union > 0 else 0)
        assert n_both <= min(n_a, n_b)
        if a == b and n_a > 0:
            assert j_bp == 10000
