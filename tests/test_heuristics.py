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
