"""Gopher/C4-style heuristic quality rules as native Catalyst expressions.

The reference's qualitativo family expresses all scoring as HiveQL CASE/agg
expressions (qualitativo/VivoPlay.scala:173-186, VivoMoney.scala:91-97); we
follow the same stance for the web-text rules: every metric below is a
built-in-function expression (split / filter / aggregate / regexp), JVM-side
and whole-stage-codegen'd — NO Python in the hot path. A pure-pandas twin
(:func:`heuristic_metrics_pdf`) is the label oracle for the F1>=0.99 test.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# English stopword probe (language+quality signal, C4-style "contains common
# words" rule). Shared by engine + oracle.
STOPWORDS = [
    "the", "of", "and", "to", "in", "that", "it", "was", "for", "on",
    "are", "with", "as", "be", "at", "this", "have", "from", "they", "or",
]

SYMBOL_CLASS = r"[#$%*@!^~]"

# Rule thresholds (Gopher-flavored, tuned to the synthetic corpus; the point
# is identical evaluation in engine and oracle, not the absolute values).
THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "max_symbol_ratio": 0.05,
    "min_stop_ratio": 0.05,
    "min_distinct_stops": 2,
    "max_dup_line_ratio": 0.30,
    "max_ellipsis_line_ratio": 0.30,
    "min_alpha_word_ratio": 0.80,
}


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def with_heuristic_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-doc quality metric columns (all native expressions).

    The token/line arrays are materialized once as temp columns: higher-
    order functions are interpreted (no codegen CSE), so inlining `words`
    into every metric would re-split the text ~12x per row. CollapseProject
    keeps the two-Project split because the array exprs are non-cheap and
    multiply referenced.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    stops = F.array([F.lit(s) for s in STOPWORDS])
    staged = (
        df.withColumn("_hm_text", text)
        .withColumn("_hm_words", _words(F.col("_hm_text")))
        .withColumn("_hm_lines", F.split(F.col("_hm_text"), r"\n"))
        .withColumn(
            "_hm_stop_hits",
            F.filter(F.col("_hm_words"), lambda w: F.array_contains(stops, F.lower(w))),
        )
    )
    text = F.col("_hm_text")
    words = F.col("_hm_words")
    lines = F.col("_hm_lines")
    stop_hits = F.col("_hm_stop_hits")
    n_words = F.size(words)
    n_chars = F.length(text)
    word_chars = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    n_lines = F.size(lines)
    n_symbols = F.length(text) - F.length(F.regexp_replace(text, SYMBOL_CLASS, ""))
    alpha_words = F.filter(words, lambda w: w.rlike("[A-Za-zÀ-ÿ]"))
    ell_lines = F.filter(lines, lambda l: l.endswith("..."))

    return (
        staged.withColumn("n_chars_m", n_chars)
        .withColumn("n_words_m", n_words)
        .withColumn(
            "mean_word_len",
            F.when(n_words > 0, word_chars.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "symbol_ratio",
            F.when(n_chars > 0, n_symbols.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stop_ratio",
            F.when(n_words > 0, F.size(stop_hits).cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn("n_distinct_stops", F.size(F.array_distinct(F.transform(stop_hits, F.lower))))
        .withColumn(
            "dup_line_ratio",
            F.when(
                n_lines > 0,
                (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "ellipsis_line_ratio",
            F.when(n_lines > 0, F.size(ell_lines).cast("double") / n_lines).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "alpha_word_ratio",
            F.when(n_words > 0, F.size(alpha_words).cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .drop("_hm_text", "_hm_words", "_hm_lines", "_hm_stop_hits")
    )


def keep_expr(t: dict | None = None) -> Column:
    """Boolean keep decision over the metric columns."""
    t = t or THRESHOLDS
    return (
        (F.col("n_words_m") >= t["min_words"])
        & (F.col("n_words_m") <= t["max_words"])
        & (F.col("mean_word_len") >= t["min_mean_word_len"])
        & (F.col("mean_word_len") <= t["max_mean_word_len"])
        & (F.col("symbol_ratio") <= t["max_symbol_ratio"])
        & (F.col("stop_ratio") >= t["min_stop_ratio"])
        & (F.col("n_distinct_stops") >= t["min_distinct_stops"])
        & (F.col("dup_line_ratio") <= t["max_dup_line_ratio"])
        & (F.col("ellipsis_line_ratio") <= t["max_ellipsis_line_ratio"])
        & (F.col("alpha_word_ratio") >= t["min_alpha_word_ratio"])
    )


# ---------------------------------------------------------------- oracle ---

_WS = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only; Python str \s is not
_SYM = re.compile(SYMBOL_CLASS)
_ALPHA = re.compile(r"[A-Za-zÀ-ÿ]")
_STOPSET = set(STOPWORDS)


def _metrics_one(text: str | None) -> dict:
    text = text or ""
    words = [w for w in _WS.split(text) if w != ""]
    lines = text.split("\n") if text != "" else []
    n_words = len(words)
    n_chars = len(text)
    stop_hits = [w for w in words if w.lower() in _STOPSET]
    n_symbols = len(_SYM.findall(text))
    return {
        "n_chars_m": n_chars,
        "n_words_m": n_words,
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "symbol_ratio": (n_symbols / n_chars) if n_chars else 0.0,
        "stop_ratio": (len(stop_hits) / n_words) if n_words else 0.0,
        "n_distinct_stops": len({w.lower() for w in stop_hits}),
        "dup_line_ratio": ((len(lines) - len(set(lines))) / len(lines)) if lines else 0.0,
        "ellipsis_line_ratio": (sum(1 for l in lines if l.endswith("...")) / len(lines)) if lines else 0.0,
        "alpha_word_ratio": (sum(1 for w in words if _ALPHA.search(w)) / n_words) if n_words else 0.0,
    }


def heuristic_metrics_pdf(texts: pd.Series, t: dict | None = None) -> pd.DataFrame:
    """Pandas oracle twin: metrics + keep label, same names as the engine."""
    t = t or THRESHOLDS
    out = pd.DataFrame([_metrics_one(x) for x in texts], index=texts.index)
    out["keep_heuristic"] = (
        (out.n_words_m >= t["min_words"])
        & (out.n_words_m <= t["max_words"])
        & (out.mean_word_len >= t["min_mean_word_len"])
        & (out.mean_word_len <= t["max_mean_word_len"])
        & (out.symbol_ratio <= t["max_symbol_ratio"])
        & (out.stop_ratio >= t["min_stop_ratio"])
        & (out.n_distinct_stops >= t["min_distinct_stops"])
        & (out.dup_line_ratio <= t["max_dup_line_ratio"])
        & (out.ellipsis_line_ratio <= t["max_ellipsis_line_ratio"])
        & (out.alpha_word_ratio >= t["min_alpha_word_ratio"])
    )
    return out


# ---- per-rule fail attribution (single source for Spark + oracle) ----------
#
# (rule_name, metric_key, op, threshold_key): a doc FAILS the rule when
# `metric op THRESHOLDS[threshold_key]` holds. keep_expr above is exactly
# the conjunction of the negations; queries.filter_overlap_matrix and its
# DuckDB twin both generate their comparisons from THIS list, so a
# threshold change can never desynchronize the three.
RULE_DEFS: list[tuple[str, str, str, str]] = [
    ("too_few_words", "n_words", "<", "min_words"),
    ("too_many_words", "n_words", ">", "max_words"),
    ("word_len_low", "mean_word_len", "<", "min_mean_word_len"),
    ("word_len_high", "mean_word_len", ">", "max_mean_word_len"),
    ("symbol_heavy", "symbol_ratio", ">", "max_symbol_ratio"),
    ("stopword_poor", "stop_ratio", "<", "min_stop_ratio"),
    ("stop_variety_low", "n_distinct_stops", "<", "min_distinct_stops"),
    ("dup_lines", "dup_line_ratio", ">", "max_dup_line_ratio"),
    ("ellipsis_heavy", "ellipsis_line_ratio", ">", "max_ellipsis_line_ratio"),
    ("alpha_poor", "alpha_word_ratio", "<", "min_alpha_word_ratio"),
]

# the Spark metric frame spells word count n_words_m (with_heuristic_metrics);
# the oracle CTE spells it n_words — map per consumer.
SPARK_METRIC_COLS = {"n_words": "n_words_m"}


def rule_fail_exprs(t: dict | None = None) -> dict[str, Column]:
    """rule -> boolean FAIL Column over with_heuristic_metrics columns."""
    t = t or THRESHOLDS
    ops = {"<": Column.__lt__, ">": Column.__gt__}
    return {
        name: ops[op](F.col(SPARK_METRIC_COLS.get(metric, metric)), F.lit(t[thr]))
        for name, metric, op, thr in RULE_DEFS
    }
