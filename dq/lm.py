"""Kneser-Ney bigram count tables: the LM-training side of perplexity.

Training-data-pipeline addition beyond the reference's table-level DQ scope
(reference: qualitativo/*.scala has no language-model tier). The pipeline
SCORES documents with a KenLM-style n-gram perplexity (dq/perplexity.py);
this module BUILDS the count tables such a model is estimated from, at
corpus scale, as plain hash aggregations — the shape of KenLM's first
counting pass (Heafield 2011) re-expressed as DataFrame ops:

- ``c(w1,w2)``            bigram occurrence counts
- ``c(w1·)``              left-context totals (sum of outgoing bigrams)
- ``N1+(w1·)``            right continuation types (distinct successors)
- ``N1+(·w2)``            left continuation types (distinct predecessors)
- interpolated Kneser-Ney terms with absolute discount D = 0.75, reported
  as exact-integer micro-units (milli-scaled discount so the arithmetic
  never leaves int64)::

      p_kn_micro    = max(1000*c(w1,w2) - 750, 0) * SCALE DIV (1000*c(w1·))
      lambda_micro  = 750 * N1+(w1·) * SCALE DIV (1000*c(w1·))
      cont_micro    = N1+(·w2) * SCALE DIV (total bigram types)

  Real KN works in floats; the integer forms keep the identical ordering
  and are bit-reproducible cross-engine (the documented deviation pattern,
  same as dq/dsir.py).

Scale shape (100 TB notes): text is read once; the gram explode reduces
immediately to (w1, w2) hash-aggs (map-side combinable). The three marginal
tables are term-keyed aggs OVER the already-reduced bigram-type table —
corpus size stops mattering after the first agg. Joins are term-keyed
equi-joins on the type table; the 1-row type total broadcasts (J4 pattern).
Output is floored at ``LM_MIN_COUNT`` occurrences: the hapax-bigram tail
dominates row count and carries only the discount mass, which the
continuation columns already summarize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dq.dedup import tokens_col
from dq.dsir import _bigrams

# ---- shared constants (dq.oracles generates SQL from these) ----------------

LM_SCALE = 1_000_000       # probabilities reported in micro-units
LM_DISCOUNT_MILLI = 750    # absolute discount D = 0.75 in milli-units
LM_MIN_COUNT = 2           # emit bigrams seen at least this many times


def bigram_occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w1, w2) one row per bigram occurrence — the corpus-wide reduce input.

    Staged arrays (the higher-order-capture trap) and explode_outer +
    isNotNull (the InferFiltersFromGenerate guard). Tokens contain no
    whitespace by construction, so splitting the gram on the single space
    recovers (w1, w2) exactly.
    """
    staged = docs.select(
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_w")
    )
    grams = staged.select(_bigrams(F.col("_w")).alias("_g"))
    ex = grams.select(F.explode_outer("_g").alias("_gram")).where(
        F.col("_gram").isNotNull()
    )
    parts = F.split(F.col("_gram"), " ", 2)
    return ex.select(
        F.element_at(parts, 1).alias("w1"), F.element_at(parts, 2).alias("w2")
    )


def kn_bigram_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = LM_MIN_COUNT,
    scale: int = LM_SCALE,
    discount_milli: int = LM_DISCOUNT_MILLI,
) -> DataFrame:
    """(w1, w2, cnt, c_w1, right_types_w1, left_types_w2, p_kn_micro,
    lambda_micro, cont_micro) — the interpolated-KN bigram table.

    All marginals derive from the bigram TYPE table (one row per distinct
    (w1, w2)), so the corpus-sized frame is aggregated exactly once.
    """
    occ = bigram_occurrences(docs, id_col, text_col)
    types = occ.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    left = types.groupBy("w1").agg(
        F.sum("cnt").cast("bigint").alias("c_w1"),
        F.count(F.lit(1)).cast("bigint").alias("right_types_w1"),
    )
    right = types.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("left_types_w2")
    )
    total = types.agg(F.count(F.lit(1)).cast("bigint").alias("_total_types"))
    return (
        types.where(F.col("cnt") >= min_count)
        .join(left.hint("shuffle_hash"), "w1")
        .join(right.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "cnt",
            "c_w1",
            "right_types_w1",
            "left_types_w2",
            F.expr(
                f"greatest(1000 * cnt - {discount_milli}, 0) * {scale} "
                f"DIV (1000 * c_w1)"
            ).cast("bigint").alias("p_kn_micro"),
            F.expr(
                f"{discount_milli} * right_types_w1 * {scale} DIV (1000 * c_w1)"
            ).cast("bigint").alias("lambda_micro"),
            F.expr(f"left_types_w2 * {scale} DIV _total_types")
            .cast("bigint")
            .alias("cont_micro"),
        )
    )
