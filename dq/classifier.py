"""Hashed linear quality classifier (fastText-style scoring tier).

Training-data-pipeline addition beyond the reference's table-level DQ scope
(reference: qualitativo/*.scala profiles columns; it has no document scorer).
Published semantics followed: fastText / CCNet-style quality classifiers are
linear models over hashed bag-of-words features — score(doc) =
mean(w[h(token)]) with a decision threshold; docs below the bar are dropped
(CCNet §4.3, GPT-3 appendix A). This module reproduces that *shape* with a
deterministic integer model so the scores are bit-identical across engines:

- feature hash: a 31-ary polynomial rolling hash over the token's code
  points, mod POLY_MOD (exact int64 arithmetic in Spark and DuckDB);
- weight: ``(hash % WEIGHT_SPAN) - (WEIGHT_SPAN//2)`` micro-units — the
  hashing-trick weight table evaluated in-engine, so there is NO model
  artifact to ship at all (a real 2M-bucket fastText table would instead be
  a broadcast map/join — dq/langid.py already demonstrates the
  broadcast-model-artifact pattern for the non-SQL payload);
- a hard negative prior for the shared toxicity lexicon (dq.scrub
  TOXIC_WORDS), so toxic-laced docs score measurably lower;
- decision: keep iff ``score_micro >= KEEP_TAU_MICRO * n_tokens`` — the
  mean-weight threshold cross-multiplied into exact integers (never a
  float division on the decision path).

Scale shape (100 TB notes): the whole scorer is ONE narrow projection —
zero exchanges, zero joins, whole-stage codegen (plan-asserted). The words
array is materialized once in a staging select (the higher-order-function
lambdas then reference the real column, not the expression subtree — see
CLAUDE.md / dq/heuristics.py for the re-evaluation trap this avoids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dq.dedup import tokens_col
from dq.scrub import TOXIC_WORDS

# ---- shared constants (dq.oracles generates SQL from these) ----------------

POLY_MOD = 1_000_000_007   # hash modulus; acc*31 + cp stays far under 2^63
POLY_MUL = 31
WEIGHT_SPAN = 2001         # weights span [-1000, +1000] micro-units
TOXIC_WEIGHT_MICRO = -8000  # hard prior for the shared toxicity lexicon
KEEP_TAU_MICRO = -200      # keep iff mean token weight >= -200 micro


def token_hash(tok: Column) -> Column:
    """Polynomial rolling hash of a token's code points (exact int64)."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * POLY_MUL + F.ascii(c).cast("long")) % POLY_MOD,
    )


def token_weight(tok: Column) -> Column:
    """Hashing-trick weight in micro-units; toxic lexicon overrides."""
    return (
        F.when(tok.isin(TOXIC_WORDS), F.lit(TOXIC_WEIGHT_MICRO).cast("long"))
        .otherwise(token_hash(tok) % WEIGHT_SPAN - WEIGHT_SPAN // 2)
    )


def classifier_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau_micro: int = KEEP_TAU_MICRO,
) -> DataFrame:
    """(doc_id, n_tokens, score_micro, keep_quality) per document.

    ``score_micro`` is the exact integer sum of hashed token weights;
    ``keep_quality`` compares the mean weight against ``tau_micro`` by
    cross-multiplication (empty docs keep trivially: 0 >= 0).
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_w")
    )
    return staged.select(
        "doc_id",
        F.size("_w").cast("long").alias("n_tokens"),
        F.aggregate(
            "_w", F.lit(0).cast("long"), lambda acc, t: acc + token_weight(t)
        ).alias("score_micro"),
    ).select(
        "doc_id",
        "n_tokens",
        "score_micro",
        (F.col("score_micro") >= F.lit(tau_micro) * F.col("n_tokens")).alias(
            "keep_quality"
        ),
    )
