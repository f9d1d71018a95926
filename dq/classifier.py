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
        F.col(id_col).alias("doc_id"), tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_w")
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


CCNET_RATE_SCALE = 1000  # per-token mean weight reported in micro/1000 units


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    scale: int = CCNET_RATE_SCALE,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partitioning (Wenzek et al. 2020
    §4.3): per language, documents split at the tercile edges of a
    per-token model score. CCNet buckets by KenLM perplexity; here the
    deterministic hashed linear scorer stands in — identical partitioning
    machinery, integral end to end.

    ``rate_nano = (score_micro * scale) DIV n_tokens`` (0 for empty docs;
    Spark DIV truncates toward zero — the DuckDB twin emulates truncation
    for negative sums, since ``//`` floors). Edge rule: tail iff
    rate <= e1, middle iff rate <= e2, else head, where e_k is the first
    histogram value whose cumulative count reaches ceil(k*n/3) — the exact
    discrete pick, computed as ``(k*n + 2) DIV 3`` in integers.

    Scale shape: tercile edges come from a per-(lang, rate) HISTOGRAM
    cumulative pick (the qualitativo_percentiles shape — only O(distinct
    rates) rows enter the per-lang window, never the row set); the one-row-
    per-lang edge table broadcast-joins back, so documents never shuffle.
    The scoring projection runs twice (histogram pass + label pass); at
    production scale materialize the rated frame once instead.
    """
    from pyspark.sql import Window

    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
    )
    scored = staged.select(
        "doc_id",
        "lang",
        F.size("_w").cast("long").alias("_n"),
        F.aggregate(
            "_w", F.lit(0).cast("long"), lambda acc, t: acc + token_weight(t)
        ).alias("_s"),
    )
    rated = scored.select(
        "doc_id",
        "lang",
        F.when(F.col("_n") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr(f"(_s * {scale}) DIV _n"))
        .alias("rate_nano"),
    )
    hist = rated.groupBy("lang", "rate_nano").agg(F.count(F.lit(1)).alias("_cnt"))
    per_lang = Window.partitionBy("lang")
    cum = hist.withColumn(
        "_cum",
        F.sum("_cnt").over(
            per_lang.orderBy("rate_nano").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    ).withColumn("_ntot", F.sum("_cnt").over(per_lang))
    edges = cum.groupBy("lang").agg(
        F.min(
            F.when(F.col("_cum") >= F.expr("(_ntot + 2) DIV 3"), F.col("rate_nano"))
        ).alias("_e1"),
        F.min(
            F.when(F.col("_cum") >= F.expr("(2 * _ntot + 2) DIV 3"), F.col("rate_nano"))
        ).alias("_e2"),
    )
    return rated.join(F.broadcast(edges), "lang").select(
        "doc_id",
        "lang",
        "rate_nano",
        F.when(F.col("rate_nano") <= F.col("_e1"), F.lit("tail"))
        .when(F.col("rate_nano") <= F.col("_e2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
    )


def exact_auc(pairs: DataFrame, score_col: str = "score", label_col: str = "k") -> DataFrame:
    """(n_pos, n_neg, auc_num, auc_den, auc_bp): exact ROC-AUC of an
    integer score predicting a 0/1 label — Mann-Whitney U with midranks,
    all int64 (per distinct score the doubled midrank is
    2·cum_below + n_tot + 1, always integral), so
    AUC = auc_num/auc_den = (r2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
    exactly, bit-identical cross-engine. auc_bp is the truncated
    basis-point view (-1 when one class is absent).

    Scale shape: docs cross the exchange once as (score, label) into a
    hash-agg keyed on the score; the cumulative window then runs over
    DISTINCT scores only — for a bounded score domain (keep_bp ≤ 10001
    values) the unpartitioned window is constant-size at any corpus scale
    (the token_budget_packing super-bucket precedent).
    """
    from pyspark.sql.window import Window

    g = pairs.groupBy(score_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tot"),
        F.sum(label_col).cast("bigint").alias("n_pos_s"),
    )
    w = Window.orderBy(score_col).rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("cum_below", F.coalesce(F.sum("n_tot").over(w), F.lit(0)))
    t = r.agg(
        F.sum("n_pos_s").alias("n_pos"),
        F.sum(F.col("n_tot") - F.col("n_pos_s")).alias("n_neg"),
        F.sum(F.col("n_pos_s") * (2 * F.col("cum_below") + F.col("n_tot") + 1)).alias("r2"),
    )
    return t.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("bigint").alias("auc_num"),
        (2 * F.col("n_pos") * F.col("n_neg")).cast("bigint").alias("auc_den"),
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1 ELSE "
            "((r2 - n_pos * (n_pos + 1)) * 10000) DIV (2 * n_pos * n_neg) END"
        ).cast("bigint").alias("auc_bp"),
    )
