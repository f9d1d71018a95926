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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dq.dedup import tokens_col
from dq.dsir import _bigrams

# ---- shared constants (dq.oracles generates SQL from these) ----------------

LM_SCALE = 1_000_000       # probabilities reported in micro-units
LM_DISCOUNT_MILLI = 750    # absolute discount D = 0.75 in milli-units
LM_MIN_COUNT = 2           # emit bigrams seen at least this many times

# document scoring (kn_doc_scores): CCNet-style held-out split + bands
LM_TRAIN_MOD = 2           # train slice: doc_id % MOD == 0; score the rest
LM_UNK_MICRO = 1           # probability floor for fully-unseen events
LM_BANDS = ("head", "middle", "tail")  # CCNet bucket names, best first


def doc_bigram_occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, w1, w2) one row per bigram occurrence, document-keyed.

    Staged arrays (the higher-order-capture trap) and explode_outer +
    isNotNull (the InferFiltersFromGenerate guard). Tokens contain no
    whitespace by construction, so splitting the gram on the single space
    recovers (w1, w2) exactly.
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
    )
    grams = staged.select("doc_id", _bigrams(F.col("_w")).alias("_g"))
    ex = grams.select("doc_id", F.explode_outer("_g").alias("_gram")).where(
        F.col("_gram").isNotNull()
    )
    parts = F.split(F.col("_gram"), " ", 2)
    return ex.select(
        "doc_id",
        F.element_at(parts, 1).alias("w1"),
        F.element_at(parts, 2).alias("w2"),
    )


def bigram_occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w1, w2) one row per bigram occurrence — the corpus-wide reduce input.
    Catalyst prunes the unused doc_id column out of the scan."""
    return doc_bigram_occurrences(docs, id_col, text_col).select("w1", "w2")


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


def kn_doc_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = LM_MIN_COUNT,
    scale: int = LM_SCALE,
    discount_milli: int = LM_DISCOUNT_MILLI,
    train_mod: int = LM_TRAIN_MOD,
    unk_micro: int = LM_UNK_MICRO,
) -> DataFrame:
    """CCNet-style held-out LM scoring: train the integer-KN bigram tables
    on the ``doc_id % train_mod == 0`` slice, score every OTHER document,
    and band the scored docs into head/middle/tail terciles (CCNet's
    perplexity buckets, Wenzek et al. 2020).

    Per-bigram score in micro-units, all int64 rational arithmetic (the
    dq/dsir.py deviation pattern — real KN sums log-probs; the integer
    arithmetic-mean keeps a deterministic, cross-engine-exact ordering):

    - bigram in the pruned table:  p_kn + lambda(w1) * cont(w2) / scale
      (interpolated KN)
    - bigram pruned/unseen, both marginals known:  the backoff mass
      lambda(w1) * cont(w2) / scale, floored at ``unk_micro``
    - only the continuation known:  cont(w2)
    - fully unseen:  ``unk_micro``

    Per-doc: n_bigrams, sum, and the integer mean; docs with < 2 tokens
    score (0, 0, 0) so the scorer emits a verdict for EVERY held-out doc.
    Tercile cutoffs come from a cumulative histogram over the DISTINCT mean
    values — head = the smallest top set holding >= ceil(n/3) docs — so the
    only unpartitioned window runs over the tiny distinct-score table, not
    the corpus (the dq/dsir.py histogram-threshold-pick shape; no global
    document sort).

    Scale shape (100 TB notes): text is read twice BY DESIGN — pass 1 is
    model estimation (reduces immediately to the bigram-type table, which a
    production run persists as the model artifact), pass 2 streams held-out
    occurrences against term-keyed equi-joins on that artifact. Occurrence
    rows never carry text; the three model joins are (w1,w2)/(w1)/(w2)
    hash joins on already-reduced tables.
    """
    occ = doc_bigram_occurrences(docs, id_col, text_col)
    train = occ.where(F.col("doc_id") % train_mod == 0)
    score = occ.where(F.col("doc_id") % train_mod != 0)

    types = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    left = types.groupBy("w1").agg(
        F.sum("cnt").cast("bigint").alias("c_w1"),
        F.count(F.lit(1)).cast("bigint").alias("right_types_w1"),
    )
    lam = left.select(
        "w1",
        "c_w1",
        F.expr(f"{discount_milli} * right_types_w1 * {scale} DIV (1000 * c_w1)")
        .cast("bigint")
        .alias("lambda_micro"),
    )
    total = types.agg(F.count(F.lit(1)).cast("bigint").alias("_total_types"))
    cont = (
        types.groupBy("w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("left_types_w2"))
        .crossJoin(F.broadcast(total))
        .select(
            "w2",
            F.expr(f"left_types_w2 * {scale} DIV _total_types")
            .cast("bigint")
            .alias("cont_micro"),
        )
    )
    pruned = (
        types.where(F.col("cnt") >= min_count)
        .join(lam.select("w1", "c_w1").hint("shuffle_hash"), "w1")
        .select(
            "w1",
            "w2",
            F.expr(
                f"greatest(1000 * cnt - {discount_milli}, 0) * {scale} "
                f"DIV (1000 * c_w1)"
            ).cast("bigint").alias("p_kn_micro"),
        )
    )

    scored = (
        score.join(pruned.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(lam.select("w1", "lambda_micro").hint("shuffle_hash"), "w1", "left")
        .join(cont.hint("shuffle_hash"), "w2", "left")
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN p_kn_micro IS NOT NULL "
                f"THEN p_kn_micro + ((lambda_micro * cont_micro) DIV {scale}) "
                f"WHEN lambda_micro IS NOT NULL AND cont_micro IS NOT NULL "
                f"THEN greatest((lambda_micro * cont_micro) DIV {scale}, "
                f"{unk_micro}) "
                f"WHEN cont_micro IS NOT NULL THEN cont_micro "
                f"ELSE {unk_micro} END"
            ).cast("bigint").alias("p_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("p_micro").cast("bigint").alias("sum_p_micro"),
    )
    base = docs.where(F.col(id_col) % train_mod != 0).select(
        F.col(id_col).alias("doc_id")
    )
    per_doc = (
        base.join(agg.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("sum_p_micro", F.lit(0))
            .cast("bigint")
            .alias("sum_p_micro"),
        )
        .withColumn(
            "avg_p_micro",
            F.expr("sum_p_micro DIV greatest(n_bigrams, 1)").cast("bigint"),
        )
    )

    # tercile cutoffs from the distinct-mean histogram (tiny by construction)
    n_frame = per_doc.agg(F.count(F.lit(1)).cast("bigint").alias("_n_scored"))
    hist = per_doc.groupBy("avg_p_micro").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    w_cum = Window.orderBy(F.col("avg_p_micro").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("_cum_ge", F.sum("_c").over(w_cum)).crossJoin(
        F.broadcast(n_frame)
    )
    cuts = cum.agg(
        F.max(
            F.when(
                F.expr("_cum_ge >= (_n_scored + 2) DIV 3"), F.col("avg_p_micro")
            )
        ).alias("_head_cut"),
        F.max(
            F.when(
                F.expr("_cum_ge >= (2 * _n_scored + 2) DIV 3"),
                F.col("avg_p_micro"),
            )
        ).alias("_mid_cut"),
    )
    head, mid, tail = LM_BANDS
    return per_doc.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_bigrams",
        "sum_p_micro",
        "avg_p_micro",
        F.expr(
            f"CASE WHEN avg_p_micro >= _head_cut THEN '{head}' "
            f"WHEN avg_p_micro >= _mid_cut THEN '{mid}' "
            f"ELSE '{tail}' END"
        ).alias("lm_band"),
    )
