"""DSIR-style hashed n-gram importance resampling (data selection).

Training-data-pipeline addition beyond the reference's table-level DQ scope
(reference: qualitativo/*.scala profiles columns; it has no data-selection
tier). Published semantics followed: Data Selection via Importance
Resampling (Xie et al. 2023, arXiv:2302.03169) scores every raw document by
the likelihood ratio between a TARGET distribution (the high-quality corpus
you want more of) and the RAW distribution, both estimated as bag-of-hashed-
n-gram models (unigrams + bigrams hashed into B buckets), then keeps the
top-weighted documents. This module reproduces that shape with exact
integer arithmetic so the scores are bit-identical across engines:

- features: unigrams and adjacent-pair bigrams of the lowercased
  whitespace tokens, hashed with the shared 31-ary polynomial rolling hash
  (dq.classifier.token_hash) into ``DSIR_BUCKETS`` buckets;
- per-bucket importance ratio in micro-units, add-one smoothed::

      ratio_micro(b) = ((tgt_b + 1) * (raw_total + B) * SCALE)
                       DIV ((raw_b + 1) * (tgt_total + B))

  i.e. the integer-scaled ``p_target(b) / p_raw(b)``. Real DSIR works in
  log space with float probabilities; the integer ratio keeps the same
  ordering signal while staying cross-engine exact. At 10^12-document
  scale the triple product overflows int64, so the production run flips to
  :func:`bucket_ratio_table_log` / :func:`dsir_weights_log` — the same
  smoothed ratio in log-double space, rank-identical (pytest-pinned at the
  gate, property-tested across the overflow boundary); the integer twin
  remains the cross-engine oracle;
- per-document importance = the mean bucket ratio over the document's gram
  occurrences, ``imp_micro = sum(cnt_b * ratio_micro(b)) DIV n_grams``
  (docs with zero grams get the neutral ratio ``SCALE``, i.e. 1.0);
- selection: top ``k`` documents by (imp_micro DESC, doc_id ASC). DSIR
  proper adds Gumbel noise for sampling-without-replacement diversity;
  the deterministic rank is the verifiable twin (a production run would
  add the noise column before the same threshold machinery).

Scale shape (100 TB notes): the gram explode never shuffles text — the
only exchanges are (doc_id, bucket, cnt) hash-aggs (≤24 B rows, bounded by
distinct buckets per doc ≤ B) and the B-row ratio table, which broadcasts.
Raw and target bucket counts come from ONE pass over the reduced
(doc, bucket) frame via conditional aggregation — the corpus text is read
once. Selection avoids a global sort of the document set: the threshold
comes from a histogram-cumulative pick over DISTINCT imp values (the
qualitativo_percentiles shape) and only the tie group at the threshold
enters the single bounded rank window (documented, same pattern as
dq/sampling.py token packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dq.classifier import POLY_MOD, POLY_MUL  # noqa: F401 (oracle imports)
from dq.classifier import token_hash
from dq.dedup import tokens_col

# ---- shared constants (dq.oracles generates SQL from these) ----------------

DSIR_BUCKETS = 4096        # hashed feature buckets (paper uses 10^4)
DSIR_SCALE = 1_000_000     # importance ratio reported in micro-units
DSIR_TARGET_LANG = "en"    # gate-query target: the English slice
DSIR_SELECT_K = 100        # gate-query selection budget


def _bigrams(words: Column) -> Column:
    """Adjacent-pair bigram strings; empty for docs under two tokens.

    zip_with over the shifted slice, NOT element_at inside a
    sequence-transform lambda — the latter re-evaluates the captured array
    expression per element (the dq/dedup.py:138-155 trap). zip_with pads
    the shorter side with NULL and concat_ws skips NULLs, which would leak
    the last token as a spurious unigram — the slice to size-1 drops it.
    """
    zipped = F.zip_with(
        words,
        F.slice(words, 2, F.size(words)),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(
        F.size(words) >= 2, F.slice(zipped, 1, F.size(words) - 1)
    ).otherwise(F.array().cast("array<string>"))


def gram_bucket_rows(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, is_target, bucket, cnt): per-doc hashed-gram bucket counts.

    ``target_pred`` is evaluated against the INPUT row (e.g. lang = 'en')
    and carried through, so raw and target bucket totals both derive from
    this one frame. The words/grams arrays are materialized as real columns
    in staging selects (the higher-order-function capture trap, CLAUDE.md),
    and the explode is explode_outer + isNotNull on the OUTPUT column so
    InferFiltersFromGenerate cannot inline the gram tree into a filter.
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
    )
    grams = staged.select(
        "doc_id", "is_target", F.concat(F.col("_w"), _bigrams(F.col("_w"))).alias("_g")
    )
    ex = grams.select(
        "doc_id", "is_target", F.explode_outer("_g").alias("_gram")
    ).where(F.col("_gram").isNotNull())
    return (
        ex.select(
            "doc_id",
            "is_target",
            (token_hash(F.col("_gram")) % n_buckets).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.max("is_target").alias("is_target"), F.count(F.lit(1)).alias("cnt"))
    )


def bucket_ratio_table(
    occ: DataFrame, n_buckets: int = DSIR_BUCKETS, scale: int = DSIR_SCALE
) -> DataFrame:
    """(bucket, ratio_micro) importance-ratio table from the occ frame.

    Add-one smoothing over ``n_buckets``; the 1-row gram totals broadcast
    back (J4 pattern). All arithmetic is exact int64 — see the module
    docstring for the production-scale overflow note.
    """
    per_bucket = occ.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("_raw"),
        F.coalesce(
            F.sum(F.when(F.col("is_target"), F.col("cnt"))), F.lit(0)
        ).cast("long").alias("_tgt"),
    )
    totals = per_bucket.agg(
        F.sum("_raw").cast("long").alias("_raw_total"),
        F.sum("_tgt").cast("long").alias("_tgt_total"),
    )
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(
            f"((_tgt + 1) * (_raw_total + {n_buckets}) * {scale}) "
            f"DIV ((_raw + 1) * (_tgt_total + {n_buckets}))"
        ).alias("ratio_micro"),
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> DataFrame:
    """(doc_id, n_grams, imp_micro) per document — mean bucket importance.

    Docs with no grams (NULL/empty text) report n_grams=0 and the neutral
    ratio ``scale`` so the output never carries NULLs. The reduced occ
    frame is persisted: it feeds both the ratio table and the per-doc sum,
    and without the persist the gram explode would run once per branch.
    """
    occ = gram_bucket_rows(docs, target_pred, id_col, text_col, n_buckets).persist()
    ratio = bucket_ratio_table(occ, n_buckets, scale)
    scored = (
        occ.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("ratio_micro")).cast("long").alias("_wsum"),
        )
        .select("doc_id", "n_grams", F.expr("_wsum DIV n_grams").alias("imp_micro"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("imp_micro", F.lit(scale)).cast("long").alias("imp_micro"),
        )
    )


def bucket_ratio_table_log(
    occ: DataFrame, n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """(bucket, log_ratio: double) — the PRODUCTION-scale twin of
    :func:`bucket_ratio_table` (the prose promise at the top of this module,
    VERDICT r4 next-#5, now in code).

    The integer table computes ``(tgt+1)*(raw_total+B)*SCALE`` in int64:
    with 10^12 documents the gram total alone approaches 10^14-10^15 and
    the triple product overflows 2^63 (the boundary is property-tested in
    tests/test_dsir.py). Here the same add-one-smoothed ratio is computed
    in LOG space — ``ln(tgt+1) + ln(raw_total+B) - ln(raw+1) -
    ln(tgt_total+B)`` — four doubles whose magnitudes are ~ln(counts) <= 50,
    overflow-free at any corpus size. exp(log_ratio) equals the exact
    rational ratio to double precision, so per-doc means keep the integer
    twin's ordering (rank-identity on the gate corpus is pytest-pinned;
    the integer table remains the cross-engine oracle).
    """
    per_bucket = occ.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("_raw"),
        F.coalesce(
            F.sum(F.when(F.col("is_target"), F.col("cnt"))), F.lit(0)
        ).cast("long").alias("_tgt"),
    )
    totals = per_bucket.agg(
        F.sum("_raw").cast("long").alias("_raw_total"),
        F.sum("_tgt").cast("long").alias("_tgt_total"),
    )
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(F.col("_tgt") + 1.0)
            + F.log(F.col("_raw_total") + float(n_buckets))
            - F.log(F.col("_raw") + 1.0)
            - F.log(F.col("_tgt_total") + float(n_buckets))
        ).alias("log_ratio"),
    )


def dsir_weights_log(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, n_grams, imp_log: double) — production log-double scoring.

    Per-document importance is ``ln(mean bucket ratio)`` = ``ln(sum(cnt_b *
    exp(log_ratio_b)) / n_grams)``: ln is monotone, so the ordering is the
    integer twin's ordering (modulo the twin's micro-unit floor — ties the
    floor creates can split here, never reorder; the selection tie-break by
    doc_id is shared). Gram-less docs score the neutral 0.0 (= ln 1).
    Exchanges are identical to :func:`dsir_weights`: (doc, bucket, cnt)
    hash-aggs + a broadcast B-row ratio table — text read once. The double
    sum is a per-doc agg over <= B bucket terms of the same sign (ratios
    are positive), so cross-partition summation-order noise stays at ulp
    scale, far below any rank gap the selection acts on.
    """
    occ = gram_bucket_rows(docs, target_pred, id_col, text_col, n_buckets).persist()
    ratio = bucket_ratio_table_log(occ, n_buckets)
    scored = (
        occ.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.col("cnt") * F.exp(F.col("log_ratio"))).alias("_rsum"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.log(F.col("_rsum") / F.col("n_grams")).alias("imp_log"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("imp_log", F.lit(0.0)).alias("imp_log"),
        )
    )


def dsir_select(
    weights: DataFrame, k: int = DSIR_SELECT_K, scale: int = DSIR_SCALE
) -> DataFrame:
    """(doc_id, n_grams, imp_micro, selected): top-k by (imp DESC, doc_id).

    No global sort of the document set: the threshold imp value is a
    histogram-cumulative pick over DISTINCT imp values, and only the tie
    group AT the threshold enters the one bounded rank window (partitioned
    by the constant imp value — the same documented-single-window pattern
    as dq/sampling.py). Equivalent by construction to
    ``row_number() OVER (ORDER BY imp_micro DESC, doc_id) <= k`` (the
    DuckDB twin), which WOULD be a full sort.
    """
    weights = weights.persist()  # feeds histogram, tie group, and final
    hist = weights.groupBy("imp_micro").agg(F.count(F.lit(1)).alias("_cnt"))
    cum = hist.withColumn(
        "_cum",
        F.sum("_cnt").over(
            Window.orderBy(F.col("imp_micro").desc()).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    thr = cum.agg(
        F.max(F.when(F.col("_cum") >= k, F.col("imp_micro"))).alias("_thr")
    )
    ctrl = (
        cum.crossJoin(F.broadcast(thr))
        .agg(
            F.max("_thr").alias("_thr"),
            F.coalesce(
                F.sum(F.when(F.col("imp_micro") > F.col("_thr"), F.col("_cnt"))),
                F.lit(0),
            ).cast("long").alias("_n_above"),
        )
    )
    with_ctrl = weights.crossJoin(F.broadcast(ctrl))
    tie_rank = (
        with_ctrl.where(F.col("imp_micro") == F.col("_thr"))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("imp_micro").orderBy("doc_id")),
        )
        .select("doc_id", "_rn")
    )
    return (
        with_ctrl.join(tie_rank, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            "imp_micro",
            (
                F.col("_thr").isNull()  # fewer than k docs: select all
                | (F.col("imp_micro") > F.col("_thr"))
                | (
                    F.col("_rn").isNotNull()
                    & (F.col("_rn") <= k - F.col("_n_above"))
                )
            ).alias("selected"),
        )
    )
