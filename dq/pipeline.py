"""End-to-end web-text quality-filter pipeline (the north-rule payload).

Stage order (one logical plan — Catalyst fuses the narrow stages into a
single codegen'd pass over the scan; only dedup adds a shuffle, keyed by a
uniform content hash so it cannot skew):

    scan pages -> extract (native regex chain) -> heuristics (native)
    -> langid (pandas UDF) -> perplexity (pandas UDF) -> scrub (native)
    -> exact-dup survivor (narrow (sha2,url) pass + broadcast join-back)
    -> keep decision -> lineage metrics per partition (dt_foto)

The keep decision and scrubbed text have pure-pandas oracle twins
(dq.heuristics / dq.langid / dq.perplexity / dq.scrub) — the F1>=0.99 /
byte-identical contract is tested in tests/test_pipeline.py.

Scale notes (10^12 docs): one enrich pass covers ALL pending dt_foto
partitions (write.partitionBy + dynamic partition overwrite; the checkpoint
manifest still gives idempotent resume); the dedup exchange carries only
(sha2(text), url) ≈ 100 B/doc — the enriched row never shuffles; model
artifacts are module-level constants imported per executor (KBs — for
MB-scale models switch to SparkContext.broadcast); hot-domain skew never
reaches a shuffle key (the only wide op keys on sha2 hashes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pandas as pd
from pyspark.sql import types as T

from dq import heuristics
from dq.extract import extract_text_col
from dq.io import CheckpointManifest
from dq.langid import detect_lang_batch
from dq.perplexity import perplexity_batch
from dq.scrub import scrub_col

TARGET_LANG = "en"
MAX_PERPLEXITY = 2000.0
PARTITION_COL = "dt_foto"


@dataclass
class PipelineConfig:
    """Corpus calibration knobs (CCNet-style: thresholds are per-corpus).

    ``target_lang=None`` disables the language gate (keep_lang == True)
    while still computing lang_pred/lang_margin for lineage.
    """

    target_lang: str | None = TARGET_LANG
    max_perplexity: float = MAX_PERPLEXITY
    thresholds: dict = field(default_factory=lambda: dict(heuristics.THRESHOLDS))


_NLP_TYPE = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_margin", T.DoubleType()),
        T.StructField("ppl", T.DoubleType()),
    ]
)


@F.pandas_udf(_NLP_TYPE)
def nlp_udf(texts: pd.Series) -> pd.DataFrame:
    """Fused langid + perplexity: one Arrow round-trip for the text column
    instead of two (the two models are independent; fusing halves the
    dominant serialization cost of the UDF tier)."""
    out = detect_lang_batch(texts)
    out["ppl"] = perplexity_batch(texts)
    return out


# Calibration for the driver's ``documents`` word-salad corpus (short docs,
# sparse stopwords, uniform vocab — lang labels carry no char-level signal).
DOCS_CONFIG = PipelineConfig(
    target_lang=None,
    max_perplexity=870.0,
    thresholds={
        **heuristics.THRESHOLDS,
        "min_words": 30,
        "min_stop_ratio": 0.01,
        "min_distinct_stops": 1,
    },
)


def with_partition(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Derive the reference-style yyyyMMdd partition label from crawl time
    (format normalization once at ingest — SURVEY.md §1.4)."""
    return df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyyMMdd"))


def enrich(
    df: DataFrame,
    verify_extraction: bool = True,
    config: PipelineConfig | None = None,
    dedup_broadcast: bool = True,
) -> DataFrame:
    """All per-doc stages; returns input columns + metrics + decisions."""
    cfg = config or PipelineConfig()
    out = with_partition(df)
    if verify_extraction and "html" in df.columns:
        out = out.withColumn("text_extracted", extract_text_col(F.col("html"))).withColumn(
            "extraction_ok", F.col("text_extracted").eqNullSafe(F.col("text"))
        )
    out = heuristics.with_heuristic_metrics(out)
    out = out.withColumn("keep_heuristic", heuristics.keep_expr(cfg.thresholds))
    nlp = nlp_udf(F.col("text"))
    out = (
        out.withColumn("_nlp", nlp)
        .withColumn("lang_pred", F.col("_nlp.lang_pred"))
        .withColumn("lang_margin", F.col("_nlp.lang_margin"))
        .withColumn("ppl", F.col("_nlp.ppl"))
        .drop("_nlp")
    )
    out = out.withColumn(
        "keep_lang",
        F.col("lang_pred") == F.lit(cfg.target_lang) if cfg.target_lang else F.lit(True),
    )
    out = out.withColumn("keep_ppl", F.col("ppl") <= F.lit(cfg.max_perplexity))
    out = out.withColumn("text_scrubbed", scrub_col(F.col("text")))
    out = out.withColumn("pii_found", F.col("text_scrubbed") != F.col("text"))
    # deterministic exact-dup survivor (first url per content hash), computed
    # on a NARROW (sha2(text), url) projection: the shuffle carries ~100 B/doc
    # as SCALING.md §2 claims — the enriched row (text + text_scrubbed +
    # metrics, KBs/doc) never enters an exchange. The flag comes back via a
    # join on (url, fingerprint) — the wide side recomputes sha2(text)
    # in-plan (narrow, no exchange), so a url carrying two different texts
    # only loses its losing copy. Broadcast by default (non-survivors are a
    # minority of a snapshot); dedup_broadcast=False falls back to a shuffle
    # join whose narrow side still carries only (url, hash) — pair it with
    # input storage bucketed by url for an exchange-free wide side.
    from dq.dedup import non_survivor_units

    dup_units = non_survivor_units(df, "text", "url").withColumn("_is_dup", F.lit(True))
    if dedup_broadcast:
        dup_units = F.broadcast(dup_units)
    out = (
        out.withColumn("_fp", F.sha2(F.col("text"), 256))
        .join(dup_units, ["_fp", "url"], "left")
        .withColumn("is_exact_dup", F.coalesce(F.col("_is_dup"), F.lit(False)))
        .drop("_is_dup", "_fp")
    )
    return out.withColumn(
        "keep",
        F.col("keep_heuristic") & F.col("keep_lang") & F.col("keep_ppl") & ~F.col("is_exact_dup"),
    )


def lineage_metrics(enriched: DataFrame) -> DataFrame:
    """Per-partition lineage row (DQ_LINEAGE shape): input/kept/dropped/
    scrubbed/dup counts — one hash-agg pass, map-side partials.
    n_extraction_ok is ALWAYS present (NULL when the extraction check did
    not run): a conditional column would make the accumulated lineage
    parquet directory schema-unstable across runs with/without html."""
    extraction = (
        F.sum(F.col("extraction_ok").cast("long")).cast("bigint")
        if "extraction_ok" in enriched.columns
        else F.lit(None).cast("bigint")
    )
    return enriched.groupBy(PARTITION_COL).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_input"),
        F.sum(F.col("keep").cast("long")).cast("bigint").alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).cast("bigint").alias("n_dropped"),
        F.sum(F.col("pii_found").cast("long")).cast("bigint").alias("n_scrubbed"),
        F.sum(F.col("is_exact_dup").cast("long")).cast("bigint").alias("n_exact_dups"),
        extraction.alias("n_extraction_ok"),
        F.date_format(F.current_date(), "yyyyMMdd").alias("dt_processamento"),
        F.lit(1).cast("bigint").alias("status"),
    )


def _ts_range_pred(parts: list[str], ts_col: str = "warc_ts") -> F.Column:
    """Pushable scan predicate covering the given yyyyMMdd partition labels:
    a range on the REAL timestamp column (parquet min/max row-group skipping
    + partition pruning on date-partitioned storage), unlike a predicate on
    the derived dt_foto string which no source can push."""
    lo = F.to_timestamp(F.lit(min(parts)), "yyyyMMdd")
    hi = F.to_timestamp(F.lit(max(parts)), "yyyyMMdd") + F.make_interval(days=F.lit(1))
    return (F.col(ts_col) >= lo) & (F.col(ts_col) < hi)


def kept_projection(enriched: DataFrame) -> DataFrame:
    """The kept-docs output relation (scrubbed text under the original name)."""
    return enriched.where(F.col("keep")).select(
        "url", "warc_ts", PARTITION_COL, F.col("text_scrubbed").alias("text"), "lang_pred"
    )


def run(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    table_name: str = "pages",
    resume: bool = True,
    config: PipelineConfig | None = None,
    parallelism: int = 1,
    per_partition: bool = False,
) -> DataFrame:
    """Materializing run: kept docs + lineage to side tables, checkpointed
    for idempotent resume (north rule). Returns lineage.

    Default is ONE enrich pass over all pending partitions with
    ``write.partitionBy(dt_foto)`` + dynamic partition overwrite — a backlog
    of P partitions costs one scan, not P. A crash before mark_done re-runs
    the pending set; dynamic overwrite replaces exactly the partitions
    re-processed, so resume is idempotent.

    ``per_partition=True`` keeps the per-partition fan-out (C4 ≙ the
    reference's `nohup … &` shell layer, todos.sh:1-5, but in ONE Spark app:
    with ``parallelism > 1`` the FIFO scheduler interleaves the jobs'
    stages). Each partition job filters the SOURCE by its warc_ts day range
    (pushable), so even this mode scans only the partition it processes.
    Dedup scope is the run's input in single-pass mode, the single partition
    in per-partition mode (cross-run dups are caught downstream).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = CheckpointManifest(os.path.join(out_dir, "manifest.json"))
    parts = [
        r.partition_value
        for r in with_partition(pages).select(F.col(PARTITION_COL).alias("partition_value")).distinct().collect()
    ]
    todo = manifest.pending([(table_name, p) for p in sorted(parts)]) if resume else [
        (table_name, p) for p in sorted(parts)
    ]
    pending = [p for _, p in todo]

    def write_partitioned(enriched: DataFrame) -> None:
        kept = kept_projection(enriched)
        (
            kept.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .parquet(os.path.join(out_dir, "kept"))
        )
        (
            lineage_metrics(enriched)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .parquet(os.path.join(out_dir, "lineage"))
        )

    if pending and not per_partition:
        scoped = pages.where(_ts_range_pred(pending))
        enriched = enrich(scoped, config=config).where(F.col(PARTITION_COL).isin(pending))
        write_partitioned(enriched)
        for part in pending:
            manifest.mark_done(table_name, part)
    elif pending:
        # each fan-out job owns its partition DIRECTORY (not a partitionBy
        # into a shared root: concurrent jobs would collide in the output
        # committer's _temporary staging)
        def do_partition(part: str) -> None:
            scoped = pages.where(_ts_range_pred([part]))
            part_df = enrich(scoped, config=config).where(F.col(PARTITION_COL) == part)
            kept_projection(part_df).drop(PARTITION_COL).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"kept/{PARTITION_COL}={part}")
            )
            lineage_metrics(part_df).drop(PARTITION_COL).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"lineage/{PARTITION_COL}={part}")
            )
            manifest.mark_done(table_name, part)

        if parallelism > 1 and len(pending) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=parallelism) as pool:
                list(pool.map(do_partition, pending))
        else:
            for part in pending:
                do_partition(part)
    # partition-dir type inference would surface dt_foto as int; pin string
    return spark.read.parquet(os.path.join(out_dir, "lineage")).withColumn(
        PARTITION_COL, F.col(PARTITION_COL).cast("string")
    )
