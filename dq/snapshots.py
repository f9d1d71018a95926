"""Snapshot-scoped dedup accounting + distribution-drift bands.

Training-data-pipeline additions beyond the reference's single-table DQ
scope (reference: ColetaDuplicidade.scala counts dups within ONE table
snapshot; it never compares crawls). Two published practices reproduced:

- FineWeb (Penedo et al. 2024, arXiv:2406.17557) found that deduplicating
  each CommonCrawl dump INDIVIDUALLY beats global cross-dump dedup for
  model quality. Before choosing a scope you need the accounting this
  module provides: per snapshot, how many docs are within-snapshot dups vs
  re-crawls of content first seen in an EARLIER snapshot — the delta
  between scoped and global dedup policies, measured.
- CCNet/volumetry-style drift monitoring: band the per-doc length
  distribution per crawl half and report count deltas + integer ratio,
  the "did this dump's distribution move" gate a pipeline runs before
  spending compute on a new dump.

Scale shape (100 TB notes): the text never shuffles — every exchange
carries (snap, fingerprint) or band keys. The dedup accounting is ONE
fingerprint-keyed hash-agg (map-side combinable) producing a constant-width
per-snapshot count vector per distinct content, then a posexplode of that
constant-size vector (safe: InferFiltersFromGenerate's added filter
constant-folds on a never-null array, the dq/dedup.py lesson applies to
expensive arrays only) into the tiny final per-snapshot agg. No join of two
corpus-sized frames, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dq.dedup import fingerprint_col

# ---- shared constants (dq.oracles generates SQL from these) ----------------

N_SNAPSHOTS = 3
SNAP_WITHIN_MOD = 7        # every 7th doc gains a same-snapshot duplicate
SNAP_RECRAWL_MOD = 5       # every 5th doc is re-crawled into the next snapshot
SNAP_REPLICA_OFFSET = 10_000_000   # replica doc_id displacement (disjoint ids)

DRIFT_BAND_CHARS = 256     # doc-length band width
DRIFT_BAND_MAX = 8         # bands above this collapse into the top band
DRIFT_SCALE = 1_000_000    # ratio reported in micro-units


def planted_snapshot_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(snap, doc_id, text) corpus over ``N_SNAPSHOTS`` planted crawls.

    Base assignment snap = doc_id % N; every SNAP_WITHIN_MOD-th doc gains a
    same-snapshot duplicate, every SNAP_RECRAWL_MOD-th doc is re-crawled
    (same text, fresh id) into the NEXT snapshot (capped at the last one, so
    "prior" stays well-defined). Replica ids are displaced by
    SNAP_REPLICA_OFFSET multiples so ids never collide.
    """
    did = F.col(id_col)
    base = docs.select(
        (did % N_SNAPSHOTS).cast("bigint").alias("snap"),
        did.alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    within = docs.where(did % SNAP_WITHIN_MOD == 0).select(
        (did % N_SNAPSHOTS).cast("bigint").alias("snap"),
        (did + SNAP_REPLICA_OFFSET).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    recrawl = docs.where(did % SNAP_RECRAWL_MOD == 0).select(
        F.least(did % N_SNAPSHOTS + 1, F.lit(N_SNAPSHOTS - 1))
        .cast("bigint")
        .alias("snap"),
        (did + 2 * SNAP_REPLICA_OFFSET).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return base.unionByName(within).unionByName(recrawl)


def snapshot_dedup_rates(planted: DataFrame) -> DataFrame:
    """Per-snapshot dedup-scope accounting over (snap, doc_id, text).

    Output one row per snapshot:

    - ``n_docs``          docs crawled in the snapshot
    - ``scoped_survivors``  distinct contents within the snapshot (what a
      FineWeb-style per-dump dedup keeps)
    - ``within_dup_docs``   docs a per-snapshot dedup drops
    - ``prior_dup_shas``    distinct contents ALSO present in an earlier
      snapshot (what a global cross-dump dedup would additionally drop)
    - ``new_shas``          contents first seen in this snapshot

    Plan: fingerprint first (text never shuffles), ONE (fp)-keyed hash-agg
    building the constant-width per-snapshot count vector, posexplode of
    that N_SNAPSHOTS-size vector, tiny final agg keyed by snap.
    """
    units = planted.select("snap", fingerprint_col(F.col("text")).alias("fp"))
    per_fp = units.groupBy("fp").agg(
        *[
            F.sum(F.when(F.col("snap") == s, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_c{s}")
            for s in range(N_SNAPSHOTS)
        ]
    )
    # constant-size vector of (cnt, had_prior) per snapshot; posexplode of a
    # constant-size never-null array is the safe explode form (CLAUDE.md)
    cells = F.array(
        *[
            F.struct(
                F.col(f"_c{s}").alias("cnt"),
                (
                    sum(
                        (F.col(f"_c{t}") > 0).cast("int") for t in range(s)
                    ) > 0
                    if s > 0
                    else F.lit(False)
                ).alias("had_prior"),
            )
            for s in range(N_SNAPSHOTS)
        ]
    )
    exploded = per_fp.select(F.posexplode(cells).alias("snap", "cell")).where(
        F.col("cell.cnt") > 0
    )
    return (
        exploded.groupBy(F.col("snap").cast("bigint").alias("snap"))
        .agg(
            F.sum("cell.cnt").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("scoped_survivors"),
            F.sum(F.col("cell.had_prior").cast("int"))
            .cast("bigint")
            .alias("prior_dup_shas"),
        )
        .select(
            "snap",
            "n_docs",
            "scoped_survivors",
            (F.col("n_docs") - F.col("scoped_survivors"))
            .cast("bigint")
            .alias("within_dup_docs"),
            "prior_dup_shas",
            (F.col("scoped_survivors") - F.col("prior_dup_shas"))
            .cast("bigint")
            .alias("new_shas"),
        )
    )


def snapshot_drift_bands(
    docs: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """Doc-length-band drift between the two planted crawl halves.

    Halves: A = even doc_id, B = odd. Band = floor(n_chars / width) capped
    at DRIFT_BAND_MAX. Output per band: counts on each side, delta, and the
    add-one-smoothed integer ratio ``(n_b + 1) * SCALE DIV (n_a + 1)`` in
    micro-units — the PSI-flavoured drift gate without the float log. ONE
    map-side-combinable hash-agg; both halves counted in the same scan.
    """
    band = F.least(
        F.floor(F.coalesce(F.col(len_col), F.lit(0)) / DRIFT_BAND_CHARS),
        F.lit(DRIFT_BAND_MAX),
    ).cast("bigint")
    is_b = (F.col(id_col) % 2 == 1).cast("int")
    return (
        docs.groupBy(band.alias("band"))
        .agg(
            F.sum(1 - is_b).cast("bigint").alias("n_a"),
            F.sum(is_b).cast("bigint").alias("n_b"),
        )
        .select(
            "band",
            "n_a",
            "n_b",
            (F.col("n_b") - F.col("n_a")).cast("bigint").alias("delta"),
            F.expr(f"((n_b + 1) * {DRIFT_SCALE}) DIV (n_a + 1)")
            .cast("bigint")
            .alias("ratio_micro"),
        )
    )
