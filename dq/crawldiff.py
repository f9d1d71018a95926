"""Crawl snapshot diff: added/removed/changed/unchanged urls across crawls.

Training-data-pipeline addition (same family as the incremental dedup ledger,
dq/dedup.py incremental_non_survivor_keys — this is the *refresh analytics*
side): given two snapshots of the same crawl frontier, classify every url as

    added      url only in the new crawl
    removed    url only in the old crawl
    changed    url in both crawls, content fingerprint differs
    unchanged  url in both crawls, fingerprint identical

This is the shape behind re-crawl schedulers (CommonCrawl refresh cadence,
RefinedWeb's crawl-over-crawl growth accounting) and feeds the dedup ledger:
'unchanged' re-crawls are exactly the rows the ledger drops.

Reference parity: the reference's volumetry layer reconciles row counts
between a table and its history twin (SURVEY.md §2.11 C2 merge, §2.3 J2);
crawl_diff is the same reconcile-two-snapshots semantics lifted from
partition counts to per-key content state.

Scale shape (100 TB notes):
- Fingerprints are computed BEFORE the join and only (url, fp) crosses the
  exchange (~100 B/row) — text/html never shuffles (plan-asserted in
  tests/test_plans.py). At 10^10 urls/crawl this is two narrow exchanges,
  the same budget as the exact-dedup pass.
- The join key (url) is unique per snapshot, so the full-outer join is
  uniform — no skew, no salting needed; AQE picks sort-merge.
- diff_counts aggregates the 4-row status histogram with map-side partials;
  the wide path after the join carries (status) only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# planted two-crawl construction constants for the driver-gate query
# (dq.oracles generates the DuckDB twin from these — never hand-duplicate)
OLD_DROP_MOD, OLD_DROP_REM = 11, 3   # omitted from the OLD crawl -> 'added'
NEW_DROP_MOD, NEW_DROP_REM = 13, 5   # omitted from the NEW crawl -> 'removed'
CHANGED_MOD, CHANGED_REM = 7, 2      # NEW text gains CHANGED_SUFFIX -> 'changed'
CHANGED_SUFFIX = " [revised edition]"

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def content_fingerprint(text: Column) -> Column:
    """Null-safe sha256 content fingerprint — THE SAME helper the dedup
    tier uses (dq.dedup.fingerprint_col, zero-byte NULL sentinel), so a
    'unchanged' verdict here and a ledger duplicate there agree on what
    NULL text means: NULL == NULL (unchanged), NULL != '' (changed)."""
    from dq.dedup import fingerprint_col

    return fingerprint_col(text)


def snapshot_fingerprints(
    snap: DataFrame, key: str = "url", text_col: str = "text"
) -> DataFrame:
    """Narrow (key, fp) projection of a crawl snapshot — the ONLY columns
    that may cross the diff exchange."""
    return snap.select(
        F.col(key).alias(key),
        content_fingerprint(F.col(text_col)).alias("fp"),
    )


def crawl_diff(
    old: DataFrame, new: DataFrame, key: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-url diff of two crawl snapshots: (url, old_fp, new_fp, status).

    Full outer join of the two narrow fingerprint projections on the url;
    status derives from fp presence/equality. Each snapshot must be unique
    per key (canonicalize + dedup upstream — dq.urlstats.url_canonicalize).
    """
    o = snapshot_fingerprints(old, key, text_col).withColumnRenamed("fp", "old_fp")
    n = snapshot_fingerprints(new, key, text_col).withColumnRenamed("fp", "new_fp")
    joined = o.join(n, on=key, how="full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit(STATUS_ADDED))
        .when(F.col("new_fp").isNull(), F.lit(STATUS_REMOVED))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit(STATUS_UNCHANGED))
        .otherwise(F.lit(STATUS_CHANGED))
    )
    return joined.select(key, "old_fp", "new_fp", status.alias("status"))


def diff_counts(diff: DataFrame) -> DataFrame:
    """4-row status histogram of a crawl diff (dataset-card refresh figure)."""
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls")
    )


def planted_snapshots(docs: DataFrame, url_col: Column) -> tuple[DataFrame, DataFrame]:
    """Deterministic (old, new) crawl pair constructed from ``documents``:
    OLD drops doc_id % OLD_DROP_MOD == OLD_DROP_REM (-> added in the diff),
    NEW drops doc_id % NEW_DROP_MOD == NEW_DROP_REM (-> removed) and appends
    CHANGED_SUFFIX to every CHANGED_MOD-th doc's text (-> changed; NULL text
    stays NULL on both sides — NULL || suffix is NULL — so those rows diff
    as unchanged under the shared null-safe fingerprint)."""
    did = F.col("doc_id")
    base = docs.select(did.alias("doc_id"), url_col.alias("url"), "text")
    old = base.where(did % OLD_DROP_MOD != OLD_DROP_REM).select("url", "text")
    new = (
        base.where(did % NEW_DROP_MOD != NEW_DROP_REM)
        .select(
            "url",
            F.when(
                did % CHANGED_MOD == CHANGED_REM,
                F.concat(F.col("text"), F.lit(CHANGED_SUFFIX)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return old, new
