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


DRIFT_TOP_K = 50


def token_drift_topk(
    old: DataFrame, new: DataFrame, text_col: str = "text", k: int = DRIFT_TOP_K
) -> DataFrame:
    """Cross-snapshot token-distribution drift: the k tokens whose relative
    frequency moved most between two crawls — the corpus-level drift
    monitor that catches template churn, spam bursts, and language-mix
    shifts BEFORE they poison a training mix (the distributional sibling of
    the per-url crawl_diff and the GK quantile drift tier).

    The statistic is integer-exact so the DuckDB twin hash-matches: with
    per-token counts c_old/c_new and corpus totals t_old/t_new, the
    cross-multiplied drift |c_old*t_new - c_new*t_old| ranks tokens by
    |rate_old - rate_new| without a single float (the shared denominator
    t_old*t_new is constant). Reported rates are basis points via integer
    division. int64 headroom: c*t overflows only past ~3x10^9 tokens per
    snapshot x corpus — the 100-TB deployment casts the product to
    decimal(38,0) (one-line change, documented here rather than paid on
    every row at test scale).

    Shape at scale: tokenize -> (token) hash-agg per side (uniform keys,
    map-side combine — the same budget as tfidf's tf pass), vocabulary-
    sized full-outer join on token, 1-row totals broadcast back (J4
    driving-join shape), TakeOrdered(k) — no global sort, no unpartitioned
    window; text never enters an exchange.
    """

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        words = F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda w: w != F.lit(""),
        )
        # explode_outer + isNotNull on the OUTPUT (InferFiltersFromGenerate
        # guard — CLAUDE.md rule)
        return (
            df.select(words.alias("_w"))
            .select(F.explode_outer("_w").alias("token"))
            .where(F.col("token").isNotNull())
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    joined = side_counts(old, "n_old").join(
        side_counts(new, "n_new"), "token", "full_outer"
    ).select(
        "token",
        F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
    )
    # joined feeds TWO consumers (the 1-row totals and the scored
    # projection) in ONE physical plan, so Catalyst's ReuseExchange dedups
    # the identical shuffle subtrees: the tokenize + partial-agg map work
    # runs once, only the vocabulary-sized post-shuffle join repeats
    # (ReusedExchange presence is plan-asserted in tests/test_plans.py).
    # Deliberately NOT persist(): a cached fragment would leak one entry
    # per (old, new) pair for the session lifetime and substitute into
    # later matching plans, hiding the exchanges from plan audits.
    totals = joined.agg(
        F.sum("n_old").cast("bigint").alias("t_old"),
        F.sum("n_new").cast("bigint").alias("t_new"),
    )
    scored = joined.crossJoin(F.broadcast(totals)).select(
        "token",
        "n_old",
        "n_new",
        # integer division (DIV), never float `/` + cast: the truncation
        # must be exact-rational on both engines (CLAUDE.md invariant)
        F.expr("CAST((n_old * 10000) DIV t_old AS BIGINT)").alias("old_bp"),
        F.expr("CAST((n_new * 10000) DIV t_new AS BIGINT)").alias("new_bp"),
        F.abs(F.col("n_old") * F.col("t_new") - F.col("n_new") * F.col("t_old"))
        .cast("bigint")
        .alias("drift_score"),
    )
    return scored.orderBy(F.col("drift_score").desc(), F.col("token").asc()).limit(k)


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


# ---- line-level churn attribution (content diff under the url diff) --------

CHURN_BP = 10_000  # fixed-point scale for the churn ratio


def line_churn(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-url LINE-set churn between two crawls of the same frontier:
    (url, n_old_lines, n_new_lines, n_added, n_removed, churn_bp) for
    every url present in BOTH snapshots. The content-attribution sibling
    of :func:`crawl_diff` — where crawl_diff says THAT a page changed,
    this says HOW MUCH of it changed, in distinct-line units (a one-date
    template edit churns 1 line of 40; a rewrite churns them all). The
    set semantics (distinct lines, position-blind) are the same unit the
    line-dedup tier operates on (dq.lines).

    churn_bp = (n_added + n_removed) * CHURN_BP DIV (n_old + n_new) —
    exact integers; identical re-crawls score 0, disjoint rewrites
    CHURN_BP.

    Engine portability: Spark keys the set algebra on xxhash64(line) —
    an 8-B exchange key, the line text never shuffles — while the DuckDB
    twin groups by the line itself; grouping by fingerprint ≡ grouping
    by line (the dq.lines discipline), so the integer outputs match.

    Scale shape: explode to (url, fp, side) ~24-B rows; ONE hash-agg per
    (url, fp) collapses duplicates and computes both presence flags (no
    pre-distinct, no full-outer join), then the url rollup re-uses the
    url-leading key. NULL text contributes the single empty line its
    split produces in both engines (split('') = [''] — probed parity).
    """

    def sides(snap: DataFrame, side: int) -> DataFrame:
        lines = F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
        return snap.select(
            "url", F.explode_outer(lines).alias("_line"), F.lit(side).alias("_side")
        ).select("url", F.xxhash64("_line").alias("_fp"), "_side")

    u = sides(old, 0).unionByName(sides(new, 1))
    per_fp = u.groupBy("url", "_fp").agg(
        F.max(F.col("_side") == 0).alias("_in_old"),
        F.max(F.col("_side") == 1).alias("_in_new"),
    )
    bi = lambda c: c.cast("int")  # noqa: E731 — sum of booleans
    per_url = (
        per_fp.groupBy("url")
        .agg(
            F.sum(bi(F.col("_in_old"))).cast("bigint").alias("n_old_lines"),
            F.sum(bi(F.col("_in_new"))).cast("bigint").alias("n_new_lines"),
            F.sum(bi(F.col("_in_new") & ~F.col("_in_old"))).cast("bigint").alias("n_added"),
            F.sum(bi(F.col("_in_old") & ~F.col("_in_new"))).cast("bigint").alias("n_removed"),
        )
        .where((F.col("n_old_lines") > 0) & (F.col("n_new_lines") > 0))
    )
    return per_url.select(
        "url",
        "n_old_lines",
        "n_new_lines",
        "n_added",
        "n_removed",
        F.expr(
            f"CAST((n_added + n_removed) * {CHURN_BP} AS BIGINT)"
            " DIV (n_old_lines + n_new_lines)"
        ).alias("churn_bp"),
    )


# ---- churn-driven recrawl scheduling ---------------------------------------

# (min churn_bp inclusive, revisit interval in days) — descending churn:
# a page that rewrites itself daily is refetched daily; a static page
# waits a month. First matching band wins.
REVISIT_BANDS = [
    (5000, 1),
    (2000, 3),
    (500, 7),
    (1, 14),
    (0, 30),
]
CRAWL_DAY = "2024-03-01"  # the scheduling anchor (the crawl being planned)


def recrawl_schedule(churn: DataFrame) -> DataFrame:
    """Adaptive revisit scheduling from observed churn (the Cho &
    Garcia-Molina 2003 result that refresh frequency should track change
    frequency): band each url's ``churn_bp`` into a revisit interval and
    stamp the next fetch date from the CRAWL_DAY anchor. The consumer of
    :func:`line_churn` — closing the crawl-ops loop diff → churn → budget
    → schedule.

    Pure whole-stage-codegen projection over the churn frame (zero
    additional exchanges); the banding is a CASE chain from REVISIT_BANDS
    so the DuckDB twin is generated from the same constants. daily_cost_bp
    = BP DIV interval is the url's amortized daily fetch load — summing it
    per band gives the capacity plan crawl_budget_quota allocates against.
    """
    interval = F.lit(None).cast("int")
    for min_bp, days in sorted(REVISIT_BANDS):  # ascending: later wins
        interval = F.when(F.col("churn_bp") >= min_bp, F.lit(days)).otherwise(interval)
    return churn.select(
        "url",
        "churn_bp",
        interval.cast("bigint").alias("interval_days"),
        F.date_format(
            F.date_add(F.lit(CRAWL_DAY).cast("date"), interval), "yyyyMMdd"
        ).alias("next_fetch"),
    ).withColumn(
        "daily_cost_bp",
        F.expr(f"CAST({CHURN_BP} DIV interval_days AS BIGINT)"),
    )
