"""KMV (k-minimum-values) distinct sketches and corpus-overlap estimation.

A KMV sketch of a set is the k smallest values of a uniform hash of its
elements — mergeable (union = k smallest of the concatenated sketches),
O(k) to store, and it answers the two questions a crawl pipeline asks of
corpora too big to intersect exactly:

* distinct count:  D ~= (k-1) * M / h_(k)   (h_(k) = k-th minimum, M = hash
  range); exact when the set has fewer than k members (the sketch IS the set)
* overlap:         J(A,B) ~= |SK(A) n SK(B) n SK(A u B)| / k  (Beyer et al.,
  "On synopses for distinct-value estimation under multiset operations",
  SIGMOD 2007)

Engine portability: the element hash is the first 15 hex chars of the
sha256 fingerprint parsed as an integer (M = 16^15 = 2^60) — same
conv/'0x'-cast pair as dq.bloom, so DuckDB reproduces sketch members,
k-th minima, and the IEEE-double estimates bit-for-bit (division of
identical operands is correctly rounded on both engines).

Scale shape (100 TB notes): the per-corpus sketch is a sort-limit —
Spark plans TakeOrderedAndProject: each task keeps its local k minima,
the driver merges P*k values; no full sort, no wide shuffle. Everything
after the two sketches touches <= 3k rows. Comparing two crawl snapshots
therefore costs two scans + O(k) — vs an exact fingerprint join's
corpus-sized shuffle. k=512 gives ~4-5% relative error on distinct counts
(1/sqrt(k)); raise k for tighter bounds, the cost stays trivial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---- shared constants (dq.oracles generates SQL from these) ----------------

KMV_K = 256
KMV_HEX_CHARS = 15            # 15 hex chars -> [0, 2^60), fits bigint positive
KMV_M = 16 ** KMV_HEX_CHARS   # hash range


def kmv_hash(fp_hex: Column) -> Column:
    """Uniform [0, 2^60) integer from a sha256 hex fingerprint."""
    return F.conv(F.substring(fp_hex, 1, KMV_HEX_CHARS), 16, 10).cast("bigint")


def kmv_sketch(fps: DataFrame, fp_col: str = "fp", k: int = KMV_K) -> DataFrame:
    """(h): the k smallest distinct hash values — TakeOrderedAndProject,
    never a full sort."""
    return (
        fps.select(kmv_hash(F.col(fp_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(n_sketch, kth_min, est_distinct): distinct-count estimate from one
    sketch; exact (= n_sketch) when the underlying set had < k members."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("kth_min")
    ).select(
        "n_sketch",
        "kth_min",
        F.when(
            F.col("n_sketch") < k, F.col("n_sketch").cast("double")
        )
        .otherwise(
            # single precomputed double literal (k-1)*M — the oracle embeds
            # the same repr, so the only runtime float op is one division
            F.lit(float(k - 1) * float(KMV_M)) / F.col("kth_min").cast("double")
        )
        .alias("est_distinct"),
    )


def kmv_overlap(
    fps_a: DataFrame,
    fps_b: DataFrame,
    fp_col: str = "fp",
    k: int = KMV_K,
) -> DataFrame:
    """One-row overlap report for two fingerprint sets.

    Columns: n_sketch_a/b, kth_min_a/b, est_distinct_a/b (per-set KMV
    estimates), inter_in_union_sketch (the Beyer et al. numerator) and
    jaccard_est. The union sketch is the k smallest of the two sketches'
    union — never recomputed from the raw corpora.
    """
    # localCheckpoint the k-row sketches: each is referenced three times
    # (union sketch, intersection, estimate) and TakeOrdered has no
    # exchange for ReuseExchange to dedup — without the cut each corpus
    # scans + fingerprints 3x (the module's cost claim is TWO scans)
    sa = kmv_sketch(fps_a, fp_col, k).localCheckpoint()
    sb = kmv_sketch(fps_b, fp_col, k).localCheckpoint()
    su = sa.unionByName(sb).distinct().orderBy("h").limit(k)
    both = sa.join(sb, "h")                       # <= k rows each side
    est_a = kmv_estimate(sa, k).select(
        F.col("n_sketch").alias("n_sketch_a"),
        F.col("kth_min").alias("kth_min_a"),
        F.col("est_distinct").alias("est_distinct_a"),
    )
    est_b = kmv_estimate(sb, k).select(
        F.col("n_sketch").alias("n_sketch_b"),
        F.col("kth_min").alias("kth_min_b"),
        F.col("est_distinct").alias("est_distinct_b"),
    )
    inter = (
        su.join(both, "h")
        .agg(F.count(F.lit(1)).alias("inter_in_union_sketch"))
    )
    un = su.agg(F.count(F.lit(1)).alias("n_union_sketch"))
    return (
        est_a.crossJoin(est_b)
        .crossJoin(inter)
        .crossJoin(un)
        .select(
            "n_sketch_a",
            "kth_min_a",
            "est_distinct_a",
            "n_sketch_b",
            "kth_min_b",
            "est_distinct_b",
            F.col("inter_in_union_sketch").cast("bigint").alias("inter_in_union_sketch"),
            (
                F.col("inter_in_union_sketch").cast("double")
                / F.col("n_union_sketch").cast("double")
            ).alias("jaccard_est"),
        )
    )
