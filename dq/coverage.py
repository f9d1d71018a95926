"""Greedy maximum-coverage source selection (submodular curation).

Pick K sources (domains/feeds) whose union of distinct tokens covers the
most vocabulary — the lazy-greedy max-coverage shape behind
facility-location / coverage-based corpus selection in training-data
curation. Greedy on a monotone submodular objective carries the classic
(1 - 1/e) guarantee (Nemhauser-Wolsey-Fisher 1978); with K fixed and a
deterministic tie-break the whole selection is exact integer arithmetic,
so the DuckDB twin unrolls the rounds as CTEs and reproduces every pick,
gain, and cumulative coverage bit-for-bit.

Scale shape: the corpus reduces ONCE to the distinct (source, token)
bipartite frame — one hash-agg, the only corpus-sized exchange. Each of
the K rounds is a left-anti join of that frame against the covered-token
set plus a map-side-combinable count per source; the argmax is an
orderBy(gain DESC, source).limit(1) — TakeOrderedAndProject over
|sources| rows, never a collect. The covered set grows by one source's
vocabulary per round and is localCheckpoint-cut (iterative-loop lineage
rule). K is small by use-case (you are choosing feeds, not documents);
cost is K anti-joins over the already-reduced pair frame.

A source whose marginal gain is zero drops out of the anti-joined count
entirely — if every remaining source adds nothing, the round emits no row
(the objective is saturated) — identical semantics in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GC_K = 4  # selection budget (oracle SQL unrolls this many rounds)


def greedy_coverage(pairs: DataFrame, k: int = GC_K, checkpoint: bool = True) -> DataFrame:
    """(sel_round, source, gain, covered_total) for the greedy K picks.

    ``pairs`` must be a DISTINCT (source, w) frame. gain = newly covered
    tokens by that round's pick; covered_total = distinct tokens covered
    after the pick. Tie-break: (gain DESC, source ASC).
    """
    if checkpoint:
        # the pair frame is re-joined every round — materialize the
        # reduction once (the pagerank edges lesson)
        pairs = pairs.localCheckpoint()
    covered = pairs.select("w").where(F.lit(False))  # empty, same schema
    rounds: list[DataFrame] = []
    for r in range(1, k + 1):
        marg = (
            pairs.join(covered, "w", "left_anti")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("gain"))
        )
        pick = marg.orderBy(F.col("gain").desc(), F.col("source").asc()).limit(1)
        if checkpoint:
            # pick feeds BOTH the covered update and the output row —
            # pin the 1-row result so it computes once
            pick = pick.localCheckpoint()
        covered = (
            covered.unionByName(
                pairs.join(pick.select("source"), "source", "semi").select("w")
            )
            .distinct()
        )
        if checkpoint:
            covered = covered.localCheckpoint()
        total = covered.agg(F.count(F.lit(1)).alias("covered_total"))
        rounds.append(
            pick.crossJoin(total).select(
                F.lit(r).cast("int").alias("sel_round"),
                "source",
                F.col("gain").cast("bigint").alias("gain"),
                F.col("covered_total").cast("bigint").alias("covered_total"),
            )
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out
