"""Domain mixture reweighting: integer multiplicative-weights (Hedge) tilt.

Training-data-pipeline addition beyond the reference's table-level DQ scope
(reference: per-table volumetry; it never tunes sampling weights).
Published semantics followed: DoReMi (Xie et al., NeurIPS 2023) tunes the
domain mixture of a training corpus with multiplicative-weights updates —
each round every domain's weight is multiplied by exp(eta * excess) where
excess is the domain's per-example excess signal, then renormalized to a
distribution. The Pile / ROOTS-style mixtures operate at the same
granularity: dozens of named domains (sources), not hosts. This module
reproduces the update in exact integer arithmetic so the learned mixture is
bit-identical in DuckDB:

- the per-domain signal is the heuristic keep rate in basis points
  (dq.heuristics keep_expr — the same constants every oracled gate query
  uses), the in-engine proxy for "how much of this domain survives the
  quality gate";
- excess_bp = max(0, domain_keep_bp - corpus_keep_bp) — only domains beating
  the corpus mean get tilted up (the linearized, clamped form of
  exp(eta*excess): factor = MIX_BP + excess_bp, i.e. eta = 1 per basis
  point, first-order exp);
- MIX_ROUNDS rounds from the uniform mixture:
      raw_d  = w_d * (MIX_BP + excess_bp_d)
      w'_d   = (raw_d * MIX_BP) DIV sum(raw)        (floor renormalization)
  Floor division makes sum(w') <= MIX_BP by at most n_domains-1 — the
  deterministic remainder both engines agree on (documented, not hidden).

Overflow/precision: with weights and factors in basis points, raw_d <=
1e4 * 2e4 = 2e8 and raw_d * MIX_BP <= 2e12 — int64-safe to ~1e6 domains.
Mixture tuning runs at dozens-of-domains granularity (The Pile: 22), where
bp precision loses nothing; a host-level variant (1e6+ keys) would move to
a 1e9 fixed point with the same two-step division, documented trade.

Scale shape (100 TB notes): ONE corpus scan computes (domain, n, n_keep) as
a map-side-combinable hash agg; everything after operates on the
n_domains-row table (driver-scale by the problem's own definition — the
mixture IS a dozens-row object). The corpus-mean keep rate is a 1-row
broadcast; rounds iterate on the tiny frame with no corpus re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dq.heuristics import keep_expr, with_heuristic_metrics

# ---- shared constants (dq.oracles generates SQL from these) ----------------

MIX_BP = 10_000     # weight/rate fixed point (basis points)
MIX_ROUNDS = 3      # multiplicative-weights rounds


def domain_keep_rates(
    docs: DataFrame, domain_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(domain, n_docs, n_keep, keep_bp) — one corpus scan, hash agg."""
    m = with_heuristic_metrics(
        docs.select(F.col(domain_col).alias("domain"), text_col)
    )
    flagged = m.select(
        "domain", F.when(keep_expr(), F.lit(1)).otherwise(F.lit(0)).alias("k")
    )
    return flagged.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("k").cast("bigint").alias("n_keep"),
    ).select(
        "domain", "n_docs", "n_keep",
        F.expr(f"CAST(n_keep * {MIX_BP} AS BIGINT) DIV n_docs").alias("keep_bp"),
    )


def mixture_weights(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    rounds: int = MIX_ROUNDS,
) -> DataFrame:
    """(domain, keep_bp, excess_bp, weight_bp) after ``rounds`` Hedge
    updates from the uniform mixture — the tuned sampling weights."""
    rates = domain_keep_rates(docs, domain_col, text_col).localCheckpoint(
        eager=True
    )
    # corpus-mean keep rate from the SAME aggregated table (sums are exact)
    mean = rates.agg(
        F.expr(f"CAST(sum(n_keep) * {MIX_BP} AS BIGINT) DIV sum(n_docs)")
        .alias("corpus_bp")
    )
    base = rates.crossJoin(F.broadcast(mean)).select(
        "domain", "keep_bp",
        F.greatest(
            F.col("keep_bp") - F.col("corpus_bp"), F.lit(0)
        ).cast("bigint").alias("excess_bp"),
    )
    n_dom = base.count()  # mixture-scale table: dozens of rows by contract
    w = base.select(
        "domain", "keep_bp", "excess_bp",
        F.lit(MIX_BP // max(n_dom, 1)).cast("bigint").alias("weight_bp"),
    )
    for _ in range(rounds):
        raw = w.select(
            "domain", "keep_bp", "excess_bp",
            (F.col("weight_bp") * (F.lit(MIX_BP) + F.col("excess_bp")))
            .cast("bigint").alias("raw"),
        )
        tot = raw.agg(F.sum("raw").cast("bigint").alias("tot"))
        w = raw.crossJoin(F.broadcast(tot)).select(
            "domain", "keep_bp", "excess_bp",
            F.expr(f"CAST(raw * {MIX_BP} AS BIGINT) DIV tot").alias("weight_bp"),
        ).localCheckpoint(eager=True)  # tiny frame; cuts per-round lineage
    return w


# ---- pure-python twin (the pytest oracle) -----------------------------------


def mixture_weights_py(
    keep: dict[str, tuple[int, int]], rounds: int = MIX_ROUNDS
) -> dict[str, int]:
    """Reference implementation over {domain: (n_docs, n_keep)}; returns
    {domain: weight_bp} — must match the Spark path integer-for-integer."""
    keep_bp = {d: n_keep * MIX_BP // n for d, (n, n_keep) in keep.items()}
    tot_docs = sum(n for n, _ in keep.values())
    tot_keep = sum(nk for _, nk in keep.values())
    corpus_bp = tot_keep * MIX_BP // tot_docs
    excess = {d: max(0, bp - corpus_bp) for d, bp in keep_bp.items()}
    w = {d: MIX_BP // max(len(keep), 1) for d in keep}
    for _ in range(rounds):
        raw = {d: w[d] * (MIX_BP + excess[d]) for d in w}
        tot = sum(raw.values())
        w = {d: raw[d] * MIX_BP // tot for d in w}
    return w
