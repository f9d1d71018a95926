"""Poisson bootstrap — uncertainty for corpus metrics in ONE pass.

A 100 TB corpus cannot be resampled-with-replacement the textbook way (each
bootstrap replica would be another full copy, and sampling n items from n
requires global coordination). The streaming-scale fix is the POISSON
bootstrap (Chamandy et al., "Estimating Uncertainty for Massive Data
Streams", Google 2012; Kleiner et al.'s BLB is the heavier cousin): each
row enters replica r with an independent Poisson(1) count, because
Binomial(n, 1/n) → Poisson(1). All R replicas are computed in the SAME
aggregation pass — per row, R deterministic pseudo-random weights; per
replica, weighted sums — so the whole CI costs one corpus scan and an
R-row result, no resampling, no extra copies.

Determinism/cross-engine: the per-(doc, replica) uniform draw is the shared
two-step LCG (dq.sampling constants) reduced mod SAMPLE_MOD, and the
Poisson(1) inverse CDF is applied through INTEGER thresholds precomputed in
Python (floor(cdf * SAMPLE_MOD)) — identical arithmetic in Spark and
DuckDB, no floats anywhere. Counts are capped at 4 (P(X>=4) ≈ 1.9% folds
into the top bin; E[weight] ≈ 0.996 instead of 1 — a documented bias far
inside bootstrap noise for any corpus-sized n).

The audited statistic here is the heuristic keep rate (the gate the
pipeline actually ships); the machinery generalizes to any weighted-sum
statistic. Scale shape: one Generate of a constant R-element array per row
(posexplode of a literal sequence — safe, the inferred filter
constant-folds), then one map-side-combinable hash-agg to R rows; text is
tokenized once in the metric projection and never enters an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dq.heuristics import keep_expr, with_heuristic_metrics
from dq.sampling import LCG_ADD, LCG_MUL, SAMPLE_MOD

# ---- shared constants (dq.oracles generates SQL from these) ----------------

BOOT_REPLICAS = 32
# intermediate modulus for the first LCG step: keeps (s1 + r) * LCG_MUL
# inside int64 ((2^31 + R) * 2654435761 ≈ 5.7e18 < 2^63) while retaining
# 31 bits of state between the two steps
BOOT_STATE_MOD = 2_147_483_647
# Poisson(1) inverse-CDF thresholds in SAMPLE_MOD units:
# floor(10000 * e^-1 * sum_{j<=k} 1/j!) for k = 0..3; draws >= the last
# threshold take weight 4 (the capped tail).
POISSON1_CUM_BP = [3678, 7357, 9196, 9810]
BOOT_WEIGHT_CAP = 4


def _poisson_weight_sql_case(u: str) -> str:
    """Shared CASE text (valid in Spark SQL and DuckDB) mapping a uniform
    draw ``u`` in [0, SAMPLE_MOD) to a Poisson(1) count via the integer
    thresholds — built from POISSON1_CUM_BP so the engines cannot drift."""
    whens = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(POISSON1_CUM_BP)
    )
    return f"CASE {whens} ELSE {BOOT_WEIGHT_CAP} END"


def replica_draw_cols(doc_id: str = "doc_id", replica: str = "replica") -> str:
    """SQL expression for the (doc, replica) uniform draw — two chained LCG
    steps. Plain ``%`` is used (NOT pmod, which DuckDB lacks): every operand
    is non-negative (doc_id >= 0 by table contract), so truncating and
    flooring modulo agree and the one spelling parses in both engines."""
    s1 = f"({doc_id} * {LCG_MUL} + {LCG_ADD}) % {BOOT_STATE_MOD}"
    return f"(({s1} + {replica}) * {LCG_MUL} + {LCG_ADD}) % {SAMPLE_MOD}"


def bootstrap_keep_rates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    replicas: int = BOOT_REPLICAS,
) -> DataFrame:
    """(replica, w_total, keep_w, keep_rate_bp) — one row per bootstrap
    replica, keep_rate_bp = (10000 * keep_w) DIV w_total (exact integers;
    0 when the replica drew no mass). The spread of keep_rate_bp across
    replicas IS the sampling distribution of the corpus keep rate."""
    m = with_heuristic_metrics(docs.select(F.col(id_col).alias("doc_id"), text_col))
    flags = m.select(
        "doc_id", F.when(keep_expr(), F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("k")
    )
    reps = flags.select(
        "doc_id",
        "k",
        F.posexplode(F.array(*[F.lit(r) for r in range(replicas)])).alias("_p", "replica"),
    ).drop("_p")
    u = replica_draw_cols("doc_id", "replica")
    w = F.expr(_poisson_weight_sql_case(u)).cast("bigint")
    weighted = reps.select(F.col("replica").cast("bigint").alias("replica"), "k", w.alias("w"))
    agg = weighted.groupBy("replica").agg(
        F.sum("w").cast("bigint").alias("w_total"),
        F.sum(F.col("w") * F.col("k")).cast("bigint").alias("keep_w"),
    )
    return agg.select(
        "replica",
        "w_total",
        "keep_w",
        F.when(
            F.col("w_total") > 0, F.expr("(10000 * keep_w) DIV w_total")
        ).otherwise(F.lit(0)).cast("bigint").alias("keep_rate_bp"),
    )


def percentile_ci(rates: list[int], lo_q: float = 0.025, hi_q: float = 0.975) -> tuple[int, int]:
    """Driver-side percentile CI over the R replica rates (R rows — control
    plane by construction): nearest-rank order statistics."""
    s = sorted(rates)
    n = len(s)
    lo = s[min(n - 1, max(0, int(lo_q * n)))]
    hi = s[min(n - 1, max(0, int(hi_q * n)))]
    return lo, hi


# ---- pure-python twin (the pytest oracle) -----------------------------------


def bootstrap_rates_py(
    rows: list[tuple[int, bool]], replicas: int = BOOT_REPLICAS
) -> dict[int, tuple[int, int, int]]:
    """Reference implementation over (doc_id, keep) rows; returns
    {replica: (w_total, keep_w, keep_rate_bp)} — integer-identical to the
    Spark path (pytest-pinned)."""
    out = {r: [0, 0] for r in range(replicas)}
    for doc_id, keep in rows:
        s1 = (doc_id * LCG_MUL + LCG_ADD) % BOOT_STATE_MOD
        for r in range(replicas):
            u = ((s1 + r) * LCG_MUL + LCG_ADD) % SAMPLE_MOD
            w = BOOT_WEIGHT_CAP
            for k, t in enumerate(POISSON1_CUM_BP):
                if u < t:
                    w = k
                    break
            out[r][0] += w
            out[r][1] += w * (1 if keep else 0)
    return {
        r: (wt, kw, (10000 * kw) // wt if wt > 0 else 0) for r, (wt, kw) in out.items()
    }
