"""Reciprocal-rank fusion of per-document quality signals.

Training-data curation rarely trusts ONE signal: classifier score,
readability, and link centrality each see different failure modes, and the
standard way to combine heterogeneous rankings without calibrating their
scales is reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009,
"Reciprocal rank fusion outperforms Condorcet and individual rank learning
methods"): fused(d) = Σ_i 1 / (K + rank_i(d)), K = 60.

Integer port: contribution = RRF_SCALE DIV (K + rank) — all positive
integers, Spark ``DIV`` == DuckDB ``//``, so the fused scores are
bit-identical cross-engine.

Ranks are DENSE (ties share a rank), which is what makes the op scale-safe:
each signal's rank table is built by ranking the DISTINCT-VALUE frame and
broadcast-joining it back, so the one unpartitioned window runs over the
signal's value DOMAIN — keep_bp has ≤10001 values, flesch_mp a fixed
millipoint range, domain_rank one value per domain — never over the corpus.
A per-doc row_number fusion would instead need a global total-order sort of
every document per signal; dense-rank RRF is the documented variant that
avoids it (ties are genuine ties — same value, same evidence).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---- shared constants (dq.oracles generates SQL from these) ----------------

RRF_K = 60               # Cormack et al.'s constant
RRF_SCALE = 1_000_000    # contribution = SCALE DIV (K + rank), micro-units


def dense_rank_by_value(df: DataFrame, val_col: str, out_col: str) -> DataFrame:
    """(val_col, out_col): dense DESC rank per DISTINCT value of val_col.

    row_number over the distinct-value frame == dense_rank over the
    original frame; the window is unpartitioned but sees only the value
    domain (see module docstring), and the result broadcasts back.
    """
    w = Window.orderBy(F.col(val_col).desc())
    return (
        df.select(val_col)
        .distinct()
        .withColumn(out_col, F.row_number().over(w).cast("bigint"))
    )


def rrf_fuse(
    df: DataFrame,
    signal_cols: list[str],
    k: int = RRF_K,
    scale: int = RRF_SCALE,
) -> DataFrame:
    """Appends ``rank_<sig>`` (dense DESC) per signal column and the fused
    ``rrf_micro`` = Σ scale DIV (k + rank_<sig>). Higher signal = better;
    all signals must be non-NULL integers (NULL would rank nowhere and
    three-valued outputs break the gate's hash compare)."""
    out = df
    for sig in signal_cols:
        out = out.join(F.broadcast(dense_rank_by_value(df, sig, f"rank_{sig}")), sig)
    fused = reduce(
        lambda a, b: a + b,
        [F.expr(f"{scale} DIV ({k} + rank_{s})") for s in signal_cols],
    )
    return out.withColumn("rrf_micro", fused.cast("bigint"))
