"""Priority sampling: one-pass weighted sample + subset-sum estimator.

Training-data-pipeline addition beyond the reference's table-level DQ scope
(reference: fixed-fraction row checks; it never samples by weight).
Published semantics followed: priority sampling (Duffield, Lund & Thorup,
JACM 2007) — for each item draw u ~ Uniform(0, 1], set priority q = w / u,
keep the k items with the largest priorities, and let tau be the (k+1)-th
priority. The estimator w_hat = max(w, tau) for sampled items (0 otherwise)
is unbiased for any subset-sum of the weights, with near-optimal variance
(within a factor 1 + O(1/k) of the best possible k-sparse scheme). This is
THE way to keep a fixed-size, quality-weighted document sample (for eval
decks, human audits, dataset cards) in one pass over 100 TB: no global
state, no second pass, and any subset-sum (per language, per source) can be
estimated from the k kept rows alone.

Integer determinism (both engines compute the identical sample):
- u is the shared LCG bucket + 1 (dq.sampling.lcg_bucket), u in
  [1, SAMPLE_MOD] — resume/retry-stable, never rand();
- q = (w * PRIORITY_SCALE) DIV u — int64 fixed-point; ordering ties broken
  by doc_id ASC, so the sample is a pure function of the corpus;
- tau and the estimator stay in the same fixed point: q represents the
  real priority w/u times SCALE/SAMPLE_MOD (u_int = u * SAMPLE_MOD), so
  tau in w-units-times-SCALE is tau * SAMPLE_MOD and
  w_hat_scaled = greatest(w * PRIORITY_SCALE, tau * SAMPLE_MOD), an exact
  integer.

Overflow headroom: q <= w * PRIORITY_SCALE and tau * SAMPLE_MOD <=
max_q * SAMPLE_MOD, so weights are safe to w < 2^63 / (SCALE * SAMPLE_MOD)
~ 9.2e5 at SCALE=1e9 / MOD=1e4. Char-count weights of web documents sit
under that after the doc-length heuristic gate; corpora with longer docs
drop PRIORITY_SCALE to 1e6 (ordering granularity 1e-6, still far below
any real weight ratio) for 1000x more headroom.

Scale shape (100 TB notes): the weight/priority projection is pure codegen
over existing columns (zero exchange); the top-(k+1) is ORDER BY ... LIMIT
— Spark plans TakeOrderedAndProject (per-partition heap, driver merge of
k+1 rows), never a global sort; tau is a 1-row cross join back onto the
k-row sample. Total moving data: k+1 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dq.sampling import SAMPLE_MOD, lcg_bucket

# ---- shared constants (dq.oracles generates SQL from these) ----------------

PRIORITY_K = 40           # sample size
PRIORITY_SCALE = 10**9    # fixed-point scale for q = w*SCALE DIV u


def priority_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    k: int = PRIORITY_K,
) -> DataFrame:
    """The k-row priority sample with the DLT subset-sum estimator.

    Returns (doc_id, w, u, q, tau, w_hat_scaled) — one row per sampled
    document, w = weight_col + 1 (strictly positive), w_hat_scaled =
    max(w, tau*SAMPLE_MOD/SCALE) in PRIORITY_SCALE fixed point (the DLT
    max(w, tau) with tau converted from priority fixed point back to
    w-units). sum(w_hat_scaled) /
    SCALE estimates sum(w) over the WHOLE corpus; filtering the k rows by
    any predicate estimates that subset's weight the same way. tau is 0
    when the corpus has <= k rows (every row sampled, estimator exact).
    """
    w = (F.col(weight_col).cast("bigint") + F.lit(1)).alias("w")
    u = (lcg_bucket(F.col(id_col)) + F.lit(1)).cast("bigint").alias("u")
    # Spark's `/` on bigints is double division — DIV keeps the fixed point
    # exact (and matches DuckDB `//`, CLAUDE.md truncation probe)
    pri = docs.select(F.col(id_col).alias("doc_id"), w, u).select(
        "doc_id", "w", "u",
        F.expr(f"CAST(w * {PRIORITY_SCALE} AS BIGINT) DIV u").alias("q"),
    )
    # top-(k+1) plans as TakeOrderedAndProject: per-partition heap of k+1
    # rows + driver merge — never a global sort of the corpus
    top = pri.orderBy(F.col("q").desc(), F.col("doc_id").asc()).limit(k + 1)
    rn = Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
    ranked = top.select("*", F.row_number().over(rn).alias("_rn"))
    tau = ranked.where(F.col("_rn") == k + 1).select(
        F.col("q").alias("tau")
    )
    sample = ranked.where(F.col("_rn") <= k).drop("_rn")
    # corpus <= k rows: no (k+1)-th priority -> tau = 0, estimator degrades
    # to the exact weights (max(w*S, 0) = w*S)
    tau1 = tau.unionByName(
        docs.sparkSession.range(1).select(F.lit(0).cast("bigint").alias("tau"))
    ).agg(F.max("tau").cast("bigint").alias("tau"))
    out = sample.crossJoin(F.broadcast(tau1))
    return out.select(
        "doc_id", "w", "u", "q", "tau",
        F.greatest(
            F.col("w") * F.lit(PRIORITY_SCALE), F.col("tau") * F.lit(SAMPLE_MOD)
        ).cast("bigint").alias("w_hat_scaled"),
    )


# ---- pure-python twin (the pytest oracle) -----------------------------------


def priority_sample_py(
    rows: list[tuple[int, int]],
    k: int = PRIORITY_K,
) -> list[tuple[int, int, int, int, int, int]]:
    """Reference implementation over (doc_id, weight_col_value) rows;
    returns sorted [(doc_id, w, u, q, tau, w_hat_scaled)] — must match the
    Spark path integer-for-integer (pytest-pinned)."""
    from dq.sampling import LCG_ADD, LCG_MUL

    pri = []
    for did, wv in rows:
        w = wv + 1
        u = (did * LCG_MUL + LCG_ADD) % SAMPLE_MOD + 1
        q = (w * PRIORITY_SCALE) // u
        pri.append((did, w, u, q))
    ordered = sorted(pri, key=lambda r: (-r[3], r[0]))
    tau = ordered[k][3] if len(ordered) > k else 0
    out = []
    for did, w, u, q in ordered[:k]:
        out.append((did, w, u, q, tau, max(w * PRIORITY_SCALE, tau * SAMPLE_MOD)))
    return sorted(out)
