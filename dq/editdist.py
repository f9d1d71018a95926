"""Edit-distance verification of near-dup candidate pairs.

Training-data-pipeline addition beyond the reference's scope (reference
dup checks are exact equality: duplicidade/ColetaDuplicidade.scala count
vs count-distinct — it never measures HOW different two near-copies are).
This is the missing verify tier between shingle Jaccard (set semantics —
blind to ordering and to small in-place edits that shift every shingle)
and exact fingerprint equality: character-level Levenshtein distance over
candidate pairs, the standard last-stage check before merging a near-dup
family (e.g. template pages differing by one injected date).

Cross-engine determinism (the trap this module exists to contain):
- Spark ``levenshtein`` counts CODEPOINTS, DuckDB counts UTF-8 BYTES —
  'café' vs 'cafe' is 1 in Spark, 2 in DuckDB (probed, round 5). Folding
  every non-ASCII codepoint to '?' first (ASCII_FOLD_RE — one regex both
  engines interpret identically per codepoint) makes chars == bytes and
  the DP bit-identical. The fold is applied BEFORE the prefix cut so the
  substring is pure ASCII in both engines (DuckDB substring counts
  grapheme clusters, Spark counts codepoints — equal only on ASCII).
- The distance runs on the first EDIT_PREFIX folded chars. This bounds
  the O(len_a * len_b) DP per pair AND is the published practice for
  near-dup verification (prefix agreement implies family membership;
  appended-suffix edits past the prefix are the LSH tier's job).
- All outputs are integers / booleans: sim_bp is an exact integer DIV;
  the verdict compares integers. Nothing three-valued: NULL text folds
  to NULL, the length-gap prune drops the pair in BOTH engines (NULL
  predicate is false in a WHERE in both).

Scale shape (100 TB notes): this op consumes CANDIDATE pairs (LSH/winnow
output, already capped by the hot-bucket guards), never the corpus
cross-product. Per pair the DP is O(EDIT_PREFIX^2) bounded work; the two
joins hash on doc_id (narrow: id + EDIT_PREFIX chars of folded text per
row). At production scale pass a threshold to Spark's 3-arg
``levenshtein(l, r, k)`` — banded O(len*k) DP that early-outs to -1 above
k (the oracle uses the 2-arg form because DuckDB has no banded variant;
the 2-arg/3-arg results agree on every pair the verdict keeps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---- shared constants (dq.oracles generates SQL from these) ----------------

# any codepoint outside printable ASCII + \t\n\r folds to '?' — identical
# per-codepoint semantics in Java regex, Python re, and RE2 (probed)
ASCII_FOLD_RE = r"[^ -~\t\n\r]"
EDIT_PREFIX = 300     # DP bound: distance over the first N folded chars
EDIT_MAX = 20         # near-dup verdict threshold (and length-gap prune)
EDIT_SIM_BP = 10_000  # fixed-point scale for the similarity ratio


def folded_prefix_col(text) -> F.Column:
    """ASCII-folded EDIT_PREFIX-char prefix (fold BEFORE cut — see module
    docstring for why the order is load-bearing cross-engine)."""
    return F.substring(F.regexp_replace(text, ASCII_FOLD_RE, "?"), 1, EDIT_PREFIX)


def editdist_verify(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Verify candidate pairs (id_a, id_b) against docs (doc_id, text).

    Returns (id_a, id_b, len_a, len_b, lev, sim_bp, is_dup) — one row per
    candidate pair that survives the length-gap prune (|len_a - len_b| >
    EDIT_MAX implies lev > EDIT_MAX: each unmatched char costs >= 1, so
    the DP is provably a reject and is skipped). sim_bp =
    (max_len - lev) * EDIT_SIM_BP DIV max(max_len, 1); is_dup = lev <=
    EDIT_MAX. Integer fixed point throughout — bit-identical in DuckDB.
    """
    folded = docs.select(
        F.col("doc_id"), folded_prefix_col(F.col("text")).alias("_p")
    )
    j = (
        pairs.join(
            folded.select(F.col("doc_id").alias("id_a"), F.col("_p").alias("_pa")),
            "id_a",
        )
        .join(
            folded.select(F.col("doc_id").alias("id_b"), F.col("_p").alias("_pb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.length("_pa").cast("bigint").alias("len_a"),
            F.length("_pb").cast("bigint").alias("len_b"),
            "_pa",
            "_pb",
        )
        # prune BEFORE the DP: the filter references only the lengths, so
        # Catalyst orders it under the levenshtein projection
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= EDIT_MAX)
    )
    max_len = F.greatest("len_a", "len_b")
    lev = F.levenshtein("_pa", "_pb").cast("bigint")
    return (
        j.select(
            "id_a",
            "id_b",
            "len_a",
            "len_b",
            lev.alias("lev"),
        )
        .select(
            "*",
            F.expr(
                f"CAST((greatest(len_a, len_b) - lev) * {EDIT_SIM_BP} AS BIGINT)"
                f" DIV greatest(greatest(len_a, len_b), 1)"
            ).alias("sim_bp"),
            (F.col("lev") <= EDIT_MAX).alias("is_dup"),
        )
        .orderBy("id_a", "id_b")
    )


# ---- pure-python twin (the pytest oracle) -----------------------------------


def levenshtein_py(a: str, b: str) -> int:
    """Classic two-row DP — must match Spark/DuckDB integer-for-integer."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def editdist_verify_py(
    pairs: list[tuple[int, int]], docs: dict[int, str]
) -> list[tuple[int, int, int, int, int, int, bool]]:
    """Reference implementation; sorted (id_a, id_b, len_a, len_b, lev,
    sim_bp, is_dup) rows — pytest pins the Spark path to this."""
    import re

    fold = re.compile(ASCII_FOLD_RE)
    out = []
    for id_a, id_b in pairs:
        ta, tb = docs.get(id_a), docs.get(id_b)
        if ta is None or tb is None:
            continue
        pa = fold.sub("?", ta)[:EDIT_PREFIX]
        pb = fold.sub("?", tb)[:EDIT_PREFIX]
        la, lb = len(pa), len(pb)
        if abs(la - lb) > EDIT_MAX:
            continue
        lev = levenshtein_py(pa, pb)
        ml = max(la, lb)
        sim_bp = (ml - lev) * EDIT_SIM_BP // max(ml, 1)
        out.append((id_a, id_b, la, lb, lev, sim_bp, lev <= EDIT_MAX))
    return sorted(out)
