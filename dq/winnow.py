"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003).

Training-data-pipeline addition beyond the reference's table-level DQ scope.
The MOSS local-fingerprinting algorithm: hash every k-gram, slide a window
of ``w`` consecutive gram hashes over the document, keep the minimum of each
window — the selected set is position-robust (any shared substring of at
least w + k - 1 tokens is guaranteed to share a fingerprint) and its density
is ~2/(w+1), i.e. a ~10x reduction versus the full gram set that plain
k-gram fingerprinting (dq.queries.doc_fingerprints, dq/dedup.py span fps)
would index. Deviations from the paper, deterministic on both engines:
word-level grams via the shared lowercased-whitespace tokenizer (the paper
uses char grams), the shared 31-ary polynomial token hash
(dq.classifier.token_hash), and set semantics per document (the paper's
rightmost-min tie rule matters only for positional provenance, which the
(doc_id, fp) output doesn't carry).

Docs with fewer than ``w`` grams yield the global minimum once (the paper's
short-document convention); docs with no grams yield nothing.

Scale shape (100 TB notes): the gram/hash/minima arrays are per-row native
expressions — ZERO exchange until the final distinct on (doc_id, fp) 16-B
rows. Arrays are materialized as real columns between selects (the
higher-order-capture trap, CLAUDE.md): each transform lambda references an
attribute, not an expression subtree, so the slice inside the window-minima
transform costs O(w) per element instead of re-evaluating the gram tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dq.classifier import token_hash
from dq.dedup import tokens_col

# ---- shared constants (dq.oracles generates SQL from these) ----------------

WINNOW_K = 3   # tokens per gram
WINNOW_W = 4   # gram hashes per winnowing window

WINNOW_FP_MAX_DOCS = 50   # fps in more docs are boilerplate — dropped
WINNOW_MIN_SHARED = 5     # candidate pair needs >= this many shared fps
WINNOW_SCALE = 1_000_000  # overlap reported in micro-units


def winnowing_fps(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, fp) distinct winnowing fingerprints per document."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
    )
    # sequence(1, 0) is DESCENDING [1, 0] in Spark — a doc below the gram/
    # window floor must short-circuit to an empty array, not an empty range
    grams = toks.select(
        "doc_id",
        F.when(
            F.size("_t") >= k,
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - k + 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, k)),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("_g"),
    )
    hashes = grams.select(
        "doc_id", F.transform("_g", lambda g: token_hash(g)).alias("_h")
    )
    minima = hashes.select(
        "doc_id",
        F.when(
            F.size("_h") > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("_h") - w + 1, F.lit(1))),
                lambda i: F.array_min(F.slice(F.col("_h"), i, w)),
            ),
        ).otherwise(F.array().cast("array<bigint>")).alias("_m"),
    )
    ex = minima.select(
        "doc_id", F.explode_outer(F.array_distinct("_m")).alias("fp")
    ).where(F.col("fp").isNotNull())
    return ex.select("doc_id", F.col("fp").cast("bigint").alias("fp"))


def winnow_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    fp_max_docs: int = WINNOW_FP_MAX_DOCS,
    scale: int = WINNOW_SCALE,
) -> DataFrame:
    """(doc_a, doc_b, shared_fps, n_fps_a, n_fps_b, overlap_micro):
    near-dup candidate pairs by shared winnowing fingerprints — the MOSS
    matching step. ``overlap_micro`` is the containment-style score
    ``shared * scale DIV min(n_a, n_b)`` over the post-filter fp sets.

    Scale shape: the candidate generator is an fp equi-join (the LSH-band
    pattern — never a cartesian). Fingerprints present in more than
    ``fp_max_docs`` documents are boilerplate (stop-phrase grams): they are
    dropped BEFORE the self-join, which both bounds the per-key fan-out at
    fp_max_docs² rows and removes the meaningless matches — the standard
    hot-band cap. Pair sizes attach from the narrow per-doc fp counts after
    the same filter, so both engines score over identical sets.
    """
    fps = winnowing_fps(docs, id_col, text_col, k, w)
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") > fp_max_docs)
        .select("fp")
    )
    kept = fps.join(hot.hint("shuffle_hash"), "fp", "left_anti")
    sizes = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fps")
    )
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_fps", "n_fps_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_fps", "n_fps_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            "n_fps_a",
            "n_fps_b",
            F.expr(f"shared_fps * {scale} DIV least(n_fps_a, n_fps_b)")
            .cast("bigint")
            .alias("overlap_micro"),
        )
    )
