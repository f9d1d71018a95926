"""Benchmark contamination detection: n-gram overlap against an eval suite.

Training-data-pipeline addition beyond the reference's table-level DQ scope
(reference: ColetaDuplicidade.scala computes table-internal dup metrics only).
Published semantics followed: GPT-3 / PaLM / Llama decontamination — a
training document is contaminated when a large fraction of its word n-grams
also appear in a held-out benchmark suite; such docs are dropped or flagged
before training.

The driver-gate corpus has no external benchmark, so the suite is
CONSTRUCTED deterministically: every BENCH_DOC_MOD-th document of the
``documents`` table *is* the benchmark set, and the remaining documents are
scored against it — all driven by the shared constants below; dq.oracles
generates the DuckDB twin from the SAME constants.

Scale shapes (100 TB notes):
- The benchmark gram set is bounded by the eval suites (MMLU+ARC+GSM8K+...
  is tens of MB of text → a few million distinct grams); it is reduced to
  8-byte xxhash64 fingerprints and BROADCAST — the corpus side never
  shuffles its text. xxhash64 is a membership KEY only (grouping by
  fingerprint ≡ grouping by gram at these set sizes); the DuckDB oracle
  joins on the gram string itself and the outputs still match.
- The corpus side explodes to (doc_id, fp) — 16 B rows — hash-joins the
  broadcast set, and re-aggregates by uniform doc_id keys with map-side
  partials. The join-back to per-doc gram counts is a narrow ~16 B/doc
  exchange. Document text never enters any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dq.dedup import tokens_col

# ---- shared constants (dq.oracles generates SQL from these) ----------------

BENCH_DOC_MOD = 7      # doc_id % BENCH_DOC_MOD == 0 -> doc is benchmark text
CONTAM_NGRAM_N = 5     # overlap unit: 5-word grams (GPT-3 used 13-gram; the
                       # synthetic docs are ~30 words, so 5 keeps power)
CONTAM_FLAG_BP = 2000  # flag a doc when >= 20% of its grams are benchmark


def _gram_fps(docs: DataFrame, id_col: str, text_col: str,
              n: int = CONTAM_NGRAM_N) -> DataFrame:
    """(doc_id, n_grams, _fps): int64 gram fingerprints built INCREMENTALLY
    (token hashes once, then xxhash64(prev, next) per zip_with level — the
    dq.dedup.hashed_shingles_col shape). The string-gram formulation
    (word_ngrams_col under explode) duplicates the words subtree per
    zip_with level once CollapseProject inlines the staging: at n=5 the
    optimized plan held 47 copies of split() and the query cost 6 s at
    sf0.1 — measured; this shape holds one. n_grams is arithmetic
    (len - n + 1), not a second evaluation of the gram array. The scheme
    is a membership KEY only and is applied identically to both sides, so
    the string-joining DuckDB oracle still matches.
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_w")
    ).select("doc_id", F.transform("_w", lambda t: F.xxhash64(t)).alias("_h"))
    h = F.col("_h")
    g = h
    for j in range(1, n):
        g = F.zip_with(g, F.slice(h, j + 1, F.size(h)), lambda a, b: F.xxhash64(a, b))
    fps = F.when(F.size(h) >= n, F.slice(g, 1, F.size(h) - n + 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    return staged.select(
        "doc_id",
        F.greatest(F.size(h) - (n - 1), F.lit(0)).cast("bigint").alias("n_grams"),
        fps.alias("_fps"),
    )


# public alias: dq.dedup's duplicate-span detector reuses the same
# incremental gram-fingerprint builder (identical scheme on every consumer
# keeps the string-gram DuckDB twins valid).
gram_fingerprints = _gram_fps


def benchmark_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Distinct 8-byte gram fingerprints of the benchmark slice."""
    bench = docs.where(F.col(id_col) % BENCH_DOC_MOD == 0)
    # explode_outer, NOT explode: InferFiltersFromGenerate turns a plain
    # explode into a size(arr) > 0 filter below the Generate, and pushing
    # it through the staging Projects inlines the whole gram tree (22
    # split() copies in the optimized plan, ~2.4x wall on this query —
    # measured). The outer variant infers nothing; the null rows from
    # empty arrays are dropped by the cheap post-Generate filter here and
    # by the inner fp join on the corpus side.
    return (
        _gram_fps(bench, id_col, text_col)
        .select(F.explode_outer("_fps").alias("fp"))
        .where(F.col("fp").isNotNull())
        .distinct()
    )


def contamination_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_bp: int = CONTAM_FLAG_BP,
) -> DataFrame:
    """Per non-benchmark doc: gram counts, benchmark-hit counts, exact
    basis-point contamination, and the drop flag.

    (doc_id, n_grams, n_hits, contamination_bp, is_contaminated):
    contamination_bp = floor(10000 * n_hits / n_grams) — exact integer
    division, bit-stable across engines; docs too short to form a gram
    score 0 / unflagged.
    """
    bench = benchmark_fingerprints(docs, id_col, text_col)
    eval_docs = docs.where(F.col(id_col) % BENCH_DOC_MOD != 0)
    per_doc = _gram_fps(eval_docs, id_col, text_col)
    # materialize once: per_doc feeds both the hits branch and the final
    # join-back, and without the cut Spark duplicates the whole
    # tokenize+zip_with gram-hash subtree — 2x the dominant cost
    per_doc = per_doc.localCheckpoint()
    hits = (
        per_doc.select("doc_id", F.explode_outer("_fps").alias("fp"))
        .join(F.broadcast(bench), "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n_hits"))
    )
    bp = F.when(
        F.col("n_grams") > 0,
        F.floor(F.col("n_hits") * 10000 / F.col("n_grams")),
    ).otherwise(F.lit(0)).cast("bigint")
    return (
        per_doc.drop("_fps")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("_n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .select(
            "doc_id", "n_grams", "n_hits",
            bp.alias("contamination_bp"),
            (bp >= flag_bp).alias("is_contaminated"),
        )
    )
