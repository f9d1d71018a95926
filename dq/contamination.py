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

from dq.textstats import word_ngrams_col

# ---- shared constants (dq.oracles generates SQL from these) ----------------

BENCH_DOC_MOD = 7      # doc_id % BENCH_DOC_MOD == 0 -> doc is benchmark text
CONTAM_NGRAM_N = 5     # overlap unit: 5-word grams (GPT-3 used 13-gram; the
                       # synthetic docs are ~30 words, so 5 keeps power)
CONTAM_FLAG_BP = 2000  # flag a doc when >= 20% of its grams are benchmark


def _grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, grams) with the words array materialized as a real column
    first — word_ngrams_col references it O(n) times (see its docstring)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda w: w != F.lit(""))
    return docs.select(F.col(id_col).alias("doc_id"), words.alias("_w")).select(
        "doc_id", word_ngrams_col(F.col("_w"), CONTAM_NGRAM_N).alias("grams")
    )


def benchmark_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Distinct 8-byte gram fingerprints of the benchmark slice."""
    bench = docs.where(F.col(id_col) % BENCH_DOC_MOD == 0)
    return (
        _grams(bench, id_col, text_col)
        .select(F.explode("grams").alias("gram"))
        .select(F.xxhash64("gram").alias("fp"))
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
    per_doc = _grams(eval_docs, id_col, text_col).select(
        "doc_id", F.size("grams").cast("bigint").alias("n_grams"), "grams"
    )
    hits = (
        per_doc.select("doc_id", F.explode("grams").alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("fp"))
        .join(F.broadcast(bench), "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n_hits"))
    )
    bp = F.when(
        F.col("n_grams") > 0,
        F.floor(F.col("n_hits") * 10000 / F.col("n_grams")),
    ).otherwise(F.lit(0)).cast("bigint")
    return (
        per_doc.drop("grams")
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
