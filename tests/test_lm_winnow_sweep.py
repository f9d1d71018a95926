"""Semantics tests for dq.lm (KN bigram tables), dq.winnow (winnowing
fingerprints), and the one-scan heuristic threshold sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq.lm import LM_DISCOUNT_MILLI, LM_MIN_COUNT, LM_SCALE, kn_bigram_table
from dq.winnow import WINNOW_K, WINNOW_W, winnowing_fps

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ lm ------


def test_kn_bigram_table_hand_corpus(spark):
    """Counts and the three KN terms on a corpus small enough to hand-check.

    Corpus bigrams: 'a b' x3, 'b a' x2, 'a c' x1, 'c a' x1 (across docs;
    bigrams never span documents).
    """
    rows = [
        (1, "a b a b"),   # a b, b a, a b
        (2, "a b"),       # a b
        (3, "b a c a"),   # b a, a c, c a
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {(r["w1"], r["w2"]): r.asDict() for r in kn_bigram_table(docs).collect()}
    # LM_MIN_COUNT = 2 drops the two singletons
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    # c(a,b)=3; c(a.)=4 (a b x3 + a c); N1+(a.)=2 {b,c}; N1+(.b)=1 {a}; T=4
    assert ab["cnt"] == 3 and ab["c_w1"] == 4
    assert ab["right_types_w1"] == 2 and ab["left_types_w2"] == 1
    assert ab["p_kn_micro"] == (1000 * 3 - LM_DISCOUNT_MILLI) * LM_SCALE // 4000
    assert ab["lambda_micro"] == LM_DISCOUNT_MILLI * 2 * LM_SCALE // 4000
    assert ab["cont_micro"] == 1 * LM_SCALE // 4
    ba = out[("b", "a")]
    # c(b,a)=2; c(b.)=2; N1+(b.)=1 {a}; N1+(.a)=2 {b,c}
    assert ba["cnt"] == 2 and ba["c_w1"] == 2
    assert ba["right_types_w1"] == 1 and ba["left_types_w2"] == 2
    assert ba["cont_micro"] == 2 * LM_SCALE // 4


def test_kn_probability_mass_bound(spark):
    """For every context w1 in the emitted table: the discounted bigram
    mass plus the backoff weight never exceeds one (in micro-units, up to
    integer flooring) — the KN estimator's sanity invariant."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tbl = kn_bigram_table(docs)
    per_ctx = (
        tbl.groupBy("w1")
        .agg(
            F.sum("p_kn_micro").alias("p_sum"),
            F.max("lambda_micro").alias("lam"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert per_ctx
    for r in per_ctx:
        # flooring only ever loses mass; emitted subset <= full distribution
        assert r["p_sum"] + r["lam"] <= LM_SCALE + r["n"]  # +n for rounding


# -------------------------------------------------------------- winnow ------


def _python_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W):
    from dq.classifier import POLY_MOD, POLY_MUL

    words = [t for t in text.lower().split() if t]
    grams = [" ".join(words[i : i + k]) for i in range(max(len(words) - k + 1, 0))]

    def h(g: str) -> int:
        acc = 0
        for c in g:
            acc = (acc * POLY_MUL + ord(c)) % POLY_MOD
        return acc

    hashes = [h(g) for g in grams]
    if not hashes:
        return set()
    n_win = max(len(hashes) - w + 1, 1)
    return {min(hashes[i : i + w]) for i in range(n_win)}


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b",                      # fewer than k tokens -> no grams
        "one two three",            # exactly k tokens -> 1 gram, short doc
        "x y z x y z x y z x y z",  # repetitive: heavy fp dedup
    ],
)
def test_winnowing_matches_python_twin(spark, text):
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = {r["fp"] for r in winnowing_fps(docs).collect()}
    assert got == _python_winnow(text)


def test_winnowing_shared_substring_guarantee(spark):
    """Two docs sharing a run of >= w + k - 1 tokens share a fingerprint
    (the paper's core guarantee)."""
    shared = " ".join(f"s{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    rows = [
        (1, "alpha beta gamma " + shared + " delta"),
        (2, "completely different prefix words " + shared),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnowing_fps(docs).collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2


def test_winnowing_density_reduction(spark):
    """On the real corpus the winnowed set is materially smaller than the
    full gram set (paper: expected density 2/(w+1))."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_fps = winnowing_fps(docs).count()
    n_grams = docs.select(
        F.greatest(
            F.size(F.split(F.lower(F.coalesce("text", F.lit(""))), r"\s+"))
            - WINNOW_K + 1,
            F.lit(0),
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert n_fps < n_grams * 0.75  # far under the full set (dedup helps too)


def test_winnowing_no_expression_blowup(spark):
    """The staged arrays survive into the optimized plan: the token split
    appears ONCE, not once per transform element (the higher-order capture
    trap, CLAUDE.md)."""
    import contextlib
    import io

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        winnowing_fps(docs).explain("extended")
    optimized = buf.getvalue().split("== Optimized Logical Plan ==")[1].split(
        "== Physical Plan =="
    )[0]
    # exactly 2 legitimate splits: the tokenizer (once per row, staged) and
    # the per-gram char split inside token_hash (inherently per element);
    # a capture-trap regression would inline the gram tree per window slice
    assert optimized.count("split(") <= 2, optimized[:2000]
    # the window-minima transform must slice a staged attribute, not a
    # recomputed hash-array expression
    assert "slice(_h#" in optimized, optimized[:2000]


# --------------------------------------------------------------- sweep ------


def test_threshold_sweep_monotone_and_anchored(spark):
    """Raising min_words can only shrink the keep set, and the production
    grid point equals the flagship tier's own keep_heuristic count."""
    from dq.heuristics import keep_expr, with_heuristic_metrics
    from dq.pipeline import DOCS_CONFIG
    from dq.queries import SWEEP_MIN_WORDS, heuristic_threshold_sweep

    out = {
        r["min_words"]: r.asDict()
        for r in heuristic_threshold_sweep(spark, SF).collect()
    }
    assert set(out) == set(SWEEP_MIN_WORDS)
    ordered = [out[g]["n_pass"] for g in sorted(SWEEP_MIN_WORDS)]
    assert ordered == sorted(ordered, reverse=True)
    for g in SWEEP_MIN_WORDS:
        assert out[g]["pass_rate_micro"] == out[g]["n_pass"] * 1_000_000 // out[g]["n_docs"]
    # anchor: the production threshold reproduces the pipeline's own count
    prod = DOCS_CONFIG.thresholds["min_words"]
    if prod in out:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        direct = (
            with_heuristic_metrics(docs)
            .where(keep_expr(DOCS_CONFIG.thresholds))
            .count()
        )
        assert out[prod]["n_pass"] == direct


def test_threshold_sweep_single_scan(spark):
    """The whole grid costs one corpus scan (conditional sums, not one
    pass per grid point)."""
    import contextlib
    import io

    from dq.queries import heuristic_threshold_sweep

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        heuristic_threshold_sweep(spark, SF).explain("simple")
    assert buf.getvalue().count("Scan parquet") == 1
