"""Hashed linear quality classifier: semantics + python-twin parity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dq.classifier import (
    KEEP_TAU_MICRO,
    POLY_MOD,
    POLY_MUL,
    TOXIC_WEIGHT_MICRO,
    WEIGHT_SPAN,
    classifier_scores,
)
from dq.scrub import TOXIC_WORDS


def py_weight(tok: str) -> int:
    if tok in TOXIC_WORDS:
        return TOXIC_WEIGHT_MICRO
    h = 0
    for c in tok:
        h = (h * POLY_MUL + ord(c)) % POLY_MOD
    return h % WEIGHT_SPAN - WEIGHT_SPAN // 2


def py_score(text: str) -> tuple[int, int, bool]:
    toks = [t for t in text.lower().split() if t]
    s = sum(py_weight(t) for t in toks)
    return len(toks), s, s >= KEEP_TAU_MICRO * len(toks)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "moron imbecile scumbag dumbass jackass moron imbecile scumbag"),
        (2, ""),
        (3, "single"),
        (4, "Mixed CASE Tokens  with   extra whitespace"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_twin(docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["keep_quality"])
        for r in classifier_scores(docs).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, text in texts.items():
        assert got[i] == py_score(text), (i, text)


def test_toxic_docs_score_below_clean(docs):
    got = {r["doc_id"]: r for r in classifier_scores(docs).collect()}
    clean, toxic = got[0], got[1]
    # per-token mean weight, not raw sum (different lengths)
    assert (
        toxic["score_micro"] * clean["n_tokens"]
        < clean["score_micro"] * toxic["n_tokens"]
    )
    assert not toxic["keep_quality"]


def test_empty_doc_keeps_trivially(docs):
    got = {r["doc_id"]: r for r in classifier_scores(docs).collect()}
    assert got[2]["n_tokens"] == 0
    assert got[2]["score_micro"] == 0
    assert got[2]["keep_quality"]


def test_weights_span_and_determinism(spark):
    # weights stay inside [-span/2, span/2] (toxic prior aside) and the
    # same token always maps to the same weight across frames/sessions.
    toks = spark.createDataFrame(
        [(w,) for w in ["alpha", "beta", "gamma", "alpha"]], "text string"
    )
    scored = classifier_scores(toks.select(F.lit(0).alias("doc_id"), "text"))
    vals = [r["score_micro"] for r in scored.collect()]
    half = WEIGHT_SPAN // 2
    assert all(-half <= v <= half for v in vals)
    assert vals[0] == vals[3]


def test_ccnet_buckets_discrete_pick_matches_python():
    # recompute the per-lang tercile edges + labels in pure Python from the
    # collected rates; the engine must agree exactly (same discrete pick)
    import collections

    from dq.classifier import ccnet_buckets
    from dq.session import get_spark
    from tests.conftest import SF0001

    spark = get_spark("dq-tests", master="local[8]", shuffle_partitions=8)
    out = ccnet_buckets(
        spark.read.parquet(SF0001 + "/documents.parquet")
    ).collect()
    by_lang = collections.defaultdict(list)
    for r in out:
        by_lang[r.lang].append(r.rate_nano)
    edges = {}
    for lang, rates in by_lang.items():
        s, n = sorted(rates), len(rates)
        edges[lang] = (s[(n + 2) // 3 - 1], s[(2 * n + 2) // 3 - 1])
    assert len(edges) >= 2  # really per-language
    for r in out:
        e1, e2 = edges[r.lang]
        expect = "tail" if r.rate_nano <= e1 else ("middle" if r.rate_nano <= e2 else "head")
        assert r.bucket == expect
    # every language fills all three buckets at this corpus size
    seen = collections.defaultdict(set)
    for r in out:
        seen[r.lang].add(r.bucket)
    assert all(v == {"head", "middle", "tail"} for v in seen.values())


def test_ccnet_rate_truncates_toward_zero(spark):
    # a toxic-only doc has a negative score sum; Spark DIV truncates toward
    # zero and the oracle emulates that — pin the Python-trunc expectation
    from dq.classifier import CCNET_RATE_SCALE, ccnet_buckets

    text = " ".join([TOXIC_WORDS[0]] * 2 + ["neutralword"])
    df = spark.createDataFrame(
        [(1, text, "en"), (2, "plain words here", "en"), (3, "more text", "en")],
        "doc_id bigint, text string, lang string",
    )
    scored = {r["doc_id"]: r for r in classifier_scores(df).collect()}
    sm, n = scored[1]["score_micro"], scored[1]["n_tokens"]
    assert sm < 0
    q = sm * CCNET_RATE_SCALE
    expect = -((-q) // n) if q < 0 else q // n
    got = {r.doc_id: r.rate_nano for r in ccnet_buckets(df).collect()}
    assert got[1] == expect


# ---- exact ROC-AUC (Mann-Whitney with midranks) -----------------------------


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "score bigint, k int")


def ref_auc(scored: list[tuple[int, int]]) -> tuple[int, int]:
    """Brute-force pair-counting reference: (auc_num, auc_den) with
    auc = (wins + ties/2) / (n_pos*n_neg) expressed as exact integers
    num = 2*wins + ties, den = 2*n_pos*n_neg."""
    pos = [s for s, k in scored if k == 1]
    neg = [s for s, k in scored if k == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return 2 * wins + ties, 2 * len(pos) * len(neg)


def test_exact_auc_hand_case_with_ties(spark):
    from dq.classifier import exact_auc

    # scores 1,2,2,3 / labels 0,0,1,1 -> wins 3, ties 1 -> 3.5/4 = 0.875
    row = exact_auc(
        _pairs_df(spark, [(1, 0), (2, 0), (2, 1), (3, 1)]), score_col="score"
    ).collect()[0]
    assert (row["auc_num"], row["auc_den"]) == (7, 8)
    assert row["auc_bp"] == 8750
    assert (row["n_pos"], row["n_neg"]) == (2, 2)


def test_exact_auc_perfect_and_inverted(spark):
    from dq.classifier import exact_auc

    perfect = [(10, 0), (20, 0), (30, 1), (40, 1)]
    row = exact_auc(_pairs_df(spark, perfect), score_col="score").collect()[0]
    assert row["auc_num"] == row["auc_den"] and row["auc_bp"] == 10000
    inverted = [(s, 1 - k) for s, k in perfect]
    row = exact_auc(_pairs_df(spark, inverted), score_col="score").collect()[0]
    assert row["auc_num"] == 0 and row["auc_bp"] == 0


def test_exact_auc_one_class_sentinel(spark):
    from dq.classifier import exact_auc

    row = exact_auc(
        _pairs_df(spark, [(1, 1), (2, 1)]), score_col="score"
    ).collect()[0]
    assert row["auc_den"] == 0 and row["auc_bp"] == -1


def test_exact_auc_matches_bruteforce_on_skewed_ties(spark):
    from dq.classifier import exact_auc

    # deterministic LCG-planted scores with heavy ties (score domain 0..7)
    rows, x = [], 7
    for i in range(240):
        x = (x * 1103515245 + 12345) % (2**31)
        rows.append(((x >> 3) % 8, (x >> 11) % 2))
    num, den = ref_auc(rows)
    row = exact_auc(_pairs_df(spark, rows), score_col="score").collect()[0]
    assert (row["auc_num"], row["auc_den"]) == (num, den)
    assert row["auc_bp"] == num * 10000 // den
