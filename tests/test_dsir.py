"""DSIR importance resampling: python-twin parity + selection semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dq.classifier import POLY_MOD, POLY_MUL
from dq.dsir import DSIR_BUCKETS, DSIR_SCALE, dsir_select, dsir_weights


def py_bucket(gram: str, n_buckets: int = DSIR_BUCKETS) -> int:
    h = 0
    for c in gram:
        h = (h * POLY_MUL + ord(c)) % POLY_MOD
    return h % n_buckets


def py_grams(text: str | None) -> list[str]:
    toks = [t for t in (text or "").lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def py_weights(rows: list[tuple[int, str | None, bool]]) -> dict[int, tuple[int, int]]:
    """(doc_id, text, is_target) -> {doc_id: (n_grams, imp_micro)} — the
    literal integer spec from the dq/dsir.py docstring."""
    occ: dict[tuple[int, int], int] = {}
    target: dict[int, bool] = {}
    for doc_id, text, is_tgt in rows:
        target[doc_id] = is_tgt
        for g in py_grams(text):
            key = (doc_id, py_bucket(g))
            occ[key] = occ.get(key, 0) + 1
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for (doc_id, b), c in occ.items():
        raw[b] = raw.get(b, 0) + c
        if target[doc_id]:
            tgt[b] = tgt.get(b, 0) + c
    raw_total, tgt_total = sum(raw.values()), sum(tgt.values())
    ratio = {
        b: ((tgt.get(b, 0) + 1) * (raw_total + DSIR_BUCKETS) * DSIR_SCALE)
        // ((raw[b] + 1) * (tgt_total + DSIR_BUCKETS))
        for b in raw
    }
    out: dict[int, tuple[int, int]] = {}
    for doc_id, _, _ in rows:
        cnts = {b: c for (d, b), c in occ.items() if d == doc_id}
        n = sum(cnts.values())
        if n == 0:
            out[doc_id] = (0, DSIR_SCALE)
        else:
            out[doc_id] = (n, sum(c * ratio[b] for b, c in cnts.items()) // n)
    return out


ROWS = [
    (0, "machine learning models train on curated text corpora", True),
    (1, "machine learning models need curated training text", True),
    (2, "cheap pills discount casino bonus click here now", False),
    (3, "machine learning text corpora and casino bonus spam", False),
    (4, "", False),
    (5, None, False),
    (6, "unrelated words entirely separate vocabulary domain tokens", False),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, tgt) for i, t, tgt in ROWS], "doc_id long, text string, tgt boolean"
    )


@pytest.fixture(scope="module")
def weights(docs):
    return dsir_weights(docs, F.col("tgt")).persist()


def test_matches_python_twin(weights):
    got = {r["doc_id"]: (r["n_grams"], r["imp_micro"]) for r in weights.collect()}
    assert got == py_weights(ROWS)


def test_target_overlap_scores_higher(weights):
    """Docs sharing the target slice's grams outrank disjoint-vocab docs."""
    imp = {r["doc_id"]: r["imp_micro"] for r in weights.collect()}
    assert imp[1] > imp[2], "target-overlapping doc must beat spam doc"
    assert imp[3] > imp[2], "partial overlap must beat zero overlap"
    assert imp[1] > imp[6], "target grams must beat unseen-but-neutral vocab"


def test_empty_docs_get_neutral_ratio(weights):
    got = {r["doc_id"]: r for r in weights.collect()}
    for doc_id in (4, 5):
        assert got[doc_id]["n_grams"] == 0
        assert got[doc_id]["imp_micro"] == DSIR_SCALE


def test_select_topk_matches_sort_rank(weights):
    """Histogram-threshold selection == row_number over (imp DESC, doc_id)."""
    rows = sorted(
        weights.collect(), key=lambda r: (-r["imp_micro"], r["doc_id"])
    )
    for k in (1, 2, 3, 5, 100):
        expect = {r["doc_id"] for r in rows[:k]}
        got = {
            r["doc_id"]
            for r in dsir_select(weights, k=k).collect()
            if r["selected"]
        }
        assert got == expect, f"k={k}"


def test_select_ties_break_by_doc_id(spark):
    """All-equal importance: exactly the k lowest doc_ids are selected."""
    same = spark.createDataFrame(
        [(i, "identical text for every doc") for i in range(10)],
        "doc_id long, text string",
    )
    w = dsir_weights(same, F.lit(False))
    got = {r["doc_id"] for r in dsir_select(w, k=4).collect() if r["selected"]}
    assert got == {0, 1, 2, 3}


def test_selected_is_never_null(weights):
    out = dsir_select(weights, k=3).collect()
    assert all(r["selected"] in (True, False) for r in out)


def test_gram_plan_stays_staged(docs):
    """The optimized plan must not inline the token array into per-element
    work (the CLAUDE.md higher-order-capture check): the single-consumer
    gram frame tokenizes exactly once per row. dsir_weights persists this
    frame, so its multi-branch plan repeats the subtree textually — assert
    on the one-branch frame where the count is meaningful."""
    from dq.dsir import gram_bucket_rows

    # fresh frame, NOT the module fixture: the weights fixture persisted the
    # same occ plan and the CacheManager would substitute InMemoryRelation,
    # hiding the projection shape (the CLAUDE.md plan-test cache trap)
    fresh = docs.sparkSession.createDataFrame(
        [(1, "alpha beta gamma", True)], "doc_id long, text string, tgt boolean"
    )
    occ = gram_bucket_rows(fresh, F.col("tgt"))
    plan = occ._jdf.queryExecution().optimizedPlan().toString()
    # exactly one whitespace tokenization per row (split(_gram, '') is the
    # cheap per-gram char split inside token_hash, not a re-tokenization)
    assert plan.count("split(lower") == 1, plan
    assert "CartesianProduct" not in plan
