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


# ---- production log-double scoring path (VERDICT r4 next-#5) ----------------


def test_log_path_rank_identical_to_integer_twin(docs, weights):
    """dsir_weights_log orders documents exactly like the integer twin:
    imp_log = ln(mean bucket ratio) and ln is monotone, so the selection
    order (imp DESC, doc_id ASC) is shared; n_grams agree row-for-row and
    gram-less docs sit at the neutral 0.0 = ln(1)."""
    from dq.dsir import dsir_weights_log

    wl = {r["doc_id"]: r for r in dsir_weights_log(docs, F.col("tgt")).collect()}
    wi = {r["doc_id"]: r for r in weights.collect()}
    assert set(wl) == set(wi)
    for d in wi:
        assert wl[d]["n_grams"] == wi[d]["n_grams"]
    for d in (4, 5):
        assert wl[d]["imp_log"] == 0.0
    order_int = sorted(wi, key=lambda d: (-wi[d]["imp_micro"], d))
    order_log = sorted(wl, key=lambda d: (-wl[d]["imp_log"], d))
    assert order_log == order_int


def test_log_ratio_exact_across_int64_overflow_boundary(spark):
    """Property at the documented int64 boundary (dq/dsir.py module notes):
    with raw totals in the 10^12-10^13 gram range the integer twin's triple
    product (tgt+1)*(raw_total+B)*SCALE exceeds 2^63-1 (checked in exact
    Python ints), while the log-double table stays finite, matches the
    exact rational ratio to <=1e-9 relative error, and preserves the
    bucket ordering the selection depends on."""
    import math
    from fractions import Fraction

    from dq.dsir import DSIR_BUCKETS, DSIR_SCALE, bucket_ratio_table_log

    # per bucket: (tgt_cnt, extra_raw_cnt) — totals land beyond the boundary
    cases = {
        0: (10**12, 3 * 10**12),
        1: (5 * 10**12, 7 * 10**11),
        2: (1, 9 * 10**12),
        3: (2 * 10**12, 0),
    }
    rows = []
    for b, (t, r) in cases.items():
        rows.append((2 * b, b, True, t))
        if r:
            rows.append((2 * b + 1, b, False, r))
    occ = spark.createDataFrame(
        rows, "doc_id long, bucket long, is_target boolean, cnt long"
    )
    got = {
        r["bucket"]: r["log_ratio"]
        for r in bucket_ratio_table_log(occ, DSIR_BUCKETS).collect()
    }
    raw_total = sum(t + r for t, r in cases.values())
    tgt_total = sum(t for t, _ in cases.values())
    exact = {
        b: Fraction((t + 1) * (raw_total + DSIR_BUCKETS),
                    (t + r + 1) * (tgt_total + DSIR_BUCKETS))
        for b, (t, r) in cases.items()
    }
    overflowed = 0
    for b, (t, r) in cases.items():
        # the integer twin's product in exact ints — past the boundary here
        if (t + 1) * (raw_total + DSIR_BUCKETS) * DSIR_SCALE > 2**63 - 1:
            overflowed += 1
        assert math.isfinite(got[b])
        assert got[b] == pytest.approx(math.log(float(exact[b])), rel=1e-9)
    assert overflowed == len(cases), "cases must actually cross the boundary"
    # ordering preserved vs the exact rational ratios
    assert sorted(got, key=lambda b: got[b]) == sorted(exact, key=lambda b: exact[b])
