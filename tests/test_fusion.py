"""dq.fusion — reciprocal-rank fusion of quality signals.

Pure-Python twin (dense DESC ranks, integer floor-division contributions)
checked against rrf_fuse on hand data with ties, plus a plan assertion
that the per-signal rank tables join back as broadcasts (the window runs
over the value domain, never the corpus — the scale contract in the
module docstring).
"""

from __future__ import annotations

import pytest

from dq import fusion
from dq.fusion import RRF_K, RRF_SCALE, dense_rank_by_value, rrf_fuse


def ref_dense_rank_desc(values: list[int]) -> dict[int, int]:
    """value -> dense rank (1 = highest value; ties share a rank)."""
    return {v: i + 1 for i, v in enumerate(sorted(set(values), reverse=True))}


def ref_rrf(rows: list[dict], signals: list[str]) -> dict[str, int]:
    """doc_id -> fused integer score, Σ SCALE // (K + dense_rank)."""
    ranks = {s: ref_dense_rank_desc([r[s] for r in rows]) for s in signals}
    return {
        r["doc_id"]: sum(RRF_SCALE // (RRF_K + ranks[s][r[s]]) for s in signals)
        for r in rows
    }


ROWS = [
    # ties in sig_a (20 twice) and sig_b (5 twice), distinct sig_c
    {"doc_id": "d1", "sig_a": 20, "sig_b": 5, "sig_c": 100},
    {"doc_id": "d2", "sig_a": 20, "sig_b": 9, "sig_c": 90},
    {"doc_id": "d3", "sig_a": 7, "sig_b": 5, "sig_c": 105},
    {"doc_id": "d4", "sig_a": 30, "sig_b": 1, "sig_c": 70},
]


def _df(spark):
    return spark.createDataFrame(
        [tuple(r.values()) for r in ROWS],
        "doc_id string, sig_a bigint, sig_b bigint, sig_c bigint",
    )


def test_dense_rank_by_value_is_dense_and_desc(spark):
    got = {
        r["sig_a"]: r["rk"]
        for r in dense_rank_by_value(_df(spark), "sig_a", "rk").collect()
    }
    assert got == {30: 1, 20: 2, 7: 3}  # tie collapses to ONE distinct row


def test_rrf_fuse_matches_python_reference(spark):
    out = rrf_fuse(_df(spark), ["sig_a", "sig_b", "sig_c"]).collect()
    expect = ref_rrf(ROWS, ["sig_a", "sig_b", "sig_c"])
    assert {r["doc_id"]: r["rrf_micro"] for r in out} == expect
    # tied signal values must carry the SAME rank on both tied docs
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["d1"]["rank_sig_a"] == by_id["d2"]["rank_sig_a"]
    assert by_id["d1"]["rank_sig_b"] == by_id["d3"]["rank_sig_b"]


def test_rrf_fuse_preserves_rows_and_is_deterministic(spark):
    df = _df(spark)
    a = rrf_fuse(df, ["sig_a", "sig_b"]).collect()
    b = rrf_fuse(df, ["sig_a", "sig_b"]).collect()
    assert len(a) == len(ROWS)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rrf_rank_tables_broadcast(spark):
    """The rank-table join-backs must be broadcast hash joins — a shuffled
    sort-merge join here would mean the value-domain frame is being treated
    as corpus-sized."""
    spark.catalog.clearCache()
    plan = (
        rrf_fuse(_df(spark), ["sig_a", "sig_b", "sig_c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_rrf_k_zero_guard():
    """K + rank is always >= 1 + 1 with the default K; a K of -1 would
    divide by zero at rank 1 — the constants must keep the denominator
    positive."""
    assert RRF_K >= 0 and RRF_SCALE > 0
    assert fusion.RRF_K == 60  # Cormack et al.'s published constant
