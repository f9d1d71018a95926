"""dq.pq — product quantization: python-twin exactness, ADC semantics,
plan shapes.

The pure-Python twin re-implements quantize → slice → per-subspace Lloyd
→ encode → ADC from the paper's definitions; every Spark output must
match it integer-for-integer (the same discipline as the DuckDB oracle,
but independent of SQL)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dq.pq import (
    PQ_CENT_MOD,
    PQ_ITERS,
    PQ_M,
    PQ_SUB,
    pq_adc_topk,
    pq_encode,
    pq_train,
)

SF = "/root/testdata/sf0.001"


# ---------- pure-Python twin -------------------------------------------------


def _quantize(vec) -> list[int]:
    return [math.floor(float(x) * 1000) for x in vec]


def _d2(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def py_pq_train(vecs: dict[int, list], cent_mod: int, iters: int):
    subs = {
        (i, s): _quantize(v)[s * PQ_SUB : (s + 1) * PQ_SUB]
        for i, v in vecs.items()
        for s in range(PQ_M)
    }
    cents = {
        (s, i): subs[(i, s)] for i in vecs if i % cent_mod == 0 for s in range(PQ_M)
    }
    for _ in range(iters):
        assign = {
            (i, s): min(
                ((_d2(sv, cq), cid) for (cs, cid), cq in cents.items() if cs == s)
            )
            for (i, s), sv in subs.items()
        }
        new: dict[tuple[int, int], list[int]] = {}
        for (cs, cid) in {(s, assign[(i, s)][1]) for (i, s) in subs}:
            members = [
                subs[(i, s)] for (i, s) in subs if s == cs and assign[(i, s)][1] == cid
            ]
            new[(cs, cid)] = [
                sum(m[p] for m in members) // len(members) for p in range(PQ_SUB)
            ]
        cents = new
    return subs, cents


def py_pq_encode(subs, cents):
    return {
        (i, s): min(((_d2(sv, cq), cid) for (cs, cid), cq in cents.items() if cs == s))
        for (i, s), sv in subs.items()
    }


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def py_twin(emb):
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    subs, cents = py_pq_train(vecs, PQ_CENT_MOD, PQ_ITERS)
    return vecs, subs, cents, py_pq_encode(subs, cents)


def test_codes_match_python_twin(emb, py_twin):
    _, _, _, codes = py_twin
    got = {
        (r["vec_id"], r["sub_id"]): (r["sq_dist"], r["code"])
        for r in pq_encode(emb, pq_train(emb)).collect()
    }
    assert got == codes
    assert len(got) == emb.count() * PQ_M  # M rows per vector, none lost


def test_codebooks_match_python_twin(emb, py_twin):
    _, _, cents, _ = py_twin
    got = {
        (r["_sub"], r["_cid"]): list(r["_cq"]) for r in pq_train(emb).collect()
    }
    assert got == cents


def test_adc_topk_matches_python_twin(emb, py_twin):
    vecs, subs, cents, codes = py_twin
    k, qmod = 5, 25
    qids = [i for i in vecs if i % qmod == 0]
    expect = []
    for q in sorted(qids):
        dt = {
            (s, cid): _d2(subs[(q, s)], cq) for (s, cid), cq in cents.items()
        }
        scored = sorted(
            (sum(dt[(s, codes[(i, s)][1])] for s in range(PQ_M)), i)
            for i in vecs
            if i != q
        )
        expect.extend(
            (q, nid, r + 1, d) for r, (d, nid) in enumerate(scored[:k])
        )
    queries = emb.where(F.col("vec_id") % qmod == 0)
    got = [
        (r["query_id"], r["neighbor_id"], r["rank"], r["adc_d2"])
        for r in pq_adc_topk(emb, queries, k=k).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_identical_vector_scores_query_self_distance(spark):
    """A corpus vector IDENTICAL to the query must score exactly the
    query's own reconstruction ADC (same codes, same table) — the
    compression never separates exact duplicates."""
    base = spark.read.parquet(f"{SF}/embeddings.parquet").limit(120)
    dup = base.where("vec_id = 25").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    emb = base.unionByName(dup)
    queries = emb.where("vec_id = 25")
    got = {r["neighbor_id"]: r["adc_d2"] for r in pq_adc_topk(emb, queries, k=3).collect()}
    assert 10025 in got
    # self-ADC of the duplicate == sum of the query's per-sub quantization
    # errors to its own codes' centroids, which is the minimum possible fold
    assert got[10025] == min(got.values())


def test_empty_seed_guard(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where("vec_id % 2 = 1")
    with pytest.raises(ValueError, match="no seed vectors"):
        pq_train(emb, cent_mod=2)


def test_pq_plan_shapes(spark, emb):
    """Codebooks must broadcast into both training and encode joins (no
    sort-merge of the corpus), and the ADC scan must broadcast the
    per-query tables over the code frame."""
    spark.catalog.clearCache()
    enc_plan = (
        pq_encode(emb, pq_train(emb))._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in enc_plan
    assert "SortMergeJoin" not in enc_plan

    queries = emb.where(F.col("vec_id") % 25 == 0)
    adc_plan = (
        pq_adc_topk(emb, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in adc_plan or "BroadcastHashJoin" in adc_plan
    assert "CartesianProduct" not in adc_plan
