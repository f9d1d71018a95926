"""dq.heavyhitters — Misra–Gries guarantee + exact candidates→verify top-k.

The gate corpus vocabulary (31 tokens) never trips the 4096-counter cap,
so these tests plant a large-vocab Zipf stream with a SMALL capacity to
exercise the actual sketch math: presence guarantee, undercount bound,
merge across batches/partitions, and end-to-end equality with the
brute-force top-k while the candidate set is genuinely a strict subset of
the vocabulary.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from dq.heavyhitters import (
    HH_TOP_K,
    MG_CAPACITY,
    count_tokens_batch,
    heavy_hitter_candidates,
    heavy_hitter_topk,
    mg_merge_into,
    tokens_col,
)


def _zipf_counts(vocab: int, head_boost: int = 4000) -> Counter:
    """Deterministic Zipf-ish counts: token i gets max(1, boost // (i+1))."""
    return Counter({f"tok{i:05d}": max(1, head_boost // (i + 1)) for i in range(vocab)})


def _stream(counts: Counter, mix: int = 2654435761) -> list[str]:
    """Deterministic shuffle of the expanded stream (no RNG in tests)."""
    toks = [t for t, n in sorted(counts.items()) for _ in range(n)]
    order = sorted(range(len(toks)), key=lambda i: (i * mix) % 999983)
    return [toks[i] for i in order]


def test_count_tokens_batch_matches_spark_tokenizer(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    spark_counts = Counter(
        {
            r["token"]: r["cnt"]
            for r in docs.select(F.explode_outer(tokens_col()).alias("token"))
            .where("token IS NOT NULL")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
    )
    py_counts = count_tokens_batch(docs.select("text").toPandas()["text"])
    assert py_counts == spark_counts


def test_mg_guarantee_on_planted_zipf():
    counts = _zipf_counts(vocab=5000)
    stream = _stream(counts)
    n, cap = len(stream), 64
    state: dict[str, int] = {}
    # feed in 7 uneven batches so reductions actually interleave
    step = len(stream) // 7 + 1
    for i in range(0, len(stream), step):
        mg_merge_into(state, Counter(stream[i : i + step]), cap)

    assert len(state) <= cap  # bounded memory
    bound = n / (cap + 1)
    heavy = {t for t, c in counts.items() if c > bound}
    assert heavy  # the test actually has heavy tokens
    assert heavy <= set(state)  # presence guarantee
    for t, est in state.items():
        assert est <= counts[t]  # never overcounts
        assert counts[t] - est <= bound  # undercount bound


def test_mg_cap_actually_trips():
    counts = _zipf_counts(vocab=5000)
    state: dict[str, int] = {}
    mg_merge_into(state, counts, 64)
    assert len(state) < 5000  # strictly reduced — the cap did work


@pytest.fixture(scope="module")
def zipf_docs(spark):
    """Planted corpus: 400 docs carrying a 3000-token-vocab Zipf stream."""
    counts = _zipf_counts(vocab=3000, head_boost=2000)
    stream = _stream(counts)
    per_doc = len(stream) // 400 + 1
    rows = [
        (i, " ".join(stream[i * per_doc : (i + 1) * per_doc]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(8)
    df.cache().count()
    return df, counts


def test_topk_equals_bruteforce_under_small_capacity(zipf_docs):
    df, counts = zipf_docs
    cap, k = 256, 15
    n = sum(counts.values())
    # the planted head clears the guarantee threshold
    exact_topk = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert exact_topk[-1][1] > n / (cap + 1)

    got = [
        (r["token"], r["cnt"])
        for r in heavy_hitter_topk(df, k=k, capacity=cap).collect()
    ]
    assert got == exact_topk

    cands = heavy_hitter_candidates(df, capacity=cap)
    n_cands = cands.count()
    assert n_cands < 3000  # strict subset: the sketch really pruned
    # and mg_lb never overcounts the true count
    for r in cands.collect():
        assert r["mg_lb"] <= counts[r["token"]]


def test_topk_verify_stage_plan_shape(spark, zipf_docs):
    """The exact-count stage must broadcast the candidate set (no
    sort-merge join of the token stream) and finish with a
    TakeOrderedAndProject, never a global sort of all counts."""
    df, _ = zipf_docs
    spark.catalog.clearCache()
    plan = (
        heavy_hitter_topk(df, k=10, capacity=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_defaults_sane():
    assert MG_CAPACITY >= 1024 and HH_TOP_K <= MG_CAPACITY
