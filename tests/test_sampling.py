"""Sampling / domain balancing / token packing semantics."""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from dq import sampling


def test_stratified_sample_deterministic_and_rated(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(2000)],
        "doc_id bigint, lang string",
    )
    out = sampling.stratified_sample(docs, rates_bp={"en": 5000}, default_bp=500)
    agg = {
        r.lang: r
        for r in out.groupBy("lang").agg(
            F.sum(F.col("sampled").cast("int")).alias("n_kept"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    # en keeps ~50%, default stratum ~5% (hash buckets, not exact)
    assert 0.4 < agg["en"].n_kept / agg["en"].n < 0.6
    assert agg["xx"].n_kept / agg["xx"].n < 0.12
    # deterministic: a second evaluation yields the identical sample set
    kept1 = {r.doc_id for r in out.where("sampled").collect()}
    kept2 = {r.doc_id for r in out.where("sampled").collect()}
    assert kept1 == kept2 and kept1


def test_domain_cap_two_phase_equals_naive(spark):
    # skewed: domain 'hot' has 200 rows, others 3 each
    rows = [(i, "hot") for i in range(200)]
    rows += [(1000 + 10 * d + j, f"cold{d}") for d in range(5) for j in range(3)]
    base = spark.createDataFrame(rows, "doc_id bigint, domain string")
    k = 7
    two_phase = sampling.domain_cap_sample(base, k=k, buckets=4)
    naive = (
        base.withColumn(
            "domain_rank",
            F.row_number().over(Window.partitionBy("domain").orderBy("doc_id")).cast("int"),
        ).where(F.col("domain_rank") <= k)
    )
    assert sorted(two_phase.collect()) == sorted(naive.collect())
    got = two_phase.groupBy("domain").count().collect()
    assert {r["domain"]: r["count"] for r in got}["hot"] == k


def test_token_packing_matches_pandas_prefix_sum(spark):
    texts = [(i, "w " * ((i * 7) % 13 + 1)) for i in range(150)]
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    budget, bucket = 50, 16
    out = (
        sampling.token_budget_packing(docs, budget=budget, bucket_size=bucket)
        .orderBy("doc_id")
        .toPandas()
    )
    toks = pd.Series([((i * 7) % 13 + 1) for i in range(150)])
    prefix_excl = toks.cumsum().shift(fill_value=0)
    expect = (prefix_excl // budget).astype("int64")
    assert list(out.bin_id) == list(expect)
    assert list(out.n_tokens) == list(toks)


def test_token_packing_bin_ids_contiguous(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(100)], "doc_id bigint, text string"
    )
    bins = sorted(
        r.bin_id
        for r in sampling.token_budget_packing(docs, budget=25, bucket_size=10)
        .select("bin_id").distinct().collect()
    )
    assert bins == list(range(bins[-1] + 1))  # 0..max with no gaps


def test_chunk_docs_windows(spark):
    from dq.sampling import chunk_docs

    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    rows = [(1, text), (2, "short doc"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = chunk_docs(df, size=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0, 48, 96 -> windows 64, 52, 4 tokens
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.n_tokens) for r in c1] == [(0, 64), (1, 52), (2, 4)]
    assert c1[0].chunk_text.split() == [f"w{i}" for i in range(64)]
    assert c1[1].chunk_text.split() == [f"w{i}" for i in range(48, 100)]
    assert c1[2].chunk_text.split() == [f"w{i}" for i in range(96, 100)]
    # short doc: one window with every token
    assert [(r.chunk_idx, r.n_tokens) for r in by_doc[2]] == [(0, 2)]
    # empty / NULL docs emit no chunks
    assert 3 not in by_doc and 4 not in by_doc
    # overlap invariant: consecutive windows share size-stride tokens
    assert c1[0].chunk_text.split()[48:] == c1[1].chunk_text.split()[:16]
