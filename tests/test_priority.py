"""dq.priority — priority sampling: python-twin bit-equality, determinism,
DLT estimator accuracy, small-corpus degeneracy, top-K plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq.priority import (
    PRIORITY_K,
    PRIORITY_SCALE,
    priority_sample,
    priority_sample_py,
)
from dq.sampling import SAMPLE_MOD

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "n_chars"
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def sample_rows(docs):
    return sorted(
        (r.doc_id, r.w, r.u, r.q, r.tau, r.w_hat_scaled)
        for r in priority_sample(docs).collect()
    )


def test_python_twin_bit_equality(docs, sample_rows):
    py = priority_sample_py(
        [(r.doc_id, r.n_chars) for r in docs.collect()]
    )
    assert sample_rows == py


def test_sample_size_and_rerun_determinism(docs, sample_rows):
    assert len(sample_rows) == PRIORITY_K
    again = sorted(
        (r.doc_id, r.w, r.u, r.q, r.tau, r.w_hat_scaled)
        for r in priority_sample(docs).collect()
    )
    assert again == sample_rows  # pure function of the corpus, never rand()


def test_fixed_point_identities(sample_rows):
    for _, w, u, q, tau, wh in sample_rows:
        assert 1 <= u <= SAMPLE_MOD
        assert q == w * PRIORITY_SCALE // u
        assert q >= tau  # sampled rows are exactly those above the threshold
        assert wh == max(w * PRIORITY_SCALE, tau * SAMPLE_MOD)


def test_estimator_total_weight(docs, sample_rows):
    """sum(max(w, tau)) over the sample estimates sum(w) over the WHOLE
    corpus (Duffield-Lund-Thorup unbiasedness); at k=40 the one fixed draw
    must land within the ~1/sqrt(k) band."""
    total = docs.agg(
        F.sum(F.col("n_chars") + F.lit(1)).cast("bigint")
    ).collect()[0][0]
    est = sum(r[5] for r in sample_rows) / PRIORITY_SCALE
    assert abs(est - total) / total < 0.25


def test_small_corpus_every_row_sampled_estimator_exact(docs):
    """Corpus <= k rows: tau = 0, every row sampled, w_hat == w exactly."""
    small = docs.where(F.col("doc_id") < 10)
    rows = priority_sample(small).collect()
    assert len(rows) == 10
    assert all(r.tau == 0 for r in rows)
    assert sum(r.w_hat_scaled for r in rows) == PRIORITY_SCALE * sum(
        r.w for r in rows
    )


def test_plan_is_takeordered_not_global_sort(spark, docs):
    """The top-(k+1) must plan as TakeOrderedAndProject (per-partition
    heap + driver merge) — never a rangepartitioning sort of the corpus."""
    spark.catalog.clearCache()
    plan = (
        priority_sample(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
