"""dq.train — batch-perceptron distillation: python-twin bit-equality,
separable-label convergence, teacher agreement, determinism, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq.train import (
    BIAS_FID,
    TRAIN_ROUNDS,
    TRAIN_VOCAB_K,
    doc_labels,
    doc_features,
    perceptron_train,
    perceptron_train_py,
    train_vocab,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def trained(docs):
    w, p = perceptron_train(docs)
    return (
        {r.feature_id: (r.token, r.weight) for r in w.collect()},
        {r.doc_id: (r.y, r.score, r.pred) for r in p.collect()},
    )


def test_python_twin_bit_equality(docs, trained):
    """Spark path == pure-python reference, weights AND per-doc scores."""
    wr, pr = trained
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    keep = {r.doc_id: r.y == 1 for r in doc_labels(docs).collect()}
    wpy, ppy = perceptron_train_py(rows, keep)
    assert {f: w for f, (_, w) in wr.items()} == wpy
    assert {d: (s, p) for d, (_, s, p) in pr.items()} == {
        d: sp for d, sp in ppy.items()
    }


def test_student_agrees_with_teacher(trained):
    """The distilled linear model reproduces the heuristic gate on its own
    training corpus (the DCLM premise: heuristic labels are linearly
    learnable from bag-of-words). The synthetic corpus is in fact
    separable; require near-perfect agreement, not a loose bound."""
    _, pr = trained
    agree = sum(1 for y, _, p in pr.values() if y == p)
    assert agree / len(pr) >= 0.98


def test_vocab_rank_deterministic(docs):
    v = {r.fid: (r.tok, r.n) for r in train_vocab(docs).collect()}
    assert len(v) <= TRAIN_VOCAB_K
    assert BIAS_FID not in v  # fids are 1-based; 0 is reserved for bias
    ranked = sorted(v.items(), key=lambda kv: kv[0])
    # rank order is (count DESC, token ASC) with no gaps
    assert [fid for fid, _ in ranked] == list(range(1, len(v) + 1))
    pairs = [(n, t) for _, (t, n) in ranked]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_bias_row_for_tokenless_docs(spark):
    empty = spark.createDataFrame(
        [(1, "the of and to in that it was for on " * 6), (2, None), (3, "")],
        "doc_id long, text string",
    )
    vocab = train_vocab(empty)
    x = doc_features(empty, vocab)
    bias = {r.doc_id for r in x.where(F.col("fid") == BIAS_FID).collect()}
    assert bias == {1, 2, 3}
    # NULL/empty text docs carry ONLY the bias feature
    assert x.where((F.col("doc_id") != 1) & (F.col("fid") != BIAS_FID)).count() == 0


def test_separable_labels_converge(spark):
    """Single discriminative token, custom label override: the batch
    perceptron must separate perfectly within the default rounds."""
    rows = []
    for i in range(40):
        good = i % 2 == 0
        filler = f"alpha beta gamma delta tok{i % 5}"
        rows.append((i, f"{filler} {'goodword' if good else 'badword'}", 1 if good else -1))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, y long"
    )
    _, preds = perceptron_train(docs, labels=labels, rounds=5)
    got = {r.doc_id: r.pred for r in preds.collect()}
    assert got == {i: y for i, _, y in rows}


def test_training_is_deterministic(docs, trained):
    wr, _ = trained
    w2, _ = perceptron_train(docs)
    assert {r.feature_id: (r.token, r.weight) for r in w2.collect()} == wr


def test_weight_count_and_bias_label(trained):
    wr, _ = trained
    assert BIAS_FID in wr and wr[BIAS_FID][0] == ""
    assert len(wr) <= TRAIN_VOCAB_K + 1
    assert TRAIN_ROUNDS >= 1  # constants sanity (oracle unrolls this many)


def test_plan_shape(docs):
    """Weight joins broadcast (never a sort-merge on fid) and the text
    column stays out of every Exchange: only (doc_id, fid, c) rows and the
    K+1-row weight table move between stages."""
    _, preds = perceptron_train(docs)
    plan = preds._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re

    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in ex
