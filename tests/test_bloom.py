"""Bloom ledger prefilter: no false negatives, sane words, bounded FPs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq import bloom
from dq.dedup import fingerprint_col


@pytest.fixture(scope="module")
def fps(spark):
    texts = [(i, f"document number {i} with some body text") for i in range(200)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    return df.select("doc_id", fingerprint_col(F.col("text")).alias("fp")).cache()


def test_members_always_hit(fps):
    words = bloom.bloom_words(fps.select("fp").distinct())
    got = bloom.bloom_probe(fps, words).collect()
    assert len(got) == 200
    assert all(r["bloom_maybe"] for r in got)  # a Bloom filter never misses


def test_nonmembers_mostly_rejected(fps, spark):
    words = bloom.bloom_words(fps.select("fp").distinct())
    fresh = spark.createDataFrame(
        [(i, f"unrelated probe text {i}") for i in range(1000, 1200)],
        "doc_id long, text string",
    ).select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
    got = bloom.bloom_probe(fresh, words).collect()
    fp_rate = sum(r["bloom_maybe"] for r in got) / len(got)
    # 200 keys * 4 bits in 2^18 bits -> theoretical FP rate ~ (1-e^-kn/m)^k
    # ~= 1e-10; 5% leaves two orders of headroom over any hash quirk
    assert fp_rate <= 0.05, fp_rate


def test_words_are_32bit_nonzero(fps):
    rows = bloom.bloom_words(fps.select("fp").distinct()).collect()
    assert rows, "filter must have set words"
    for r in rows:
        assert 0 < r["bits"] < (1 << bloom.WORD_BITS)
        assert 0 <= r["word_idx"] < bloom.BLOOM_M_BITS // bloom.WORD_BITS


def test_query_contract_no_false_negatives(spark):
    from dq.queries import bloom_ledger_probe

    got = bloom_ledger_probe(spark, "/root/testdata/sf0.001").collect()
    assert got
    misses = [r for r in got if r["in_ledger"] and not r["bloom_maybe"]]
    assert misses == []
    # the planted re-crawls guarantee at least one true ledger hit
    assert any(r["in_ledger"] for r in got)


def test_probe_broadcasts_words(spark):
    """The word table rides a broadcast — the probe side never sort-merges
    against the filter."""
    from dq.queries import bloom_ledger_probe

    import contextlib
    import io

    df = bloom_ledger_probe(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    assert "BroadcastExchange" in buf.getvalue(), buf.getvalue()


def test_sharded_probe_matches_broadcast_probe(spark, fps):
    """bloom_probe_sharded is verdict-IDENTICAL to bloom_probe (same bit
    math, different join strategy) — the escape hatch for word tables past
    the broadcast ceiling must change the plan, never the answer."""
    words = bloom.bloom_words(fps.select("fp").distinct())
    from dq.dedup import fingerprint_col
    from pyspark.sql import functions as F

    fresh = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("probe text "), F.col("id").cast("string")).alias("text"),
    ).select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
    base = {r.doc_id: r.bloom_maybe for r in bloom.bloom_probe(fresh, words).collect()}
    for n_shards in (1, 7, 32):
        sharded = {
            r.doc_id: r.bloom_maybe
            for r in bloom.bloom_probe_sharded(fresh, words, n_shards=n_shards).collect()
        }
        assert sharded == base, n_shards


def test_sharded_probe_plan_has_no_broadcast_of_words(spark, fps):
    """The sharded probe must NOT broadcast the word table (that ceiling is
    the reason it exists) and must not sort either side: shuffle_hash join
    on (shard, word_idx)."""
    import contextlib
    import io

    from dq.dedup import fingerprint_col
    from pyspark.sql import functions as F

    words = bloom.bloom_words(fps.select("fp").distinct())
    fresh = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("p "), F.col("id").cast("string")).alias("text"),
    ).select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bloom.bloom_probe_sharded(fresh, words).explain(mode="formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
