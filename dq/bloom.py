"""Engine-portable Bloom filter over the cross-run dedup fingerprint ledger.

The incremental dedup tier (dq/dedup.py incremental_non_survivor_units)
joins every new batch against the full ledger of content fingerprints —
exact, but the join shuffles (or broadcasts) the whole ledger every run.
This module adds the standard large-corpus prefilter: a Bloom filter built
once over the ledger's fingerprints, broadcast to the probe side, so the
exact ledger join only runs on bloom-POSITIVE rows. False positives cost
one verify-join row; false negatives are impossible, so correctness never
depends on the filter (pytest-pinned: zero missed ledger hits).

Engine portability (the correctness gate runs the same math in DuckDB):
bit positions derive from fixed substrings of the sha256 hex fingerprint,
parsed as integers —

    Spark:   conv(substr(fp, 1+8*i, 8), 16, 10)            -> bigint
    DuckDB:  ('0x' || substr(fp, 1+8*i, 8))::BIGINT

Both yield the same positive 32-bit value (verified), so filter words and
probe verdicts are bit-identical across engines. No xxhash64 here — that
would be Spark-only and demote the query to rows-only checking.

Scale shape (100 TB notes): the filter is (word_idx, bits) rows — at
~10 bits/key a day's 2.5e9-unit ledger is a ~3 GB word table, broadcast
once per executor (vs shuffling a multi-TB text corpus against the ledger);
per-doc probe work is k substring parses + k ANDs, all codegen. When even
the words outgrow broadcast, the same construction shards by
``word_idx % n_shards`` into per-shard filters probed by an equi-join on
the shard id — the probe stays narrow either way.

Reference parity note: the reference re-reads its duplicate-history table
per run (ColetaDuplicidade.scala full-table scans); the Bloom tier is an
engine addition for corpus-scale runs, layered UNDER the same exact-join
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- shared constants (dq.oracles generates SQL from these) ----------------

BLOOM_K = 4            # hash functions = disjoint 8-hex-char slices of sha256
BLOOM_M_BITS = 1 << 18  # 256 Kbit at gate scale (~8k 32-bit words); prod
                        # sizing is ~10 bits/ledger key (see module notes)
WORD_BITS = 32          # bits per bigint word — top 32 bits stay zero, so
                        # no sign games on either engine


def bloom_positions(fp_hex: Column, k: int = BLOOM_K, m: int = BLOOM_M_BITS) -> Column:
    """Array of ``k`` bit positions in [0, m) for one sha256 hex fingerprint.

    Position i parses hex chars [8i+1, 8i+8] — disjoint 32-bit slices of
    the digest, i.e. k independent uniform hashes for free.
    """
    return F.array(
        *[
            (F.conv(F.substring(fp_hex, 1 + 8 * i, 8), 16, 10).cast("bigint") % m)
            for i in range(k)
        ]
    )


def bloom_words(
    fps: DataFrame, fp_col: str = "fp", k: int = BLOOM_K, m: int = BLOOM_M_BITS
) -> DataFrame:
    """(word_idx, bits): the filter as a table of non-zero 32-bit words.

    explode k positions -> map-side-combinable bit_or per word. Only words
    with at least one set bit exist — a missing word on the probe side
    means "bit not set".
    """
    pos = (
        fps.select(F.explode(bloom_positions(F.col(fp_col), k, m)).alias("_pos"))
        .select(
            (F.col("_pos") / WORD_BITS).cast("bigint").alias("word_idx"),
            # pyspark's shiftleft only takes a literal shift amount — go
            # through SQL for the variable-amount form
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {WORD_BITS} AS INT))"
            ).alias("_mask"),
        )
    )
    return pos.groupBy("word_idx").agg(F.bit_or("_mask").alias("bits"))


def bloom_probe(
    df: DataFrame,
    words: DataFrame,
    fp_col: str = "fp",
    key_col: str = "doc_id",
    k: int = BLOOM_K,
    m: int = BLOOM_M_BITS,
) -> DataFrame:
    """(key_col, bloom_maybe): AND of the k bit tests per probe row.

    Explodes to k rows per key, broadcast-joins the word table, and
    re-aggregates with bool_and — shuffle is k narrow rows per key, the
    word table never shuffles.
    """
    probes = df.select(
        F.col(key_col), F.explode(bloom_positions(F.col(fp_col), k, m)).alias("_pos")
    ).select(
        key_col,
        (F.col("_pos") / WORD_BITS).cast("bigint").alias("word_idx"),
        (F.col("_pos") % WORD_BITS).cast("int").alias("_bit"),
    )
    hit = F.col("bits").isNotNull() & (
        F.expr("shiftright(bits, _bit)").bitwiseAND(F.lit(1)) == 1
    )
    return (
        probes.join(F.broadcast(words), "word_idx", "left")
        .select(key_col, hit.alias("_hit"))
        .groupBy(key_col)
        .agg(F.bool_and("_hit").alias("bloom_maybe"))
    )


def bloom_probe_sharded(
    df: DataFrame,
    words: DataFrame,
    fp_col: str = "fp",
    key_col: str = "doc_id",
    k: int = BLOOM_K,
    m: int = BLOOM_M_BITS,
    n_shards: int = 32,
) -> DataFrame:
    """Verdict-identical to :func:`bloom_probe` WITHOUT broadcasting the
    word table — the documented escape hatch for when even the bit words
    outgrow the broadcast ceiling (SCALING.md §4: a 2.5e9-key day ledger is
    ~3 GB of words; a multi-day or lower-FP filter isn't broadcastable).

    Both sides derive ``shard = word_idx % n_shards`` and the lookup is a
    shuffle_hash equi-join on (shard, word_idx): each reducer builds a hash
    map over only its shard's words (~|words|/n_shards), so memory per task
    is bounded by the shard count knob, never the filter size; the probe
    side stays k narrow rows per key either way. No sort of either side
    (shuffle_hash, not sort-merge — the words side is the small build
    side). Parity with the broadcast probe is pytest-pinned."""
    shard = (F.col("word_idx") % n_shards).cast("int").alias("shard")
    probes = df.select(
        F.col(key_col), F.explode(bloom_positions(F.col(fp_col), k, m)).alias("_pos")
    ).select(
        key_col,
        (F.col("_pos") / WORD_BITS).cast("bigint").alias("word_idx"),
        (F.col("_pos") % WORD_BITS).cast("int").alias("_bit"),
    ).select(key_col, shard, "word_idx", "_bit")
    w = words.select(shard, "word_idx", "bits")
    hit = F.col("bits").isNotNull() & (
        F.expr("shiftright(bits, _bit)").bitwiseAND(F.lit(1)) == 1
    )
    return (
        probes.join(w.hint("shuffle_hash"), ["shard", "word_idx"], "left")
        .select(key_col, hit.alias("_hit"))
        .groupBy(key_col)
        .agg(F.bool_and("_hit").alias("bloom_maybe"))
    )
