"""dq.editdist — Levenshtein near-dup verify tier.

Tri-engine agreement on the ASCII fold (Spark levenshtein counts
CODEPOINTS, DuckDB counts UTF-8 BYTES — equal only after the fold), the
Spark path pinned to the pure-python twin on a planted corpus, the
length-gap prune / NULL-text drop semantics, and the banded 3-arg
production variant agreeing with the 2-arg oracle form on kept pairs.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from dq.editdist import (
    ASCII_FOLD_RE,
    EDIT_MAX,
    EDIT_PREFIX,
    EDIT_SIM_BP,
    editdist_verify,
    editdist_verify_py,
    folded_prefix_col,
    levenshtein_py,
)


def _fold_py(t: str) -> str:
    return re.sub(ASCII_FOLD_RE, "?", t)[:EDIT_PREFIX]


def test_levenshtein_py_known_values():
    assert levenshtein_py("", "") == 0
    assert levenshtein_py("abc", "abc") == 0
    assert levenshtein_py("kitten", "sitting") == 3
    assert levenshtein_py("flaw", "lawn") == 2
    assert levenshtein_py("", "abc") == 3
    assert levenshtein_py("abc", "") == 3


NONASCII_PAIRS = [
    # the module-docstring trap: 1 in Spark (codepoints), 2 in DuckDB (bytes)
    ("café", "cafe"),
    ("naïve day", "naive day"),
    ("智能 ai", "?? ai"),  # CJK folds to '?' — 3 bytes/char in UTF-8
    ("résumé", "resume"),
]


def test_fold_makes_engines_agree_on_nonascii(spark):
    rows = [(i, a, b) for i, (a, b) in enumerate(NONASCII_PAIRS)]
    df = spark.createDataFrame(rows, "i bigint, a string, b string")
    got_spark = {
        r["i"]: r["lev"]
        for r in df.select(
            "i",
            F.levenshtein(
                folded_prefix_col(F.col("a")), folded_prefix_col(F.col("b"))
            ).alias("lev"),
        ).collect()
    }
    con = duckdb.connect()
    got_duck = {}
    for i, a, b in rows:
        (got_duck[i],) = con.execute(
            f"""SELECT levenshtein(
                  substring(regexp_replace(?, '{ASCII_FOLD_RE}', '?', 'g'), 1, {EDIT_PREFIX}),
                  substring(regexp_replace(?, '{ASCII_FOLD_RE}', '?', 'g'), 1, {EDIT_PREFIX}))""",
            [a, b],
        ).fetchone()
    expect = {i: levenshtein_py(_fold_py(a), _fold_py(b)) for i, a, b in rows}
    assert got_spark == expect
    assert got_duck == expect


def test_unfolded_nonascii_actually_diverges():
    """Sanity that the fold is load-bearing: WITHOUT it DuckDB (bytes)
    disagrees with the codepoint DP on the docstring's probe pair."""
    con = duckdb.connect()
    (duck_raw,) = con.execute("SELECT levenshtein('café', 'cafe')").fetchone()
    assert duck_raw == 2  # bytes: é is 2 UTF-8 bytes
    assert levenshtein_py("café", "cafe") == 1  # codepoints (== Spark)


BASE = "the quick brown fox jumps over the lazy dog " * 3  # 135 chars
LONG = "x" * (EDIT_PREFIX + 50)


@pytest.fixture()
def corpus():
    docs = {
        1: BASE,
        2: BASE,  # exact copy -> lev 0, sim_bp == EDIT_SIM_BP
        3: BASE[:40] + "X" + BASE[41:] + " tail",  # 1 edit + 5-char suffix
        4: "tiny",  # length gap vs BASE >> EDIT_MAX -> pruned pre-DP
        5: None,  # NULL text -> pair dropped in both engines
        6: LONG,
        7: LONG[:-1] + "Y" * 60,  # edits only PAST the prefix -> lev 0
    }
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (6, 7)]
    return pairs, docs


def test_spark_matches_python_twin(spark, corpus):
    pairs, docs = corpus
    pairs_df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    docs_df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    got = [tuple(r) for r in editdist_verify(pairs_df, docs_df).collect()]
    expect = editdist_verify_py(pairs, docs)
    assert got == expect


def test_verdicts_and_prunes(corpus):
    pairs, docs = corpus
    rows = {(r[0], r[1]): r for r in editdist_verify_py(pairs, docs)}
    # exact copy
    assert rows[(1, 2)][4] == 0 and rows[(1, 2)][5] == EDIT_SIM_BP
    assert rows[(1, 2)][6] is True
    # one in-place edit + short suffix: lev = 1 + 5, still a dup
    assert 0 < rows[(1, 3)][4] <= EDIT_MAX and rows[(1, 3)][6] is True
    # length-gap prune and NULL text both DROP the pair (no row at all,
    # never a three-valued verdict — CLAUDE.md output contract)
    assert (1, 4) not in rows and (1, 5) not in rows
    # edits past EDIT_PREFIX are invisible by design (LSH tier's job)
    assert rows[(6, 7)][4] == 0 and rows[(6, 7)][2] == EDIT_PREFIX


def test_banded_threshold_variant_agrees_on_kept_pairs(spark, corpus):
    """The production path (module docstring): 3-arg levenshtein(l, r, k)
    early-outs above k. On every pair the verdict keeps it must equal the
    2-arg oracle form, and return -1 exactly when the 2-arg is above k."""
    pairs, docs = corpus
    pairs_df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    docs_df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    folded = docs_df.select(
        "doc_id", folded_prefix_col(F.col("text")).alias("p")
    )
    j = (
        pairs_df.join(
            folded.select(F.col("doc_id").alias("id_a"), F.col("p").alias("pa")),
            "id_a",
        )
        .join(
            folded.select(F.col("doc_id").alias("id_b"), F.col("p").alias("pb")),
            "id_b",
        )
        .where(F.col("pa").isNotNull() & F.col("pb").isNotNull())
        .select(
            F.levenshtein("pa", "pb").alias("full"),
            F.levenshtein("pa", "pb", EDIT_MAX).alias("banded"),
        )
    )
    for r in j.collect():
        if r["full"] <= EDIT_MAX:
            assert r["banded"] == r["full"]
        else:
            assert r["banded"] == -1


def test_gate_query_planted_families(spark):
    """editdist_pairs at sf0.001: every planted exact pair verifies at
    lev=0/sim=MAX; every planted near pair (suffix within budget or past
    the prefix) verifies is_dup; nothing else appears."""
    from dq.queries import editdist_pairs

    out = editdist_pairs(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r["is_dup"] is True
        assert 0 <= r["lev"] <= EDIT_MAX
        assert r["sim_bp"] <= EDIT_SIM_BP
        if r["id_b"] - r["id_a"] == 1_000_000:  # exact family
            assert r["lev"] == 0 and r["sim_bp"] == EDIT_SIM_BP
