"""dq.normalize homoglyph tier — tri-engine fold agreement + obfuscated-dup
detection on planted confusable spam (the gate corpus is pure ASCII, so the
fold path is only exercised here)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dq.normalize import (
    HOMOGLYPH_FROM,
    HOMOGLYPH_PAIRS,
    HOMOGLYPH_TO,
    fold_homoglyphs_col,
    fold_homoglyphs_py,
)

# Latin original and its Cyrillic/Greek-obfuscated twin (every letter of
# "copyright" swapped where a confusable exists).
LATIN = "Free copyright Check here"
SPAM = "Free соpуright Сheck here"  # с, о, у Cyrillic; С Cyrillic


def test_pairs_well_formed():
    assert len(HOMOGLYPH_FROM) == len(HOMOGLYPH_TO) == len(HOMOGLYPH_PAIRS)
    assert len(set(HOMOGLYPH_FROM)) == len(HOMOGLYPH_FROM)  # no dup sources
    for src, dst in HOMOGLYPH_PAIRS:
        assert len(src) == len(dst) == 1
        assert ord(src) > 127 and ord(dst) < 128  # non-ASCII -> ASCII only


def test_python_fold_normalizes_spam():
    assert fold_homoglyphs_py(SPAM) == LATIN
    assert fold_homoglyphs_py(LATIN) == LATIN  # idempotent on clean text


def test_three_engines_agree_on_fold(spark):
    rows = [(0, SPAM), (1, LATIN), (2, "смесь mixed текст"), (3, "")]
    df = spark.createDataFrame(rows, "i bigint, t string")
    got_spark = {
        r["i"]: r["f"]
        for r in df.select("i", fold_homoglyphs_col("t").alias("f")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in rows) + ") v(i, t)")
    got_duck = dict(
        con.execute(
            f"SELECT i, translate(t, '{HOMOGLYPH_FROM}', '{HOMOGLYPH_TO}') FROM t"
        ).fetchall()
    )
    expect = {i: fold_homoglyphs_py(t) for i, t in rows}
    assert got_spark == expect
    assert got_duck == expect


@pytest.fixture()
def planted_docs(spark):
    rows = [
        (1, LATIN),          # original
        (2, SPAM),           # obfuscated copy of 1 — raw differs, fold equal
        (3, "unique text"),  # unrelated
        (4, "same twice"),   # exact dup pair: fold group 2 but ONE raw fp
        (5, "same twice"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_homoglyph_metrics_flags_only_obfuscated(spark, planted_docs, tmp_path):
    from dq.queries import homoglyph_metrics

    sf = str(tmp_path / "sf")
    planted_docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in homoglyph_metrics(spark, sf).collect()}

    assert out[1]["obfus_dup"] == 1 and out[2]["obfus_dup"] == 1
    assert out[1]["n_fold_group"] == 2 == out[2]["n_fold_group"]
    assert out[1]["n_confusable"] == 0  # clean original
    assert out[2]["n_confusable"] == 4  # с о у С
    # exact dups share the fold group but are NOT obfuscation
    assert out[4]["obfus_dup"] == 0 == out[5]["obfus_dup"]
    assert out[4]["n_fold_group"] == 2
    assert out[3]["obfus_dup"] == 0 and out[3]["n_fold_group"] == 1


def test_homoglyph_metrics_narrow_exchange(spark, planted_docs, tmp_path):
    """text must not cross the group-stats exchange — only doc_id,
    counters and the two 64-hex fingerprints."""
    from dq.queries import homoglyph_metrics

    sf = str(tmp_path / "sf")
    planted_docs.write.parquet(f"{sf}/documents.parquet")
    spark.catalog.clearCache()
    plan = (
        homoglyph_metrics(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
