"""Unicode NFC normalization: UDF/pandas-twin semantics + DuckDB agreement."""

from __future__ import annotations

import pandas as pd

from dq.normalize import nfc_batch, with_nfc_text

# decomposed → composed, Hangul jamo, singleton (Ohm → Omega), ligature stays
# (explicit escapes — editors silently re-compose pasted literals)
TRICKY = [
    "café",                    # e + combining acute -> é
    "mañana",                  # n + combining tilde -> ñ
    "Ångström",          # ring + diaeresis
    "각",            # jamo -> 각 (GAK)
    "Ω ohm",                    # Ohm sign -> Ω Omega (singleton)
    "ﬁ ligature stays",         # fi-ligature is NOT decomposed by NFC
    "plain ascii unchanged",
]


def test_nfc_batch_matches_duckdb():
    import duckdb

    for s in TRICKY:
        py = nfc_batch(pd.Series([s]))[0]
        dk = duckdb.sql("select nfc_normalize(?)", params=[s]).fetchone()[0]
        assert py == dk, ascii(s)


def test_nfc_batch_semantics():
    import unicodedata

    out = nfc_batch(pd.Series(TRICKY + [None]))
    assert out[0] == "café" and out[1] == "mañana"
    assert out[2] == "Ångström"
    assert out[3] == "각"        # composed syllable GAK
    assert out[4] == "Ω ohm"    # capital Omega
    assert out[5] == TRICKY[5]       # ligature untouched
    assert out[6] == TRICKY[6]
    assert out[7] is None
    assert all(
        v is None or v == unicodedata.normalize("NFC", v) for v in out
    )  # idempotent


def test_with_nfc_text_changed_flags(spark):
    df = spark.createDataFrame(
        [(1, "café"), (2, "plain"), (3, None)], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in with_nfc_text(df).collect()}
    assert got[1].text_nfc == "café" and got[1].changed
    assert got[2].text_nfc == "plain" and not got[2].changed
    assert got[3].text_nfc is None and not got[3].changed  # null-safe flag


def test_fix_mojibake_repairs_classic_corruptions():
    """UTF-8-as-cp1252 single and double mangles repair to the original;
    genuine accented/non-Latin text and ASCII come back untouched; None
    passes through."""
    from dq.normalize import fix_mojibake_one, sloppy_cp1252_decode

    orig = "café — résumé ”quoted”"
    single = sloppy_cp1252_decode(orig.encode("utf-8"))
    double = sloppy_cp1252_decode(single.encode("utf-8"))
    assert fix_mojibake_one(single) == orig
    assert fix_mojibake_one(double) == orig
    for clean in (orig, "plain ascii text", "кириллица остаётся", "中文不变", None, ""):
        assert fix_mojibake_one(clean) == clean


def test_mojibake_query_flags_exactly_planted_docs(spark):
    """The gate query flags the planted doc set exactly — repair recall 1.0
    on mangled rows, false-positive rate 0 on clean corpus text."""
    from dq.queries import MOJI_MOD, MOJI_REM, mojibake_fixed

    sf = "/root/testdata/sf0.001"
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    got = {r.doc_id: r.mojibake_found for r in mojibake_fixed(spark, sf).collect()}
    for doc_id, found in got.items():
        want = doc_id % MOJI_MOD == MOJI_REM and texts[doc_id] is not None
        assert found == want, (doc_id, found, want)
