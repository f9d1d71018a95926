"""Unicode NFC text normalization (Arrow-vectorized pandas UDF).

Web crawls mix composed and decomposed codepoint sequences for the same
visible text (HTML editors emit NFC, some CMSes NFD) — exact/fuzzy dedup
and tokenizers must see ONE canonical form, so corpus pipelines normalize
to NFC early (Dolma and CCNet both do). Spark has no built-in NFC
expression; this is one of the few operators where the pandas-UDF path is
the right call — and it is still DuckDB-oracle-able, because utf8proc
(DuckDB's ``nfc_normalize``) and CPython's ``unicodedata`` implement the
same frozen UAX#15 composition tables (pytest pins agreement on combining
marks, Hangul jamo and singleton compositions; ligatures stay, as NFC
requires).

The batch function IS the UDF body and the test oracle (CLAUDE.md rule).

Scale shape (100 TB notes): one Arrow crossing per batch, no shuffle; at
production scale fuse with the langid+perplexity crossing
(dq.pipeline.nlp_udf) so text serializes once for all Python stages.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nfc_batch(texts: pd.Series) -> pd.Series:
    """NFC-normalize a batch; None passes through."""
    return texts.map(
        lambda s: unicodedata.normalize("NFC", s) if s is not None else None
    )


# type OBJECT, not a DDL string — string parsing needs an active session,
# which the re-importing Python worker doesn't have
@F.pandas_udf(T.StringType())
def nfc_udf(texts: pd.Series) -> pd.Series:
    return nfc_batch(texts)


def with_nfc_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_nfc`` and ``changed`` (false for NULL text)."""
    return df.withColumn("text_nfc", nfc_udf(F.col(text_col))).withColumn(
        "changed",
        F.coalesce(F.col("text_nfc") != F.col(text_col), F.lit(False)),
    )


# ---- mojibake repair (ftfy-lite) --------------------------------------------
#
# The classic crawl corruption: UTF-8 bytes decoded as cp1252/Latin-1 and
# re-encoded ("café" -> "cafÃ©", "—" -> "â€”"). Repair = invert the wrong
# decode: re-encode the text as cp1252 and, if the bytes are valid UTF-8
# that actually changes the string, decode them as UTF-8; repeat for
# doubly-mangled text. The round-trip test makes false repairs on genuine
# text essentially impossible: normal language never consists purely of
# cp1252-encodable chars that also happen to form valid multi-byte UTF-8.

MOJIBAKE_MAX_ROUNDS = 2  # one round per wrong decode layer seen in the wild

# the five bytes cp1252 leaves unmapped; lenient real-world decoders (and
# ftfy's sloppy-windows-1252) pass them through as their latin-1 C1 controls
_CP1252_UNMAPPED = frozenset({0x81, 0x8D, 0x8F, 0x90, 0x9D})


def sloppy_cp1252_decode(raw: bytes) -> str:
    """cp1252 with latin-1 passthrough for the unmapped bytes — how the
    mis-decodes that CREATE mojibake actually behave (strict cp1252 would
    throw on e.g. the third UTF-8 byte of a doubly-mangled em-dash)."""
    return "".join(
        chr(b) if b in _CP1252_UNMAPPED else bytes([b]).decode("cp1252")
        for b in raw
    )


def _sloppy_cp1252_encode(text: str) -> bytes | None:
    """Inverse of :func:`sloppy_cp1252_decode`; None when any char has no
    byte (genuinely non-Western text — not a cp1252 mis-decode)."""
    try:
        return text.encode("cp1252")  # fast path: fully mapped
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for c in text:
        try:
            out += c.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(c)
            if o in _CP1252_UNMAPPED:  # C1 control from a latin-1 passthrough
                out.append(o)
            else:
                return None
    return bytes(out)


def fix_mojibake_one(text: str | None) -> str | None:
    """Pure repair twin (the UDF body and the test oracle). Returns the
    input unchanged when no safe repair applies — never throws. The
    round-trip guard (bytes must be VALID UTF-8 that decodes to something
    new) makes false repairs on genuine text essentially impossible."""
    if text is None:
        return None
    out = text
    for _ in range(MOJIBAKE_MAX_ROUNDS):
        raw = _sloppy_cp1252_encode(out)
        if raw is None:
            break
        try:
            decoded = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if decoded == out:  # pure ASCII or no layer left
            break
        out = decoded
    return out


def mojibake_batch(texts: pd.Series) -> pd.Series:
    return texts.map(fix_mojibake_one, na_action="ignore")


@F.pandas_udf(T.StringType())
def mojibake_udf(texts: pd.Series) -> pd.Series:
    return mojibake_batch(texts)


def with_fixed_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_fixed`` and ``mojibake_found`` (false for NULL text)."""
    return df.withColumn("text_fixed", mojibake_udf(F.col(text_col))).withColumn(
        "mojibake_found",
        F.coalesce(F.col("text_fixed") != F.col(text_col), F.lit(False)),
    )


# ---- homoglyph / confusable folding (spam-obfuscation dedup signal) --------
#
# Spammers dodge exact dedup and keyword filters by swapping Latin letters
# for visually identical Cyrillic/Greek codepoints (Unicode TR39
# "confusables"). Folding the common confusables back to Latin BEFORE
# fingerprinting makes the obfuscated copies collide again: a fold-group
# holding >1 distinct RAW fingerprint is exactly an obfuscation family.
# The mapping lives as PAIRS so the from/to strings can never misalign;
# both engines' translate() (and Python str.translate in the pytest twin)
# apply the same codepoint-for-codepoint substitution.
HOMOGLYPH_PAIRS: list[tuple[str, str]] = [
    # Cyrillic lowercase -> Latin
    ("а", "a"), ("е", "e"), ("о", "o"), ("р", "p"),
    ("с", "c"), ("у", "y"), ("х", "x"), ("і", "i"),
    ("ѕ", "s"), ("ј", "j"), ("ԁ", "d"), ("к", "k"),
    # Cyrillic uppercase -> Latin
    ("А", "A"), ("В", "B"), ("Е", "E"), ("К", "K"),
    ("М", "M"), ("Н", "H"), ("О", "O"), ("Р", "P"),
    ("С", "C"), ("Т", "T"), ("У", "Y"), ("Х", "X"),
    # Greek lowercase -> Latin
    ("ο", "o"), ("ν", "v"), ("ρ", "p"), ("υ", "u"),
    ("ι", "i"), ("κ", "k"),
    # Greek uppercase -> Latin
    ("Α", "A"), ("Β", "B"), ("Ε", "E"), ("Ζ", "Z"),
    ("Η", "H"), ("Ι", "I"), ("Κ", "K"), ("Μ", "M"),
    ("Ν", "N"), ("Ο", "O"), ("Ρ", "P"), ("Τ", "T"),
    ("Υ", "Y"), ("Χ", "X"),
]
HOMOGLYPH_FROM = "".join(f for f, _ in HOMOGLYPH_PAIRS)
HOMOGLYPH_TO = "".join(t for _, t in HOMOGLYPH_PAIRS)
_HOMOGLYPH_TABLE = str.maketrans(HOMOGLYPH_FROM, HOMOGLYPH_TO)


def fold_homoglyphs_col(col) -> F.Column:
    """Confusables folded to Latin — a plain codegen translate()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, HOMOGLYPH_FROM, HOMOGLYPH_TO)


def fold_homoglyphs_py(text: str) -> str:
    """Python twin of :func:`fold_homoglyphs_col` (tests)."""
    return text.translate(_HOMOGLYPH_TABLE)


def confusable_count_col(col) -> F.Column:
    """Chars in the confusable set — length delta after deleting them
    (translate with an empty replacement deletes, in both engines)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return (F.length(c) - F.length(F.translate(c, HOMOGLYPH_FROM, ""))).cast(
        "bigint"
    )
