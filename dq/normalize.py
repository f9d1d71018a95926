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
