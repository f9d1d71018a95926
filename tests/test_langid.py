"""Language ID: UDF ≡ batch oracle; accuracy on language-signal corpus."""

import pandas as pd
from pyspark.sql import functions as F

from dq.langid import detect_lang_batch, detect_one, langid_udf


def test_udf_matches_oracle(spark, pages):
    got = (
        pages.select("url", "text", langid_udf(F.col("text")).alias("lid"))
        .select("url", "text", "lid.lang_pred", "lid.lang_margin")
        .toPandas()
    )
    want = detect_lang_batch(got["text"])
    assert (got["lang_pred"] == want["lang_pred"]).all()
    assert (got["lang_margin"] == want["lang_margin"]).all()


def test_accuracy_on_long_docs(pages_pdf):
    """Docs with enough signal (>=30 words) should classify correctly."""
    pdf = pages_pdf[pages_pdf["text"].str.split().str.len() >= 30]
    pred = detect_lang_batch(pdf["text"])["lang_pred"]
    acc = (pred.values == pdf["lang"].values).mean()
    assert acc >= 0.95


def test_empty_is_und():
    assert detect_one("") == ("und", 0.0)
    assert detect_one(None) == ("und", 0.0)


def test_deterministic():
    s = pd.Series(["the quick brown fox jumps over the lazy dog"] * 3)
    out = detect_lang_batch(s)
    assert out["lang_pred"].nunique() == 1 == out["lang_margin"].nunique()
