"""Text analysis expressions: token counts, quality, lang hint, fingerprints."""

import re

from pyspark.sql import functions as F

from dq import textstats


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",), ("",)], "text string")
    out = df.select(
        textstats.whitespace_token_count("text").alias("ws"),
        textstats.bpe_token_count("text").alias("bpe"),
    ).collect()
    assert (out[0].ws, out[1].ws) == (4, 0)
    want = len(re.findall(textstats.BPE_SPLIT_PATTERN, "Hello, world! 42 times"))
    assert out[0].bpe == want == 6  # Hello , world ! 42 times
    assert out[1].bpe == 0


def test_quality_score_ranges(spark):
    good = " ".join(["the quick brown fox does things properly."] * 10)
    bad = "@@@@"
    df = spark.createDataFrame([(good,), (bad,), (None,)], "text string")
    s = [r.q for r in df.select(textstats.quality_score("text").alias("q")).collect()]
    assert s[0] > 0.6
    assert s[1] < 0.4
    assert 0.0 <= s[2] <= 1.0


def test_lang_hint(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat in that house",),
         ("el la que ser haber por con para como pero",)],
        "text string",
    )
    out = [r.l for r in df.select(textstats.lang_hint("text").alias("l")).collect()]
    assert out == ["en", "es"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], "text string"
    )
    fps = [r.f for r in df.select(textstats.fingerprint64("text").alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]
