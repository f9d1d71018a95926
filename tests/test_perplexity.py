"""Perplexity: UDF ≡ batch oracle; in-domain text scores lower."""

import math

from pyspark.sql import functions as F

from dq.perplexity import perplexity_batch, perplexity_one, perplexity_udf
from dq.synth import WORDS


def test_udf_matches_oracle(spark, pages):
    got = pages.select("url", "text", perplexity_udf(F.col("text")).alias("ppl")).toPandas()
    want = perplexity_batch(got["text"])
    assert (got["ppl"] == want).all()


def test_in_domain_lower_than_off_domain():
    en = " ".join(WORDS["en"][:60])
    de = " ".join(WORDS["de"][:60])
    assert perplexity_one(en) < perplexity_one(de)


def test_empty_inf():
    assert math.isinf(perplexity_one(""))
    assert math.isinf(perplexity_one(None))
