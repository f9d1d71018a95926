"""HTML→text extraction: byte-identical per url (BASELINE.json invariant)."""

from pyspark.sql import functions as F

from dq.extract import extract_text, extract_text_col
from dq.synth import render_html


def test_python_roundtrip(pages_pdf):
    for text, html in zip(pages_pdf["text"], pages_pdf["html"]):
        assert extract_text(html) == text


def test_spark_matches_python_byte_identical(spark, pages):
    out = pages.select(
        "url", "text", extract_text_col(F.col("html")).alias("extracted")
    ).toPandas()
    assert (out["extracted"] == out["text"]).all()


def test_entities_unescaped():
    html = render_html('a < b & c > "d"', "t")
    assert extract_text(html) == 'a < b & c > "d"'


def test_scripts_styles_comments_stripped():
    html = b"<html><head><script>x<1</script><style>p{}</style></head><body><p>hi</p><!-- no --></body></html>"
    assert extract_text(html) == "hi"
