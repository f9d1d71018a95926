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


def test_render_html_col_matches_python(spark, pages_pdf):
    """The in-plan html synthesizer is byte-identical to the python
    render_html twin, and round-trips through the extraction chain."""
    from pyspark.sql import functions as F

    from dq.extract import extract_text_col
    from dq.synth import render_html, render_html_col

    sample = pages_pdf.head(50)[["url", "text"]]
    df = spark.createDataFrame(sample, "url string, text string")
    got = (
        df.select(
            "url", "text",
            render_html_col(F.col("text"), F.col("url")).alias("html"),
        )
        .withColumn("rt", extract_text_col(F.col("html")))
        .toPandas()
    )
    for _, r in got.iterrows():
        assert bytes(r["html"]) == render_html(r["text"], r["url"])
        assert r["rt"] == r["text"]


def test_flagship_lineage_counts_extraction(spark):
    """The flagship exercises the byte-identical extraction invariant:
    every sf0.001 document round-trips (n_extraction_ok == n_input)."""
    from dq.queries import pipeline_lineage

    lm = pipeline_lineage(spark, "/root/testdata/sf0.001").toPandas()
    assert (lm["n_extraction_ok"] == lm["n_input"]).all()
