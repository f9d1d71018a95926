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


def test_markup_density_matches_python_render(spark):
    """Length-exact cross-check of the Catalyst render against the
    CPython renderer: for sampled docs, html_chars equals
    len(render_html(text, url)) in characters and the tag count equals
    the '<' count — the same bytes the flagship round-trips."""
    from dq.queries import markup_density
    from dq.synth import render_html
    from dq.urlstats import url_expr
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text", url_expr(F.col("doc_id")).alias("url"))
        .orderBy("doc_id")
        .limit(25)
    )
    got = {
        r["doc_id"]: r
        for r in markup_density(spark, sf).orderBy("doc_id").limit(25).collect()
    }
    for row in docs.collect():
        html = render_html(row["text"] or "", row["url"]).decode("utf-8")
        g = got[row["doc_id"]]
        assert g["html_chars"] == len(html)
        assert g["n_tags"] == html.count("<")
        assert g["text_chars"] == len(row["text"] or "")
        assert (
            g["markup_bp"]
            == (g["html_chars"] - g["text_chars"]) * 10000 // g["html_chars"]
        )
