"""PII scrub: byte-identical Spark vs Python, rule-by-rule coverage."""

from pyspark.sql import functions as F

from dq.scrub import SCRUB_RULES, scrub_col, scrub_text

CASES = [
    ("mail john.doe@example.com now", "mail <EMAIL> now"),
    ("host 192.168.1.250 down", "host <IP> down"),
    ("CPF 123.456.789-09 ok", "CPF <CPF> ok"),
    ("ssn 123-45-6789 leak", "ssn <SSN> leak"),
    ("call +1 (555) 123-4567 now", "call <PHONE> now"),
    ("call 555-867-5309", "call <PHONE>"),
    ("what a MORON move", "what a <TOX> move"),
    ("oxymoron is fine", "oxymoron is fine"),  # word boundary respected
    ("no pii here", "no pii here"),
    ("", ""),
]


def test_python_rules():
    for raw, want in CASES:
        assert scrub_text(raw) == want, raw


def test_null_passthrough():
    assert scrub_text(None) is None


def test_spark_python_byte_identical(spark, pages):
    out = pages.select("url", "text", scrub_col(F.col("text")).alias("scrubbed")).toPandas()
    oracle = out["text"].map(scrub_text)
    assert (out["scrubbed"] == oracle).all()


def test_spark_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    got = [r.s for r in df.select(scrub_col(F.col("raw")).alias("s")).collect()]
    assert got == [w for _, w in CASES]


def test_planted_pii_all_scrubbed(spark, pages):
    """Synthetic corpus plants PII snippets; none survive the chain."""
    scrubbed = pages.select(scrub_col(F.col("text")).alias("t"))
    leftovers = scrubbed.where(
        F.col("t").rlike("|".join(f"({p})" for _, p, _ in SCRUB_RULES))
    ).count()
    assert leftovers == 0


def test_pii_type_counts_planted_expectations(spark):
    """Every non-NULL text gets a planted email + ipv4 + ssn (scrub_pii's
    construction), so those three rules count every doc; cpf is never
    planted and the corpus carries none."""
    from dq.queries import pii_type_counts

    sf = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").where(
        "text IS NOT NULL"
    ).count()
    got = {r.pii_type: r.n_docs for r in pii_type_counts(spark, sf).collect()}
    assert got["email"] == got["ipv4"] == got["ssn"] == n_docs
    assert got["cpf"] == 0
    assert set(got) == {"email", "ipv4", "cpf", "ssn", "phone", "toxicity"}
