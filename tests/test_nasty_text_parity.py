"""Spark-vs-DuckDB parity over a corpus of ADVERSARIAL unicode text.

The gate corpora are ASCII-ish synthetic English; the NULL-parity suite
covers missing text. This suite covers the third axis: text that probes
engine dialect edges — non-breaking/ideographic spaces (Java regex \\s vs
RE2 \\s), RTL runs, combining marks vs precomposed, zero-width joiners,
dotless-i casing (locale-sensitive lower()), lone surrogates avoided but
astral-plane emoji included, control characters, single huge tokens, and
leading/trailing whitespace. Every oracled text query must keep
hash-parity when twenty-one such documents are appended to the sf0.001
corpus — a divergence here is a dialect bug the ASCII gate cannot see.
A second batch adds BOM/ZWNBSP, NEL, U+2028/29 separators, soft hyphens,
fi/fl/st ligatures, fullwidth digits, titlecase Dž, and sharp s.

Codepoints are written as explicit escapes so no editor/tooling pass can
silently normalize them.
"""

import duckdb
import pytest

from __spark_entry__ import oracle_sql, queries
from dq.io import TABLES
from tests.test_null_text_parity import TEXT_QUERIES
from tools.compare_oracle import frame_hash, normalize

SF = "/root/testdata/sf0.001"

NASTY_TEXTS = [
    "café résumé naïve accents",
    "العربية rtl mixed text",
    "emoji \U0001F600\U0001F680 astral plane",
    "nbsp\u00a0separated\u00a0words here",
    "ideographic\u3000space\u3000separated",
    "zero\u200bwidth\u200bsplit and joiner\u200dhere",
    "combining á é marks vs precomposed á é",
    "tab\tand\nnewline\rand\x0bvertical mix",
    "中文文本 cjk tokens",
    "türkisch Iı dotless i stays",  # U+0130 İ excluded: see the pinned
    # divergence test below — Spark lowers İ with the full mapping
    # (i + combining dot), DuckDB with the simple mapping (plain i)
    "x" * 500 + " one huge token",
    "  leading and trailing  ",
    "",  # empty text (distinct from NULL — the null suite owns NULL)
    # batch 2: line/format controls and compatibility characters
    "\ufeffbom prefixed text",                    # BOM / ZWNBSP
    "nel\u0085separated line",                    # NEL (in neither Java nor RE2 \s)
    "line\u2028separator and\u2029paragraph",     # U+2028/29 separators
    "soft\u00adhyphen inside word",               # SHY
    "ligature ﬁle and ﬂow",             # fi / fl ligatures
    "fullwidth １２３ digits",                    # U+FF11.. (outside [0-9])
    "ﬆation ǅungla titlecase",                    # st ligature + Dž titlecase
    "ß sharp s stays lower",
]


@pytest.fixture(scope="module")
def nasty_sf(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nastytext"))
    base = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [
        (10_000_000 + i, t, "und", "srcN", len(t))
        for i, t in enumerate(NASTY_TEXTS)
    ]
    extra = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    base.unionByName(extra).coalesce(1).write.parquet(f"{out}/documents.parquet")
    for t in TABLES:
        if t != "documents":
            spark.read.parquet(f"{SF}/{t}.parquet").write.parquet(f"{out}/{t}.parquet")
    return out


@pytest.fixture(scope="module")
def nasty_con(nasty_sf):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{nasty_sf}/{t}.parquet/*.parquet'"
        )
    return c


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_nasty_text_query_vs_oracle(spark, nasty_sf, nasty_con, name):
    sdf = queries()[name](spark, nasty_sf).toPandas()
    odf = nasty_con.execute(oracle_sql()[name]).df()
    s, o = normalize(sdf), normalize(odf)
    assert len(s) == len(o)
    assert sorted(s.columns) == sorted(o.columns)
    assert frame_hash(s) == frame_hash(o)


def test_pinned_divergence_turkish_capital_dotted_i(spark, nasty_con):
    """DOCUMENTED engine-dialect boundary, pinned so a silent change in
    either engine surfaces: Spark lowercases U+0130 (İ) with the Unicode
    FULL case mapping ('i' + U+0307 combining dot), DuckDB with the SIMPLE
    mapping (plain 'i'). Text containing İ therefore cannot be oracled
    through lower() — the corpus contract (and the reference's pipelines)
    is casefold-insensitive to this codepoint. If this test fails, the
    engines converged and the corpus exclusion above can be lifted."""
    from pyspark.sql import functions as F

    s = (
        spark.createDataFrame([("İ",)], "t string")
        .select(F.lower("t").alias("l"))
        .collect()[0]
        .l
    )
    d = nasty_con.execute("SELECT lower('İ')").fetchone()[0]
    assert s == "i̇"
    assert d == "i"
    assert s != d
