"""HTML -> text extraction with a byte-identical-per-url invariant.

Two implementations sharing ONE pattern list (SURVEY.md §7.3 item 1: the
Spark engine uses Java regex, the pandas oracle uses Python ``re`` — both
dialects support the shared subset used here, so outputs are byte-identical):

- :func:`extract_text_col` — native Catalyst ``regexp_replace`` chain
  (JVM-side, whole-stage-codegen; the hot path at 10^12 docs).
- :func:`extract_text` — pure-Python twin used as the test oracle and by
  the synthesizer round-trip test.

A production engine would swap in a trafilatura-style extractor as a pandas
UDF (the library is not in this container); the chain below is the
deterministic stand-in with identical plumbing.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered (pattern, replacement) pairs — shared by both dialects.
# (?s) = DOTALL in both Java and Python regex.
_STRIP_PATTERNS: list[tuple[str, str]] = [
    (r"(?s)<script.*?</script>", ""),
    (r"(?s)<style.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"(?s)^.*?<body>", ""),
    (r"(?s)</body>.*$", ""),
    (r"</p>", "\n"),
    (r"<[^>]*>", ""),
]
# HTML entity unescapes, &amp; last so it can't re-expand others.
_UNESCAPES: list[tuple[str, str]] = [
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#x27;", "'"),
    (r"&amp;", "&"),
]
_TRAILING_NL = (r"\n$", "")

ALL_STEPS = _STRIP_PATTERNS + _UNESCAPES + [_TRAILING_NL]


def extract_text_col(html_col: Column) -> Column:
    """Catalyst expression: binary html -> extracted text (JVM regex chain)."""
    out = F.decode(html_col, "UTF-8")
    for pat, rep in ALL_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


_COMPILED = [(re.compile(p), r) for p, r in ALL_STEPS]


def extract_text(html: bytes | str) -> str:
    """Pure-Python oracle twin of :func:`extract_text_col`."""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    for pat, rep in _COMPILED:
        s = pat.sub(rep, s)
    return s


# ------------------------------------------------- soft-404 / error pages --
# Crawl hygiene: pages an HTTP-200 response delivered that are actually
# error/placeholder content ("soft 404s" — Bar-Yossef et al., WWW'04).
# Common-Crawl-scale pipelines drop these by TITLE phrase rules plus a
# thin-content gate before any quality model runs. Shared constants; the
# DuckDB twin is generated from these (dq/oracles.py) — patterns stay in
# the Java ∩ Python-re ∩ RE2 dialect subset (no lookbehind).

SOFT404_TITLE_PHRASES: tuple[str, ...] = (
    "404 not found",
    "page not found",
    "error 404",
    "access denied",
    "under construction",
    "domain for sale",
)
# one alternation, applied to the LOWERCASED title
SOFT404_TITLE_RE = "(" + "|".join(SOFT404_TITLE_PHRASES) + ")"
# title extractor over the raw html string ((?s): titles never span tags
# here, but NULL-safe group-1 extract needs the match to exist)
TITLE_RE = r"(?s)<title>(.*?)</title>"
SOFT404_MIN_WORDS = 10  # thin-content gate (error pages carry ~no body)


def title_col(html_col: Column) -> Column:
    """<title> contents from binary html (empty string when absent —
    regexp_extract's no-match convention, identical in DuckDB)."""
    return F.regexp_extract(F.decode(html_col, "UTF-8"), TITLE_RE, 1)
