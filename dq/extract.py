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
