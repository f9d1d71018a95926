"""Deterministic Common-Crawl-style ``pages`` generator (BASELINE.json input_hint).

Synthesizes the exact input shape (url, warc_ts, html, text, lang) at any
small scale with fixed seed — no wall-clock, no external data. Planted
features per FIXTURES.md §1: a hot domain (~30% of rows, exercises salting /
AQE skew-join), exact and near duplicates, off-language docs, PII strings,
and degenerate docs (too short / symbol-heavy / repetitive) so every
heuristic rule, the scrubber, and dedup all have positive and negative cases.

``html`` is built FROM ``text`` by :func:`render_html` so that
``dq.extract.extract_text(html) == text`` byte-identically (the per-row
invariant in BASELINE.json).
"""

from __future__ import annotations

import datetime as _dt
import html as _html

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from dq.schema import PAGES

# Tiny per-language word pools: enough signal for char-n-gram langid and
# stopword-ratio heuristics, fully deterministic.
WORDS = {
    "en": (
        "the of and to in that it was for on are with as his they be at one have "
        "this from or had by word but what some we can out other were all there "
        "when up use your how said an each she which do their time if will way "
        "about many then them write would like so these her long make thing see "
        "him two has look more day could go come did number sound no most people"
    ).split(),
    "pt": (
        "o a de que e do da em um para é com não uma os no se na por mais as dos "
        "como mas foi ao ele das tem à seu sua ou ser quando muito há nos já está "
        "eu também só pelo pela até isso ela entre era depois sem mesmo aos ter "
        "seus quem nas me esse eles estão você tinha foram essa num nem suas meu"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como estar tener "
        "le lo todo pero más hacer o poder decir este ir otro ese si me ya ver "
        "porque dar cuando él muy sin vez mucho saber qué sobre mi alguno mismo "
        "yo también hasta año dos querer entre así primero desde grande eso ni"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht ein "
        "eine als auch es an werden aus er hat dass sie nach wird bei einer um am "
        "sind noch wie einem über einen so zum war haben nur oder aber vor zur "
        "bis mehr durch man sein wurde sei wenn welche damit gegen könnte"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle au "
        "pour pas vous par sur faire plus dire me on mon lui nous comme mais "
        "pouvoir avec tout y aller voir bien où sans tu ou leur homme si deux "
        "mari moi vouloir te femme venir quand grand celui très notre monde"
    ).split(),
}
LANGS = list(WORDS)

DOMAINS_COLD = [f"site{i:03d}.example.org" for i in range(40)]
HOT_DOMAIN = "bigportal.example.com"

PII_SNIPPETS = [
    "contact me at john.doe{i}@example.com for details",
    "call +1 (555) 123-4{i:03d} tomorrow",
    "my phone is 555-867-5{i:03d}",
    "CPF 123.456.789-{i:02d} registered",
    "server at 192.168.{i}.{j} is down",
    "SSN 123-45-6{i:03d} on file",
]


def _sentence(rng: np.random.RandomState, lang: str, n_words: int) -> str:
    pool = WORDS[lang]
    idx = rng.randint(0, len(pool), size=n_words)
    return " ".join(pool[i] for i in idx)


def _doc_text(rng: np.random.RandomState, lang: str, i: int) -> str:
    """Normal document: 3-8 paragraphs of 20-60 words."""
    n_par = int(rng.randint(3, 9))
    pars = []
    for _ in range(n_par):
        words = _sentence(rng, lang, int(rng.randint(20, 61)))
        pars.append(words.capitalize() + ".")
    # ~15% of docs carry one PII snippet (positive scrub cases)
    if rng.rand() < 0.15:
        tmpl = PII_SNIPPETS[int(rng.randint(0, len(PII_SNIPPETS)))]
        pars.append(tmpl.format(i=i % 250, j=(i * 7) % 250))
    # ~8% carry a toxic term (positive toxicity-mask cases)
    if rng.rand() < 0.08:
        from dq.scrub import TOXIC_WORDS

        word = TOXIC_WORDS[int(rng.randint(0, len(TOXIC_WORDS)))]
        pars.append(f"only a {word} would disagree.")
    return "\n".join(pars)


def _degenerate_text(rng: np.random.RandomState, kind: int, lang: str) -> str:
    if kind == 0:  # too short
        return _sentence(rng, lang, int(rng.randint(1, 8)))
    if kind == 1:  # symbol-heavy
        base = _sentence(rng, lang, 30)
        return base + " " + ("#$%*@! " * 40)
    if kind == 2:  # repetitive (single line repeated)
        line = _sentence(rng, lang, 8).capitalize() + "."
        return "\n".join([line] * 25)
    # kind == 3: bullet/ellipsis spam
    lines = ["- " + _sentence(rng, lang, 5) + "..." for _ in range(20)]
    return "\n".join(lines)


# The render scaffold, hoisted so the three render twins (render_html,
# render_html_col, and dq.oracles' SQL length twin) are generated from ONE
# set of constants — never hand-duplicated. HTML_ESCAPES is the
# html.escape(quote=True) chain, '&' first so it can't re-expand others.
HTML_ESCAPES = (
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#x27;"),
)
HTML_PRE_TITLE = "<html><head><title>"
HTML_POST_TITLE = (
    '</title><meta charset="utf-8"><script>var x=1;</script>'
    "<style>p{margin:0}</style></head><body><div>"
)
HTML_POST_PARS = "</div>"
HTML_FOOT = "<!-- footer --></body></html>"


def render_html_col(text_col, title_col, links_col=None):
    """Native Catalyst twin of :func:`render_html` (byte-identical output,
    pinned by tests/test_extract.py): lets driver-shaped tables without an
    html column synthesize one IN the plan, so the flagship exercises the
    extraction round-trip (extract_text_col(html) == text) end-to-end.

    ``links_col`` (optional array<string> of outlink urls) renders a nav
    block of EMPTY-anchor ``<a href>`` tags — tags are stripped whole by
    the extractor, so the round-trip invariant is untouched while
    dq.webgraph gets real hrefs to mine."""
    from pyspark.sql import functions as F

    def esc(c):  # html.escape(quote=True) twin — shared HTML_ESCAPES chain
        for s, r in HTML_ESCAPES:
            c = F.replace(c, F.lit(s), F.lit(r))
        return c

    pars = F.array_join(
        F.transform(
            F.split(esc(text_col), "\n"),
            lambda p: F.concat(F.lit("<p>"), p, F.lit("</p>")),
        ),
        "",
    )
    nav = (
        F.lit("")
        if links_col is None
        else F.concat(
            F.lit("<nav>"),
            F.array_join(
                F.transform(
                    links_col,
                    lambda u: F.concat(F.lit('<a href="'), esc(u), F.lit('"></a>')),
                ),
                "",
            ),
            F.lit("</nav>"),
        )
    )
    doc = F.concat(
        F.lit(HTML_PRE_TITLE),
        esc(title_col),
        F.lit(HTML_POST_TITLE),
        pars,
        F.lit(HTML_POST_PARS),
        nav,
        F.lit(HTML_FOOT),
    )
    return F.encode(doc, "UTF-8")


def render_html(text: str, title: str, links: tuple[str, ...] = ()) -> bytes:
    """Render text into deterministic HTML. Inverse of dq.extract.extract_text."""
    pars = "".join(f"<p>{_html.escape(p)}</p>" for p in text.split("\n"))
    nav = (
        "<nav>" + "".join(f'<a href="{_html.escape(u)}"></a>' for u in links) + "</nav>"
        if links
        else ""
    )
    doc = (
        f"{HTML_PRE_TITLE}{_html.escape(title)}{HTML_POST_TITLE}"
        f"{pars}{HTML_POST_PARS}{nav}{HTML_FOOT}"
    )
    return doc.encode("utf-8")


def generate_pages_pdf(n_rows: int = 2000, seed: int = 42) -> pd.DataFrame:
    """Deterministic pandas frame with the ``pages`` schema."""
    rng = np.random.RandomState(seed)
    rows = []
    base_ts = _dt.datetime(2024, 3, 1, 0, 0, 0)
    # 4 crawl days present; 2024-03-04 deliberately absent (failure-row path).
    day_choices = [0, 1, 2, 4]
    for i in range(n_rows):
        hot = rng.rand() < 0.30
        domain = HOT_DOMAIN if hot else DOMAINS_COLD[int(rng.randint(0, len(DOMAINS_COLD)))]
        # 80% target language (en), rest spread over other languages
        lang = "en" if rng.rand() < 0.80 else LANGS[1 + int(rng.randint(0, len(LANGS) - 1))]
        r = rng.rand()
        if r < 0.12:
            text = _degenerate_text(rng, int(rng.randint(0, 4)), lang)
        else:
            text = _doc_text(rng, lang, i)
        day = day_choices[int(rng.randint(0, len(day_choices)))]
        ts = base_ts + _dt.timedelta(days=day, seconds=int(rng.randint(0, 86400)))
        url = f"https://{domain}/page/{i}"
        rows.append((url, ts, text, lang))

    # Plant exact duplicates: ~5% of rows repeat an earlier row's text
    # under a different url (same content, new address).
    n_dup = n_rows // 20
    dup_src = rng.randint(0, n_rows, size=n_dup)
    for k, src in enumerate(dup_src):
        u, ts, txt, lg = rows[int(src)]
        rows.append((f"https://{HOT_DOMAIN}/mirror/{k}", ts, txt, lg))

    # Plant near-duplicates: ~3% copy an earlier doc with one word appended.
    n_near = max(n_rows // 33, 4)
    near_src = rng.randint(0, n_rows, size=n_near)
    for k, src in enumerate(near_src):
        u, ts, txt, lg = rows[int(src)]
        rows.append((f"https://{DOMAINS_COLD[k % len(DOMAINS_COLD)]}/copy/{k}", ts, txt + " appendix", lg))

    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text", "lang"])
    pdf["html"] = [render_html(t, u) for t, u in zip(pdf["text"], pdf["url"])]
    return pdf[["url", "warc_ts", "html", "text", "lang"]]


def generate_pages(spark: SparkSession, n_rows: int = 2000, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Spark DataFrame of synthetic pages, hash-distributed by url."""
    pdf = generate_pages_pdf(n_rows=n_rows, seed=seed)
    return spark.createDataFrame(pdf, schema=PAGES).repartition(partitions, "url")
