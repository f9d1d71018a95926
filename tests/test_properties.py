"""Hypothesis property tests over the pure-Python oracle twins (fast: no
Spark jobs per example; the Spark≡oracle equivalence is covered elsewhere)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dq.dedup import simhash_one
from dq.heuristics import _metrics_one
from dq.langid import detect_one
from dq.perplexity import perplexity_one
from dq.scrub import scrub_text

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=400,
)


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_metrics_bounded(t):
    m = _metrics_one(t)
    for k in ("symbol_ratio", "stop_ratio", "dup_line_ratio", "ellipsis_line_ratio", "alpha_word_ratio"):
        assert 0.0 <= m[k] <= 1.0, k
    assert m["n_words_m"] >= 0 and m["n_chars_m"] == len(t)


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_scrub_deterministic_and_identity_without_pii_chars(t):
    s = scrub_text(t)
    assert scrub_text(t) == s  # deterministic
    if "@" not in t and not any(ch.isdigit() for ch in t):
        assert s == t  # every rule needs '@' or digits to fire


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_simhash_int64_range(t):
    v = simhash_one(t)
    assert -(1 << 63) <= v < (1 << 63)
    assert simhash_one(t) == v  # deterministic


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_langid_total(t):
    lang, margin = detect_one(t)
    assert margin >= 0.0
    assert lang in {"en", "pt", "es", "de", "fr", "und"}


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_perplexity_positive(t):
    assert perplexity_one(t) > 0


URLISH = st.lists(
    st.sampled_from(list("abcXYZ019:/?&=#._-%") + ["utm_source", "https://", "gclid=", "?utm_x=1"]),
    max_size=20,
).map("".join)


@settings(max_examples=120, deadline=None)
@given(URLISH)
def test_canonical_url_idempotent_and_clean(u):
    from dq.urlstats import canonical_url

    c = canonical_url(u)
    assert canonical_url(c) == c          # idempotent (the dedup-key property)
    assert "#" not in c                   # fragment always gone
    assert not c.endswith("/")            # trailing slash always stripped
