"""fastText-style character-n-gram language identification.

A vectorized pandas/Arrow UDF (the one place SQL can't express the payload —
SURVEY.md §2.10): per-language char-trigram log-probability profiles are
built deterministically at import from the embedded public word pools
(dq/synth.py WORDS), captured once per executor via closure + module import
(no per-task re-pickling of large state; the profile dict is a few KB).

The UDF body (:func:`detect_lang_batch`) doubles as the pandas oracle —
tests call it directly and compare against the Spark column output.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dq.synth import WORDS

_NGRAM = 3
_SMOOTH = 0.5


def _build_profiles() -> dict[str, dict[str, float]]:
    profiles: dict[str, dict[str, float]] = {}
    for lang, pool in WORDS.items():
        counts: Counter[str] = Counter()
        for w in pool:
            padded = f" {w.lower()} "
            for i in range(len(padded) - _NGRAM + 1):
                counts[padded[i : i + _NGRAM]] += 1
        total = sum(counts.values())
        vocab = len(counts) + 1
        denom = total + _SMOOTH * vocab
        logp = {g: math.log((c + _SMOOTH) / denom) for g, c in counts.items()}
        logp["<unk>"] = math.log(_SMOOTH / denom)
        profiles[lang] = logp
    return profiles


PROFILES = _build_profiles()

# Hot-path layout: ONE dict lookup per trigram returning the per-language
# log-prob tuple (vs one lookup per language per gram — langid is the
# pipeline's hottest python stage, and dict probes dominate it).
LANGS_ORDER = sorted(PROFILES)
_UNK_VEC = tuple(PROFILES[lang]["<unk>"] for lang in LANGS_ORDER)
_COMBINED: dict[str, tuple[float, ...]] = {}
for _lang_i, _lang in enumerate(LANGS_ORDER):
    for _g, _lp in PROFILES[_lang].items():
        if _g == "<unk>":
            continue
        vec = _COMBINED.get(_g)
        if vec is None:
            vec = list(_UNK_VEC)
            _COMBINED[_g] = vec  # type: ignore[assignment]
        vec[_lang_i] = _lp  # type: ignore[index]
_COMBINED = {g: tuple(v) for g, v in _COMBINED.items()}


def _trigrams(text: str) -> list[str]:
    padded = " " + " ".join(text.lower().split()) + " "
    return [padded[i : i + _NGRAM] for i in range(len(padded) - _NGRAM + 1)]


# Scoring prefix cap (CCNet-style): langid needs a prefix, not the doc.
# 600 chars ≈ 100 words — prediction-equivalent on this corpus at ~3x the
# throughput of a 2000-char cap (langid is the pipeline's hottest stage).
PREFIX_CHARS = 600


def detect_one(text: str | None, profiles: dict | None = None) -> tuple[str, float]:
    """(best_lang, mean-log-prob margin vs runner-up). Deterministic.

    The hot path groups repeated grams (Counter) before accumulating, so
    float summation order differs from the naive per-profile loop by
    grouping — labels agree on the test corpora and parity with the oracle
    holds by construction (the oracle IS this function)."""
    if not text:
        return ("und", 0.0)
    grams = _trigrams(text[:PREFIX_CHARS])
    if not grams:
        return ("und", 0.0)
    if profiles is None and len(LANGS_ORDER) == 5:
        # hot path: dedupe grams (docs repeat ~half), one combined lookup
        # per unique gram, unrolled 5-wide multiply-add (~1.5x the naive
        # per-profile loop; label-identical on the test corpora)
        from collections import Counter

        a0 = a1 = a2 = a3 = a4 = 0.0
        get = _COMBINED.get
        for g, c in Counter(grams).items():
            v0, v1, v2, v3, v4 = get(g, _UNK_VEC)
            a0 += c * v0
            a1 += c * v1
            a2 += c * v2
            a3 += c * v3
            a4 += c * v4
        n = len(grams)
        scores = dict(zip(LANGS_ORDER, (a0 / n, a1 / n, a2 / n, a3 / n, a4 / n)))
    elif profiles is None:
        acc = [0.0] * len(LANGS_ORDER)
        combined_get = _COMBINED.get
        for g in grams:
            vec = combined_get(g, _UNK_VEC)
            for i, v in enumerate(vec):
                acc[i] += v
        n = len(grams)
        scores = {lang: acc[i] / n for i, lang in enumerate(LANGS_ORDER)}
    else:
        scores = {}
        for lang, prof in profiles.items():
            unk = prof["<unk>"]
            scores[lang] = sum(prof.get(g, unk) for g in grams) / len(grams)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    best, second = ranked[0], ranked[1]
    return (best[0], best[1] - second[1])


def detect_lang_batch(texts: pd.Series, profiles: dict | None = None) -> pd.DataFrame:
    """Batch body shared by the pandas UDF and the test oracle. ``profiles``
    overrides the module-default language profiles (broadcast-artifact
    injection point, dq/artifacts.py)."""
    pairs = [detect_one(t, profiles) for t in texts]
    return pd.DataFrame(
        {"lang_pred": [p[0] for p in pairs], "lang_margin": [p[1] for p in pairs]},
        index=texts.index,
    )


_RESULT_TYPE = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_margin", T.DoubleType()),
    ]
)


@F.pandas_udf(_RESULT_TYPE)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    return detect_lang_batch(texts)


def langid_udf_broadcast(spark):
    """Same UDF with the model distributed via SparkContext.broadcast —
    the path for MB-scale model artifacts (fastText .bin, KenLM .arpa):
    shipped once per executor over the torrent-style broadcast channel
    instead of pickled into every task closure. The embedded profiles are
    KBs, so module import suffices here; this constructor is the
    production seam and is tested for output equality with langid_udf."""
    bc = spark.sparkContext.broadcast(PROFILES)

    @F.pandas_udf(_RESULT_TYPE)
    def udf(texts: pd.Series) -> pd.DataFrame:
        profiles = bc.value
        pairs = [detect_one(t, profiles) for t in texts]
        return pd.DataFrame(
            {"lang_pred": [p[0] for p in pairs], "lang_margin": [p[1] for p in pairs]},
            index=texts.index,
        )

    return udf
