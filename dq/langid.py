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


def _trigrams(text: str) -> list[str]:
    padded = " " + " ".join(text.lower().split()) + " "
    return [padded[i : i + _NGRAM] for i in range(len(padded) - _NGRAM + 1)]


# Scoring prefix cap (CCNet-style): langid needs a prefix, not the doc.
# 600 chars ≈ 100 words — prediction-equivalent on this corpus at ~3x the
# throughput of a 2000-char cap (langid is the pipeline's hottest stage).
PREFIX_CHARS = 600


def detect_one(text: str | None, profiles: dict | None = None) -> tuple[str, float]:
    """(best_lang, mean-log-prob margin vs runner-up). Deterministic."""
    if not text:
        return ("und", 0.0)
    grams = _trigrams(text[:PREFIX_CHARS])
    if not grams:
        return ("und", 0.0)
    scores = {}
    for lang, prof in (profiles or PROFILES).items():
        unk = prof["<unk>"]
        scores[lang] = sum(prof.get(g, unk) for g in grams) / len(grams)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    best, second = ranked[0], ranked[1]
    return (best[0], best[1] - second[1])


def detect_lang_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch body shared by the pandas UDF and the test oracle."""
    pairs = [detect_one(t) for t in texts]
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
