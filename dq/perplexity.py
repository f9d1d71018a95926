"""KenLM-style n-gram perplexity scoring as a vectorized pandas UDF.

Word-bigram language model with add-k smoothing, built deterministically at
import from the embedded public word pools (dq/synth.py WORDS) — the
sandbox stand-in for a KenLM binary model; the Spark-side plumbing (Arrow
batches, closure-captured model, double column out) is the real thing.
On a cluster the model file ships via ``SparkFiles`` / broadcast; here it is
a module-level dict (few KB) imported on each executor.

Low perplexity = text looks like the target language's distribution.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dq.synth import WORDS

_K = 0.1
_TARGET = "en"


def _build_lm(lang: str) -> tuple[dict[tuple[str, str], float], dict[str, float], float]:
    """Bigram + unigram backoff counts over the pool, cyclic context."""
    pool = [w.lower() for w in WORDS[lang]]
    uni: Counter[str] = Counter(pool)
    bi: Counter[tuple[str, str]] = Counter(zip(pool, pool[1:] + pool[:1]))
    vocab = len(uni) + 1
    total = sum(uni.values())
    uni_logp = {w: math.log((c + _K) / (total + _K * vocab)) for w, c in uni.items()}
    unk_logp = math.log(_K / (total + _K * vocab))
    bi_logp = {
        pair: math.log((c + _K) / (uni[pair[0]] + _K * vocab)) for pair, c in bi.items()
    }
    return bi_logp, uni_logp, unk_logp


BI_LOGP, UNI_LOGP, UNK_LOGP = _build_lm(_TARGET)


def perplexity_one(
    text: str | None,
    lm: tuple[dict[tuple[str, str], float], dict[str, float], float] | None = None,
) -> float:
    """``lm`` overrides the module-default (bi, uni, unk) tables — the
    injection point for broadcast-file model artifacts (dq/artifacts.py)."""
    bi_logp, uni_logp, unk_logp = lm if lm is not None else (BI_LOGP, UNI_LOGP, UNK_LOGP)
    if not text:
        return float("inf")
    words = text.lower().split()[:500]  # scoring prefix cap, like CCNet
    if not words:
        return float("inf")
    lp = 0.0
    prev = None
    for w in words:
        if prev is not None and (prev, w) in bi_logp:
            lp += bi_logp[(prev, w)]
        else:
            lp += uni_logp.get(w, unk_logp)
        prev = w
    return math.exp(-lp / len(words))


def perplexity_batch(texts: pd.Series, lm=None) -> pd.Series:
    """``lm`` overrides the module-default tables (see perplexity_one)."""
    return pd.Series([perplexity_one(t, lm) for t in texts], index=texts.index, dtype="float64")


@F.pandas_udf(T.DoubleType())
def perplexity_udf(texts: pd.Series) -> pd.Series:
    return perplexity_batch(texts)
