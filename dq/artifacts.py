"""Model-artifact seam: langid + perplexity weights as a broadcast FILE.

The UDF tier's default models are module-level constants (KBs — import per
executor is the right distribution for that size). Production models are
MB-GB (fastText .bin, KenLM .arpa); those must ship ONCE per executor over
the broadcast channel, not be pickled into every task closure. This module
is that plumbing, testable in-sandbox (VERDICT r3 next-#10): the default
in-module weights serialize to a JSON artifact, any artifact file loads
back and drives the fused langid+perplexity UDF via
``SparkContext.broadcast`` — swapping models is a file swap, zero code
edits. ``pipeline.PipelineConfig(model_artifact=path)`` routes the flagship
through it; with the default artifact the outputs are bit-identical to the
in-module UDF (tested), so the CORRECTNESS rows cannot move.

Format (versioned JSON):
  {"format": 1,
   "langid": {"profiles": {lang: {trigram: logp, ...}}},
   "perplexity": {"bi": {"w1 w2": logp}, "uni": {w: logp}, "unk": logp}}
Bigram keys join the two words with a space — pool words never contain
whitespace (they come from str.split)."""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

FORMAT_VERSION = 1


def default_artifact() -> dict:
    """The in-module weights, in artifact form (the round-trip identity)."""
    from dq.langid import PROFILES
    from dq.perplexity import BI_LOGP, UNI_LOGP, UNK_LOGP

    return {
        "format": FORMAT_VERSION,
        "langid": {"profiles": {lang: dict(p) for lang, p in PROFILES.items()}},
        "perplexity": {
            "bi": {f"{a} {b}": lp for (a, b), lp in BI_LOGP.items()},
            "uni": dict(UNI_LOGP),
            "unk": UNK_LOGP,
        },
    }


def save_artifact(path: str, artifact: dict | None = None) -> None:
    with open(path, "w") as f:
        json.dump(artifact if artifact is not None else default_artifact(), f)


def load_artifact(path: str) -> dict:
    with open(path) as f:
        art = json.load(f)
    if art.get("format") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported model-artifact format {art.get('format')!r} in {path} "
            f"(this build reads format {FORMAT_VERSION})"
        )
    if len(art["langid"]["profiles"]) < 2:
        raise ValueError(
            "langid artifact needs >= 2 language profiles (the margin is "
            "best-vs-runner-up)"
        )
    return art


def _decode_lm(art: dict) -> tuple[dict[tuple[str, str], float], dict[str, float], float]:
    ppl = art["perplexity"]
    bi = {tuple(k.split(" ", 1)): v for k, v in ppl["bi"].items()}
    return bi, ppl["uni"], ppl["unk"]


# per-python-worker decode cache. MODULE-level, not closure-captured: the
# UDF closure is pickled into every task, so a dict captured there is
# re-created per task and the bigram-key decode would re-run on each one;
# this module is imported once per worker process and the dict survives
# across tasks. Keyed on a token minted on the DRIVER at UDF construction
# (worker-side Broadcast objects expose no stable id) — bounded: one entry
# per constructed artifact UDF in the app's lifetime.
_DECODE_CACHE: dict = {}


def _decoded_state(bc, key: str) -> tuple[dict, tuple]:
    state = _DECODE_CACHE.get(key)
    if state is None:
        a = bc.value
        state = (a["langid"]["profiles"], _decode_lm(a))
        _DECODE_CACHE[key] = state
    return state


# driver-side UDF memo: one broadcast per (SparkContext, artifact file
# CONTENT) — without it, per-partition pipeline runs call enrich() once per
# partition and would ship + pin one full model artifact (MB-GB in prod)
# per call on every executor for the app lifetime. Keyed on (mtime, size)
# so swapping the file's contents under the same path invalidates.
_UDF_CACHE: dict = {}


def nlp_udf_from_artifact(spark: SparkSession, path: str):
    """The fused langid+perplexity pandas UDF with weights from ``path``,
    shipped once per executor via ``SparkContext.broadcast`` and memoized
    per (SparkContext, file version) on the driver. The artifact is parsed
    on the DRIVER (fail fast on a bad file); executors deserialize the
    broadcast value once and decode the bigram keys once per python worker
    (module-level cache, driver-minted key).

    Output struct and batch bodies are SHARED with pipeline.nlp_udf
    (dq.langid.detect_lang_batch / dq.perplexity.perplexity_batch with the
    artifact's tables injected) — the UDF-body-is-the-test-oracle invariant
    holds for the artifact path too."""
    import os

    from dq.pipeline import _NLP_TYPE

    st = os.stat(path)
    memo_key = (
        id(spark.sparkContext), os.path.abspath(path), st.st_mtime_ns, st.st_size
    )
    cached = _UDF_CACHE.get(memo_key)
    if cached is not None:
        return cached

    art = load_artifact(path)
    bc = spark.sparkContext.broadcast(art)
    cache_key = f"{path}:{st.st_mtime_ns}:{st.st_size}"  # per-worker decode key

    @F.pandas_udf(_NLP_TYPE)
    def udf(texts: pd.Series) -> pd.DataFrame:
        from dq.langid import detect_lang_batch
        from dq.perplexity import perplexity_batch

        profiles, lm = _decoded_state(bc, cache_key)
        out = detect_lang_batch(texts, profiles)
        out["ppl"] = perplexity_batch(texts, lm)
        return out

    _UDF_CACHE[memo_key] = udf
    return udf
