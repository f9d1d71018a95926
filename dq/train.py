"""In-engine quality-classifier TRAINING (batch perceptron distillation).

Training-data-pipeline addition beyond the reference's table-level DQ scope
(reference: qualitativo/*.scala profiles columns; it neither trains nor
applies document models). Published semantics followed: DCLM (Li et al.
2024), FineWeb-Edu, and the GPT-3 appendix-A pipeline all TRAIN a cheap
linear text classifier on labels produced by an upstream gate (heuristic
rules or an LLM judge), then run the trained model corpus-wide. This module
reproduces that distillation step in-engine: the Gopher/C4 heuristic keep
decision (dq.heuristics.keep_expr — the same constants the oracle uses) is
the teacher label, a bag-of-words linear model over a rank-assigned
vocabulary is the student, and training is the BATCH perceptron (Rosenblatt
update summed over the full misclassified set per round — Collins 2002 §2
evaluates exactly this estimator for NLP): deterministic, order-independent,
and integer-exact, so weights and predictions are bit-identical in DuckDB.

Model/feature design (all shared constants, oracle-generated from them):
- vocabulary: the TRAIN_VOCAB_K most frequent whitespace tokens
  (count DESC, token ASC tie-break), feature id = 1-based rank; feature 0
  is the bias (x=1 on every doc);
- features: x[d, f] = integer occurrence count of vocab token f in doc d;
- rounds: TRAIN_ROUNDS full-batch updates from w = 0:
    score_d = sum_f w[f] * x[d, f]
    miss    = {d : y_d * score_d <= 0}          (y in {+1, -1})
    w[f]   += sum_{d in miss} y_d * x[d, f]
  With w0 = 0, round 1 updates on every doc (y*0 <= 0) — the standard
  batch-perceptron start; everything stays int64 (see overflow note in
  :func:`perceptron_train`).

Scale shape (100 TB notes): the feature frame (doc_id, fid, c) is built
once — tokenize, equi-join the broadcast K-row vocab, one (doc, fid)
hash-agg — hash-partitioned by doc_id and persisted, so each round's
score/update pass reuses the partitioning instead of re-exchanging. Per
round: one broadcast join of the (K+1)-row weight table + one doc_id-keyed
agg (scores) + one fid-keyed agg (updates, K+1 result rows) — no stage ever
carries more than the token-count frame, text never enters an exchange
after tokenization, and the weight table localCheckpoints per round (the
kmeans/pagerank lineage rule). Vocabulary selection is a token hash-agg +
deterministic top-K — the two-phase TakeOrdered shape, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dq.dedup import tokens_col
from dq.heuristics import keep_expr, with_heuristic_metrics

# ---- shared constants (dq.oracles generates SQL from these) ----------------

TRAIN_VOCAB_K = 128  # vocabulary size (top-K tokens by corpus count)
TRAIN_ROUNDS = 3     # full-batch perceptron rounds
BIAS_FID = 0         # feature id of the always-on bias term
BIAS_TOKEN = ""      # token label reported for the bias row


def doc_labels(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, y) teacher labels: +1 = heuristic keep, -1 = drop."""
    m = with_heuristic_metrics(docs.select(F.col(id_col).alias("doc_id"), text_col))
    return m.select(
        "doc_id",
        F.when(keep_expr(), F.lit(1)).otherwise(F.lit(-1)).cast("bigint").alias("y"),
    )


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, tok) exploded lowercase whitespace tokens (NULL text = none)."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
    )
    # explode_outer: a plain explode would let InferFiltersFromGenerate push
    # a size()>0 filter below the Generate and inline the token tree into a
    # Filter (CLAUDE.md / dq/dedup.py trap); tokenless docs carry no features
    # anyway (their bias row comes from the label frame).
    return staged.select("doc_id", F.explode_outer("_w").alias("tok")).where(
        F.col("tok").isNotNull()
    )


def train_vocab(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = TRAIN_VOCAB_K
) -> DataFrame:
    """(fid, tok, n) top-``k`` corpus tokens, fid = 1-based rank
    (count DESC, token ASC — fully deterministic under count ties).

    Two-phase top-K: the token hash-agg shrinks the corpus to its
    vocabulary (~10^7-10^9 rows at web scale), then an ORDER BY ... LIMIT k
    plans as TakeOrdered (per-partition heap + driver merge of k rows) —
    never a global sort. The window below runs AFTER the limit, over k rows.
    """
    cnt = _doc_tokens(docs, id_col, text_col).groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    topk = cnt.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    return topk.select(
        F.row_number().over(w).cast("bigint").alias("fid"), "tok", "n"
    )


def doc_features(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fid, c) integer bag-of-words counts over the vocabulary,
    plus the bias row (fid 0, c 1) for EVERY document — tokenless docs
    still carry it, so every doc has a score each round."""
    toks = _doc_tokens(docs, id_col, text_col)
    x = (
        toks.join(F.broadcast(vocab.select("fid", "tok")), "tok")
        .groupBy("doc_id", "fid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bias = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(BIAS_FID).cast("bigint").alias("fid"),
        F.lit(1).cast("bigint").alias("c"),
    )
    return x.unionByName(bias)


def perceptron_train(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = TRAIN_VOCAB_K,
    rounds: int = TRAIN_ROUNDS,
    labels: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the batch perceptron; returns ``(weights, preds)``.

    ``labels`` overrides the teacher: a (doc_id, y) frame with y in
    {+1, -1} — the gate queries distill the heuristic keep decision
    (default), but any label source works (an LLM-judge sample, human
    annotations broadcast-joined onto doc ids).

    - ``weights``: (feature_id, token, weight) after ``rounds`` updates —
      K+1 rows (bias first by id);
    - ``preds``: (doc_id, y, score, pred) under the FINAL weights, where
      ``pred`` = +1 iff score > 0 else -1 (ties predict drop — the
      conservative side for a quality gate, and deterministic).

    Overflow: each round adds at most sum(|x|) = total corpus token count
    to any |w[f]|; at 10^12 docs x 10^3 tokens x few rounds that is ~10^15
    per weight — safely inside int64 (~9.2e18). Scores are w·x with x
    bounded by a doc's own token count — same headroom.
    """
    if labels is None:
        labels = doc_labels(docs, id_col, text_col)
    labels = labels.localCheckpoint(eager=True)
    vocab = train_vocab(docs, id_col, text_col, vocab_k).localCheckpoint(eager=True)
    # hash-partition by doc_id once: the per-round score agg and miss join
    # both key on doc_id, so the persisted layout serves every round with
    # zero further exchange of the feature frame
    x = doc_features(docs, vocab, id_col, text_col).repartition("doc_id").persist()

    w = vocab.select("fid").unionByName(
        vocab.sparkSession.range(1).select(F.lit(BIAS_FID).cast("bigint").alias("fid"))
    ).select("fid", F.lit(0).cast("bigint").alias("w")).localCheckpoint(eager=True)

    for _ in range(rounds):
        scores = (
            x.join(F.broadcast(w), "fid")
            .groupBy("doc_id")
            .agg(F.sum(F.col("c") * F.col("w")).alias("s"))
        )
        miss = (
            labels.join(scores, "doc_id")
            .where(F.col("y") * F.col("s") <= 0)
            .select("doc_id", "y")
        )
        delta = (
            x.join(miss, "doc_id")
            .groupBy("fid")
            .agg(F.sum(F.col("y") * F.col("c")).alias("d"))
        )
        w = (
            w.join(delta, "fid", "left")
            .select("fid", (F.col("w") + F.coalesce("d", F.lit(0))).alias("w"))
            .localCheckpoint(eager=True)  # tiny frame; cuts per-round lineage
        )

    weights = (
        w.join(F.broadcast(vocab.select("fid", "tok")), "fid", "left")
        .select(
            F.col("fid").alias("feature_id"),
            F.coalesce("tok", F.lit(BIAS_TOKEN)).alias("token"),
            F.col("w").cast("bigint").alias("weight"),
        )
    )
    final_scores = (
        x.join(F.broadcast(w), "fid")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("w")).cast("bigint").alias("score"))
    )
    preds = labels.join(final_scores, "doc_id").select(
        "doc_id",
        "y",
        "score",
        F.when(F.col("score") > 0, F.lit(1)).otherwise(F.lit(-1)).cast("bigint").alias("pred"),
    )
    x.unpersist()
    return weights, preds


# ---- pure-python twin (the pytest oracle) -----------------------------------


def perceptron_train_py(
    rows: list[tuple[int, str | None]],
    keep: dict[int, bool],
    vocab_k: int = TRAIN_VOCAB_K,
    rounds: int = TRAIN_ROUNDS,
) -> tuple[dict[int, int], dict[int, tuple[int, int]]]:
    """Reference implementation over (doc_id, text) rows and teacher keep
    labels; returns ``(weights by fid, {doc: (score, pred)})`` — must match
    the Spark path integer-for-integer (pytest-pinned)."""
    toks = {d: (t or "").lower().split() for d, t in rows}
    cnt: dict[str, int] = {}
    for ws in toks.values():
        for t in ws:
            cnt[t] = cnt.get(t, 0) + 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    fid = {t: i + 1 for i, (t, _) in enumerate(ranked)}
    x: dict[int, dict[int, int]] = {}
    for d, ws in toks.items():
        feats = {BIAS_FID: 1}
        for t in ws:
            f = fid.get(t)
            if f is not None:
                feats[f] = feats.get(f, 0) + 1
        x[d] = feats
    y = {d: (1 if keep[d] else -1) for d, _ in rows}
    w = {f: 0 for f in range(vocab_k + 1) if f == BIAS_FID or f in fid.values()}
    for _ in range(rounds):
        delta: dict[int, int] = {}
        for d, feats in x.items():
            s = sum(w.get(f, 0) * c for f, c in feats.items())
            if y[d] * s <= 0:
                for f, c in feats.items():
                    delta[f] = delta.get(f, 0) + y[d] * c
        for f, dv in delta.items():
            w[f] = w.get(f, 0) + dv
    out = {}
    for d, feats in x.items():
        s = sum(w.get(f, 0) * c for f, c in feats.items())
        out[d] = (s, 1 if s > 0 else -1)
    return w, out
