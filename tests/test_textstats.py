"""Text analysis expressions: token counts, quality, lang hint, fingerprints."""

import re

from pyspark.sql import functions as F

from dq import textstats


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",), ("",)], "text string")
    out = df.select(
        textstats.whitespace_token_count("text").alias("ws"),
        textstats.bpe_token_count("text").alias("bpe"),
    ).collect()
    assert (out[0].ws, out[1].ws) == (4, 0)
    want = len(re.findall(textstats.BPE_SPLIT_PATTERN, "Hello, world! 42 times"))
    assert out[0].bpe == want == 6  # Hello , world ! 42 times
    assert out[1].bpe == 0


def test_quality_score_ranges(spark):
    good = " ".join(["the quick brown fox does things properly."] * 10)
    bad = "@@@@"
    df = spark.createDataFrame([(good,), (bad,), (None,)], "text string")
    s = [r.q for r in df.select(textstats.quality_score("text").alias("q")).collect()]
    assert s[0] > 0.6
    assert s[1] < 0.4
    assert 0.0 <= s[2] <= 1.0


def test_lang_hint(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat in that house",),
         ("el la que ser haber por con para como pero",)],
        "text string",
    )
    out = [r.l for r in df.select(textstats.lang_hint("text").alias("l")).collect()]
    assert out == ["en", "es"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], "text string"
    )
    fps = [r.f for r in df.select(textstats.fingerprint64("text").alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_repetition_metrics_planted(spark):
    """A doc that is one bigram repeated scores top_bigram_frac ~1; varied
    text scores low; sub-bigram docs come back 0 (kept by the left join)."""
    from dq import textstats

    rows = [
        (1, "spam ham " * 20),                      # "spam ham"-dominated
        (2, "the quick brown fox jumps over the lazy dog near the old barn"),
        (3, "single"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.repetition_metrics(df).collect()}
    assert got[1].n_bigrams == 39
    assert got[1].top_bigram_frac > 0.5  # 20/39 "spam ham"
    assert got[2].top_bigram_frac == 1.0 / got[2].n_bigrams  # all distinct
    assert got[3].n_bigrams == 0 and got[3].top_bigram_frac == 0.0
    assert got[4].n_trigrams == 0


def test_repetition_metrics_plan_splits_once(spark):
    """The words array is staged once per doc — the gram construction must
    not re-split the text per gram/per element (expression-subtree capture
    hazard; CLAUDE.md perf lesson)."""
    import contextlib
    import io

    from dq import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        textstats.repetition_metrics(docs).explain(mode="extended")
    optimized = buf.getvalue().split("== Optimized Logical Plan ==")[1].split(
        "== Physical Plan =="
    )[0]
    assert optimized.count("split(") <= 2  # one staging per n-gram branch


def test_dup_ngram_char_stats_planted(spark):
    from dq.textstats import dup_ngram_char_stats

    rows = [
        (1, "a b c d e f"),            # 2 distinct 5-grams, no dups
        (2, "a b c d e a b c d e a b c d e"),  # heavy self-repetition
        (3, "one two"),                # < n words -> 0 grams
        (4, None),                     # NULL text -> 0 grams
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in dup_ngram_char_stats(df).collect()}
    assert out[1].n_grams == 2 and out[1].dup_ngram_char_frac == 0.0
    assert out[3].n_grams == 0 and out[3].dup_ngram_char_frac == 0.0
    assert out[4].n_grams == 0 and out[4].dup_ngram_char_frac == 0.0
    # doc 2: 15 words -> 11 grams; "a b c d e" etc. repeat with period 5 ->
    # grams at offsets 0,5,10 identical (3 copies), 1..4 vs 6..9 (2 copies)
    r2 = out[2]
    assert r2.n_grams == 11
    # expected fraction from a direct python recount
    words = rows[1][1].split()
    gs = [" ".join(words[i : i + 5]) for i in range(len(words) - 4)]
    from collections import Counter

    c = Counter(gs)
    tot = sum(len(g) * k for g, k in c.items())
    dup = sum(len(g) * k for g, k in c.items() if k > 1)
    assert r2.dup_ngram_char_frac == dup / tot and dup > 0


def test_script_profile_counts_and_dominance(spark):
    from dq.textstats import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "данные и ещё данные много данных здесь"),
            (3, "数据处理系统 ok"),
            (4, None),
            (5, "a б"),  # 1 latin, 1 cyrillic -> tie breaks in class order
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in script_profile(df).collect()}
    assert out[1].dominant_script == "latin" and out[1].n_latin == 10
    assert out[2].dominant_script == "cyrillic" and out[2].n_latin == 0
    assert out[3].dominant_script == "cjk" and out[3].n_cjk == 6
    assert out[4].dominant_script == "none" and out[4].n_latin == 0
    assert out[5].dominant_script == "latin"  # tie -> first in SCRIPT_CLASSES


def test_script_profiles_query_no_exchange(spark):
    from dq.queries import script_profiles

    plan_str = (
        script_profiles(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan_str


def test_compression_stats_udf_matches_batch_twin(spark):
    """The Spark column output equals the shared pandas body per doc, and
    the signal orders repetitive below normal below random text."""
    import random
    import string

    import pandas as pd

    from dq.textstats import compression_stats, compression_stats_batch

    rng = random.Random(3)
    # random over the FULL printable set measures ~9300 bp (random letters
    # or CJK still compress — zlib squeezes narrow alphabets and UTF-8
    # lead-byte structure); this is the base64-blob/minified-junk shape
    # the too_random flag exists for
    rand_text = "".join(rng.choice(string.printable) for _ in range(400))
    rows = [
        (0, "spam " * 100),                   # highly compressible
        (1, "the quick brown fox " * 5),      # mildly repetitive
        (2, rand_text),                       # incompressible
        (3, None),                            # NULL -> 10000 convention
        (4, ""),                              # empty -> 10000
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_stats(df).collect()}
    twin = compression_stats_batch(pd.Series([t for _, t in rows]))
    for i, (_, t) in enumerate(rows):
        assert got[i].n_bytes == twin.n_bytes[i]
        assert got[i].n_zlib_bytes == twin.n_zlib_bytes[i]
        assert got[i].compress_bp == twin.compress_bp[i]
    assert got[0].compress_bp < got[1].compress_bp < got[2].compress_bp
    assert got[3].compress_bp == 10000 and got[4].compress_bp == 10000
    assert got[0].too_compressible and not got[0].too_random
    assert got[2].too_random and not got[2].too_compressible
    # flags are two-valued even on NULL text (gate hash-compare invariant)
    assert got[3].too_compressible is False and got[3].too_random is False


# ---- per-language vocabulary / Zipf stats -----------------------------------

def test_vocab_stats_by_lang_planted(spark):
    from dq.textstats import vocab_stats_by_lang

    rows = [
        (1, "en", "the cat and the dog and the bird"),  # the:3 and:2 rest:1
        (2, "en", "the zebra"),                         # the -> 4 total
        (3, "pt", "aa bb aa"),                          # tie at 2? aa:2 bb:1
        (4, "pt", "bb cc"),                             # aa:2 bb:2 cc:1 -> tie
        (5, "de", None),                                # empty slice
        (6, "de", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {r.lang: r for r in vocab_stats_by_lang(df).collect()}

    en = out["en"]
    assert (en.n_docs, en.n_tokens, en.vocab_size) == (2, 10, 6)
    # hapax: cat, dog, bird, zebra (the:4, and:2)
    assert en.n_hapax == 4
    assert en.top_token == "the" and en.top_cnt == 4
    assert en.type_token_ratio == 6 / 10
    assert en.hapax_frac == 4 / 6
    assert en.top_share == 4 / 10

    pt = out["pt"]
    # aa:2 bb:2 cc:1 — tie at top_cnt=2 broken by term ASC
    assert pt.top_token == "aa" and pt.top_cnt == 2
    assert (pt.n_tokens, pt.vocab_size, pt.n_hapax) == (5, 3, 1)

    de = out["de"]
    assert (de.n_docs, de.n_tokens, de.vocab_size, de.n_hapax) == (2, 0, 0, 0)
    assert (de.type_token_ratio, de.hapax_frac, de.top_share) == (0.0, 0.0, 0.0)
    assert de.top_token == "" and de.top_cnt == 0


def test_vocab_stats_text_never_shuffles(spark):
    from dq.textstats import vocab_stats_by_lang

    df = spark.createDataFrame(
        [(1, "en", "alpha beta")], "doc_id bigint, lang string, text string"
    )
    plan = vocab_stats_by_lang(df)._jdf.queryExecution().executedPlan().toString()
    import re

    for frag in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in frag  # only lang/term/agg columns shuffle


def test_lang_confusion_and_doclen_percentiles(spark, tmp_path):
    """Planted corpus through the registry entries (sf-dir driven)."""
    import pyspark.sql.functions as F

    from dq.queries import doclen_percentiles_by_lang, lang_confusion

    rows = [
        # declared en, stopword-hinted en (top-10 en stopwords present)
        (1, "en", "the of and a in is it you that he was for on are"),
        # declared en, hint disagrees (pt stopwords)
        (2, "en", "de que não uma para com mais por como foi"),
        # declared pt, hint pt
        (3, "pt", "de que não uma para com mais por como foi"),
        # token lengths for percentiles: en docs have 14, 10; pt 10
        (4, "de", None),  # NULL text: 0 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")

    conf = {(r.lang, r.lang_hint): r for r in lang_confusion(spark, sf).collect()}
    assert conf[("en", "en")].n_docs == 1
    assert conf[("en", "pt")].n_docs == 1
    assert conf[("en", "en")].lang_total == 2
    assert conf[("en", "en")].cell_frac == 0.5
    assert conf[("pt", "pt")].n_docs == 1 and conf[("pt", "pt")].cell_frac == 1.0

    pct = {r.lang: r for r in doclen_percentiles_by_lang(spark, sf).collect()}
    # en lengths sorted: [10, 14] -> p25 = value at ceil(.25*2)=1st = 10,
    # p50 = 1st = 10, p75 = ceil(1.5)=2nd = 14
    assert (pct["en"].p25_tokens, pct["en"].p50_tokens, pct["en"].p75_tokens) == (10, 10, 14)
    assert (pct["pt"].p25_tokens, pct["pt"].p50_tokens, pct["pt"].p75_tokens) == (10, 10, 10)
    assert (pct["de"].p25_tokens, pct["de"].p50_tokens, pct["de"].p75_tokens) == (0, 0, 0)


def test_bpe_pair_table_hand_computed(spark):
    # vocab: ab:2, cd:1, abc:1, 42:1; '!' (len 1) and the 65-char run (len
    # cap) contribute nothing; NULL text contributes nothing.
    rows = [
        (1, "ab ab cd! abc"),
        (2, "42 " + "x" * 65),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in textstats.bpe_pair_table(df).collect()
    }
    assert got == {
        ("a", "b"): 3,  # ab x2 + abc
        ("b", "c"): 1,
        ("c", "d"): 1,
        ("4", "2"): 1,
    }


def test_bpe_pair_table_topk_deterministic(spark):
    # ties on pair_count break by (left_sym, right_sym) — the LIMIT picks
    # the same rows in Spark and the DuckDB twin.
    df = spark.createDataFrame([(1, "zy zx wa")], "doc_id bigint, text string")
    rows = textstats.bpe_pair_table(df).collect()
    assert [(r.left_sym, r.right_sym) for r in rows] == [
        ("w", "a"),
        ("z", "x"),
        ("z", "y"),
    ]


def _ref_bpe_merges(texts, rounds):
    """Classic dict-based BPE trainer (Sennrich et al. 2016 reference shape):
    the pure-Python oracle bpe_learn_merges must be row-identical to.
    Same tokenization constants, same greedy left-to-right non-overlapping
    merge, same (count desc, then pair asc) tie-break."""
    import collections
    import re

    pat = re.compile(textstats.BPE_SPLIT_PATTERN)
    vocab: collections.Counter = collections.Counter()
    for t in texts:
        for w in pat.findall(t or ""):
            if textstats.BPE_WORD_MIN_LEN <= len(w) <= textstats.BPE_WORD_MAX_LEN:
                vocab[tuple(w)] += 1
    merges = []
    for rank in range(rounds):
        pairs: collections.Counter = collections.Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        new_vocab: collections.Counter = collections.Counter()
        for syms, freq in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def test_bpe_learn_merges_matches_python_trainer_planted(spark):
    # overlap edge ("aaa" -> greedy [aa, a]), merged-symbol re-pairing
    # (round 2 can merge a previous round's output), ties, NULL text
    texts = [
        "aaa aaa banana banana banana ab ab ab ab",
        "an an an na na",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in textstats.bpe_learn_merges(df, rounds=6).collect()]
    want = _ref_bpe_merges(texts, 6)
    assert got == want, (got, want)


def test_bpe_learn_merges_matches_python_trainer_sf0001(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [tuple(r) for r in textstats.bpe_learn_merges(docs, rounds=4).collect()]
    texts = [r.text for r in docs.select("text").collect()]
    want = _ref_bpe_merges(texts, 4)
    assert got == want, (got, want)


def test_bpe_fertility_by_lang_hand_computed(spark):
    # en: the->[the](1), thin->[th,in](2), and->[and](1), other->[o,th,er](3)
    # pt: er->[er](1) x2 occurrences, xx->[x,x](2)
    rows = [(1, "en", "the thin and other"), (2, "pt", "er er xx"), (3, "de", None)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {r.lang: r for r in textstats.bpe_fertility_by_lang(df).collect()}
    assert set(got) == {"en", "pt"}  # NULL-text de has zero words -> no row
    en, pt = got["en"], got["pt"]
    assert (en.n_distinct_words, en.n_word_occurrences, en.n_tokens) == (4, 4, 7)
    assert en.fertility_bp == 17500
    assert (pt.n_distinct_words, pt.n_word_occurrences, pt.n_tokens) == (2, 3, 4)
    assert pt.fertility_bp == 13333


def test_readability_scores_hand_computed(spark):
    # "Hello world. Go!": 3 ws-words, 2 sentence groups (. and !),
    # 4 vowel runs (e,o / o / o) -> 206835 - 3045//2 - 338400//3 = 92513
    rows = [(1, "Hello world. Go!"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in textstats.readability_scores(df).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllable_groups) == (3, 2, 4)
    assert r1.flesch_mp == 206835 - (1015 * 3) // 2 - (84600 * 4) // 3 == 92513
    assert r1.band == "very_easy"
    # NULL text: floors guard to 1 word / 1 sentence, 0 syllables -> constant
    r2 = got[2]
    assert (r2.n_words, r2.n_sentences, r2.n_syllable_groups) == (1, 1, 0)
    assert r2.flesch_mp == 205820 and r2.band == "very_easy"


def test_readability_scores_no_exchange(spark):
    from dq.queries import readability_scores as q

    from tests.test_plans import plan_of

    plan = plan_of(q(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan


def test_collocation_dice_hand_computed(spark):
    # doc1: "new york" x5 -> pair 5, c_new=5, c_york=5 -> dice 10000;
    #       "york new" appears 4x, under COLLOC_MIN_COUNT -> dropped.
    # doc2: tokens [x y]*5 + [x x x]: (x,y) 5x and (y,x) 5x (the 5th y is
    #       followed by the lone-x tail), c_x=8, c_y=5 ->
    #       dice = 2*10000*5 // 13 = 7692 for both directions.
    rows = [
        (1, " ".join(["new york"] * 5)),
        (2, " ".join(["x y"] * 5) + " x x x"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.w1, r.w2): r for r in textstats.collocation_dice_topk(df).collect()}
    assert set(got) == {("new", "york"), ("x", "y"), ("y", "x")}
    ny = got[("new", "york")]
    assert (ny.pair_count, ny.left_count, ny.right_count, ny.dice_bp) == (5, 5, 5, 10000)
    for pair in [("x", "y"), ("y", "x")]:
        r = got[pair]
        assert (r.pair_count, r.dice_bp) == (5, 7692)
        assert {r.left_count, r.right_count} == {8, 5}


def test_collocation_text_never_shuffles(spark):
    import re

    from dq.queries import collocation_topk as q

    from tests.test_plans import plan_of

    plan = plan_of(q(spark, "/root/testdata/sf0.001"))
    nodes = re.split(r"\n(?=\(\d+\) )", plan)
    for node in nodes:
        if not node.split("\n")[0].rstrip().endswith("Exchange"):
            continue
        inp = re.search(r"Input \[(\d+)\]: \[([^\]]*)\]", node)
        assert inp and "text#" not in inp.group(2) and "_w#" not in inp.group(2), node


def test_filter_agreement_matches_python_kappa(spark):
    from fractions import Fraction

    from dq import classifier, heuristics
    from dq.queries import (
        AGREEMENT_KAPPA_SCALE,
        AGREEMENT_PAIRS,
        AGREEMENT_READABLE_MIN_MP,
        filter_agreement,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    h = {r.doc_id: r.k for r in heuristics.with_heuristic_metrics(docs)
         .select("doc_id", heuristics.keep_expr().alias("k")).collect()}
    c = {r.doc_id: r.keep_quality for r in classifier.classifier_scores(docs).collect()}
    rd = {r.doc_id: r.flesch_mp >= AGREEMENT_READABLE_MIN_MP
          for r in textstats.readability_scores(docs).collect()}
    flags = {"keep_h": h, "keep_c": c, "keep_r": rd}
    got = {(r.signal_a, r.signal_b): r
           for r in filter_agreement(spark, sf).collect()}
    n = len(h)
    for na, nb, ca, cb in AGREEMENT_PAIRS:
        a, b = flags[ca], flags[cb]
        agree = sum(1 for d in a if a[d] == b[d])
        pa, pb = sum(a.values()), sum(b.values())
        e = pa * pb + (n - pa) * (n - pb)
        want = int(Fraction(AGREEMENT_KAPPA_SCALE * (n * agree - e), n * n - e))
        row = got[(na, nb)]
        assert (row.n_docs, row.n_agree, row.pos_a, row.pos_b) == (n, agree, pa, pb)
        assert row.kappa_bp == want, (na, nb, row.kappa_bp, want)
    # the three signals must not be fully redundant on the gate corpus
    assert any(got[k].kappa_bp < 9000 for k in got)


def test_vocab_coverage_hand_corpus(spark):
    """Hand-checked curve: tokens a×3 b×2 c×1 (T=6). 90% needs ceil(5.4)=6
    occurrences -> all 3 types; 99%/99.9% likewise saturate. A second
    corpus with a fat head checks the mid-curve ceil-remainder pick."""
    from dq.textstats import vocab_coverage

    df = spark.createDataFrame([("a a a b b c",)], "text string")
    rows = {r["target_bp"]: r for r in vocab_coverage(df).collect()}
    for bp in (9000, 9900, 9990):
        r = rows[bp]
        assert (r["vocab_size"], r["covered_tokens"], r["coverage_bp"]) == (3, 6, 10000)
        assert r["total_tokens"] == 6 and r["total_types"] == 3

    # 10×"x" + 10 hapaxes: T=20; 90% -> need 18 = 10 + 8 hapaxes -> 9 types
    df2 = spark.createDataFrame(
        [("x " * 10 + " ".join(f"h{i}" for i in range(10)),)], "text string"
    )
    r90 = {r["target_bp"]: r for r in vocab_coverage(df2).collect()}[9000]
    assert r90["vocab_size"] == 9
    assert r90["covered_tokens"] == 18
    assert r90["coverage_bp"] == 9000


def test_vocab_coverage_matches_bruteforce(spark):
    """Pandas brute-force twin on sf0.001: sort types by (cnt DESC), take
    the minimal prefix reaching each target — the histogram pick must
    agree on vocab_size/covered_tokens and be MINIMAL (one fewer type
    falls short)."""
    from collections import Counter

    from dq.textstats import VOCAB_COVERAGE_TARGETS_BP, vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["text"] or "" for r in docs.select("text").collect()]
    counts = Counter(t for x in texts for t in x.lower().split() if t)
    sizes = sorted(counts.values(), reverse=True)
    total = sum(sizes)

    got = {r["target_bp"]: r for r in vocab_coverage(docs).collect()}
    for bp in VOCAB_COVERAGE_TARGETS_BP:
        need = -(-total * bp // 10000)  # ceil
        cum, n = 0, 0
        for c in sizes:
            if cum >= need:
                break
            cum += c
            n += 1
        r = got[bp]
        assert r["vocab_size"] == n
        assert r["covered_tokens"] == cum
        assert cum >= need
        assert cum - sizes[n - 1] < need  # minimality
        assert r["total_tokens"] == total and r["total_types"] == len(sizes)
