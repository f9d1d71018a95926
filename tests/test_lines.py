"""Line-level operators: global line dedup (FineWeb-style), C4 line rules,
TF-IDF top terms — semantics on planted corpora + both dedup paths equal."""

from pyspark.sql import functions as F

from dq import lines
from dq.textstats import tfidf_top_terms

BOILER = "every doc has this nav bar"


def _corpus(spark):
    # docs 1..4 share BOILER (4 >= min_docs); unique bodies; doc 4 is
    # boilerplate-only; body order around the boilerplate must survive
    rows = [
        (1, [BOILER, "alpha body one", "omega tail one"]),
        (2, ["beta body two", BOILER]),
        (3, ["gamma body three", BOILER, "gamma tail three"]),
        (4, [BOILER]),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, lines array<string>")


def test_line_dedup_semantics_and_order(spark):
    out = {
        r.doc_id: r
        for r in lines.line_dedup_global(_corpus(spark), min_docs=3).collect()
    }
    assert out[1].text_clean == "alpha body one\nomega tail one"
    assert (out[1].n_lines, out[1].n_dropped) == (3, 1)
    assert out[2].text_clean == "beta body two"
    assert out[3].text_clean == "gamma body three\ngamma tail three"
    assert out[4].text_clean == ""  # fully-boilerplate doc survives as a row
    assert (out[4].n_lines, out[4].n_dropped) == (1, 1)


def test_line_dedup_paths_identical(spark):
    base = _corpus(spark)
    rows = lambda m: sorted(  # noqa: E731
        lines.line_dedup_global(base, min_docs=3, mode=m).collect()
    )
    assert rows("broadcast") == rows("shuffle")


def test_line_dedup_below_threshold_keeps_all(spark):
    out = lines.line_dedup_global(_corpus(spark), min_docs=5).collect()
    assert all(r.n_dropped == 0 for r in out)
    assert BOILER in {r.text_clean for r in out}  # doc 4 kept verbatim


def test_c4_line_filter_rules(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                [
                    "a good long sentence that terminates properly.",  # kept
                    "too short.",  # short (2 words)
                    "this line has plenty of words but no terminal",  # unterminated
                    "we use cookies on this site to track you.",  # banned
                ],
            )
        ],
        "doc_id bigint, lines array<string>",
    )
    r = lines.c4_line_filter(df).collect()[0]
    assert (r.n_lines, r.n_short, r.n_unterminated, r.n_banned, r.n_kept) == (
        4, 1, 1, 1, 1,
    )
    assert r.text_c4 == "a good long sentence that terminates properly."


def test_multiline_docs_construction(spark):
    docs = spark.createDataFrame([(0, "body zero"), (1, "body one")],
                                 "doc_id bigint, text string")
    out = {r.doc_id: r.lines for r in lines.multiline_docs(docs).collect()}
    # doc 0: header idx 0, body gets '.', footer idx 1 (0 % FOOTER_MOD == 0)
    assert out[0] == [
        lines.BOILERPLATE_LINES[0], "body zero.", lines.BOILERPLATE_LINES[1]
    ]
    # doc 1: header idx 1, no '.', no footer
    assert out[1] == [lines.BOILERPLATE_LINES[1], "body one"]


def test_tfidf_top_terms_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "rare rare common zebra"),   # tf(rare)=2 beats all
            (2, "common common apple"),      # tf tie apple/... df breaks
            (3, "common apple"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    top = {
        (r.doc_id, r.term_rank): (r.term, r.tf, r.df) for r in out
    }
    assert top[(1, 1)] == ("rare", 2, 1)
    # doc 1 rank 2: common/zebra both tf=1 -> rarer zebra (df 1 < df 3) wins
    assert top[(1, 2)] == ("zebra", 1, 1)
    # doc 2: common tf=2 first; then apple (tf 1)
    assert top[(2, 1)] == ("common", 2, 3)
    assert top[(2, 2)] == ("apple", 1, 2)
    # doc 3: tf tie common/apple -> apple df=2 < common df=3
    assert top[(3, 1)] == ("apple", 1, 2)


def test_dup_line_stats_planted(spark):
    rows = [
        (1, ["a line.", "b body.", "b body.", "c tail."]),   # 1 dup occurrence
        (2, ["unique one.", "unique two."]),                  # none
        (3, ["x.", "x.", "x."]),                              # 2 dup occurrences
        (4, ["", ""]),                                        # dup of empty: 0 chars
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lines array<string>")
    out = {r.doc_id: r for r in lines.dup_line_stats(df).collect()}
    assert (out[1].n_lines, out[1].n_dup_lines) == (4, 1)
    assert out[1].dup_line_frac == 1 / 4
    assert out[1].dup_line_char_frac == len("b body.") / len("a line.b body.b body.c tail.")
    assert (out[2].n_dup_lines, out[2].dup_line_frac, out[2].dup_line_char_frac) == (0, 0.0, 0.0)
    assert (out[3].n_lines, out[3].n_dup_lines) == (3, 2)
    assert out[3].dup_line_frac == 2 / 3 and out[3].dup_line_char_frac == 2 / 3
    assert (out[4].n_dup_lines, out[4].dup_line_char_frac) == (1, 0.0)  # 0-char guard


def test_dup_line_stats_exchange_is_narrow(spark):
    df = spark.createDataFrame(
        [(1, ["abc.", "abc."])], "doc_id bigint, lines array<string>"
    )
    plan = lines.dup_line_stats(df)._jdf.queryExecution().executedPlan().toString()
    import re

    for frag in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "line#" not in frag  # only doc_id/fp/len ever shuffle


# ---- Dolma paragraph Bloom dedup --------------------------------------------

def _bloom_corpus(spark):
    seed = spark.createDataFrame(
        [(100, ["seen para one", "seen para two"]), (101, ["seen para three"])],
        "doc_id bigint, lines array<string>",
    )
    probe = spark.createDataFrame(
        [
            (1, ["fresh alpha", "seen para one", "fresh beta"]),
            (2, ["seen para two", "seen para three"]),
            (3, ["fresh gamma"]),
        ],
        "doc_id bigint, lines array<string>",
    )
    return seed, probe


def test_paragraph_bloom_zero_false_negatives_and_order(spark):
    seed, probe = _bloom_corpus(spark)
    out = {r.doc_id: r for r in lines.paragraph_bloom_dedup(seed, probe).collect()}
    # every seed paragraph is GONE (FNs impossible by construction) and the
    # survivors keep their original relative order
    assert out[1].text_clean == "fresh alpha\nfresh beta"
    assert (out[1].n_paras, out[1].n_flagged) == (3, 1)
    assert out[2].text_clean == ""  # fully-seen doc survives as an empty row
    assert (out[2].n_paras, out[2].n_flagged) == (2, 2)
    # fresh-only doc unscathed (no false positive on this planted corpus —
    # 256 Kbit filter over 3 keys; a real FP would be a one-sided drop)
    assert out[3].text_clean == "fresh gamma"
    assert out[3].n_flagged == 0


def test_paragraph_bloom_empty_seed_keeps_everything(spark):
    seed = spark.createDataFrame([], "doc_id bigint, lines array<string>")
    _, probe = _bloom_corpus(spark)
    out = lines.paragraph_bloom_dedup(seed, probe).collect()
    assert all(r.n_flagged == 0 for r in out)


def test_paragraph_bloom_probe_side_never_shuffles(spark):
    # the only exchanges build the filter (8-B fps / word table / 1-row map
    # collect) — no exchange may carry paragraph text or the lines array
    seed, probe = _bloom_corpus(spark)
    plan = (
        lines.paragraph_bloom_dedup(seed, probe)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for frag in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "lines#" not in frag and "line#" not in frag
    assert "BroadcastExchange" in plan  # word map reaches the probe broadcast


# ---- domain-scoped boilerplate ---------------------------------------------

def _domain_corpus(spark):
    # site-a (4 docs): banner in all 4 (100% >= 1/2, removed); "shared quote"
    # in 1/4 docs (< 1/2, kept despite being global-hot across domains);
    # site-b (2 docs): its own banner in both (removed); the SAME
    # "shared quote" in 1/2 docs >= 1/2 AND >= 2 docs? only 1 doc -> kept.
    # site-c (1 doc): banner appears once < min_docs -> kept.
    rows = [
        (1, "site-a", ["banner a", "body one", "shared quote"]),
        (2, "site-a", ["banner a", "body two"]),
        (3, "site-a", ["body three", "banner a"]),
        (4, "site-a", ["banner a"]),
        (5, "site-b", ["banner b", "body five", "shared quote"]),
        (6, "site-b", ["body six", "banner b"]),
        (7, "site-c", ["banner c", "body seven", "shared quote"]),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, lines array<string>"
    )


def test_domain_boilerplate_scoped_removal(spark):
    out = {
        r.doc_id: r
        for r in lines.domain_boilerplate_removal(_domain_corpus(spark)).collect()
    }
    # banners removed exactly within their own domain
    assert out[1].text_clean == "body one\nshared quote"
    assert out[2].text_clean == "body two"
    assert out[3].text_clean == "body three"
    assert (out[4].n_lines, out[4].n_dropped, out[4].text_clean) == (1, 1, "")
    assert out[5].text_clean == "body five\nshared quote"
    assert out[6].text_clean == "body six"
    # single-doc domain: banner below min_docs, survives
    assert out[7].text_clean == "banner c\nbody seven\nshared quote"
    # the globally repeated quote (3 domains) never crossed a PER-DOMAIN
    # threshold -> kept everywhere, unlike global line dedup at min_docs=3
    globally = {
        r.doc_id: r.text_clean
        for r in lines.line_dedup_global(
            _domain_corpus(spark).select("doc_id", "lines"), min_docs=3
        ).collect()
    }
    assert "shared quote" not in globally[1]
    assert "shared quote" in out[1].text_clean


def test_domain_boilerplate_paths_identical(spark):
    base = _domain_corpus(spark)
    rows = lambda m: sorted(  # noqa: E731
        lines.domain_boilerplate_removal(base, mode=m).collect()
    )
    assert rows("broadcast") == rows("shuffle")


def test_domain_boilerplate_same_line_other_domain_survives(spark):
    # identical line text hot on site-a must NOT be removed from site-b
    rows = [
        (1, "site-a", ["tpl line", "a1"]),
        (2, "site-a", ["tpl line", "a2"]),
        (3, "site-b", ["tpl line", "b1"]),
        (4, "site-b", ["b2"]),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, lines array<string>")
    out = {r.doc_id: r.text_clean for r in lines.domain_boilerplate_removal(df).collect()}
    assert out[1] == "a1" and out[2] == "a2"
    assert out[3] == "tpl line\nb1"  # 1/2 of site-b docs but only 1 doc < min_docs


def test_paragraph_bloom_sharded_path_identical(spark):
    """Both probe backends — the one-map-row broadcast and the sharded
    (shard, word_idx) join — produce identical verdicts, counts, and
    rebuilt text (VERDICT r4 wrong-#3: a single map row caps at ~2 GiB, so
    past the broadcast ceiling the sharded join is the production form)."""
    seed, probe = _bloom_corpus(spark)
    b = sorted(
        map(tuple, lines.paragraph_bloom_dedup(seed, probe, mode="broadcast").collect())
    )
    s = sorted(
        map(tuple, lines.paragraph_bloom_dedup(seed, probe, mode="sharded").collect())
    )
    assert s == b


def test_paragraph_bloom_auto_flips_over_threshold(spark):
    """auto mode sizing flip: a broadcast_max_words below the filter's word
    count must route to the sharded backend (no one-row map in the plan)
    and still match the broadcast output bit-for-bit; the default ceiling
    keeps the gate corpus on the broadcast fast path."""
    seed, probe = _bloom_corpus(spark)
    base = sorted(
        map(tuple, lines.paragraph_bloom_dedup(seed, probe, mode="broadcast").collect())
    )
    flipped = lines.paragraph_bloom_dedup(
        seed, probe, mode="auto", broadcast_max_words=0
    )
    assert sorted(map(tuple, flipped.collect())) == base
    plan = flipped._jdf.queryExecution().optimizedPlan().toString()
    assert "map_from_entries" not in plan
    stay = lines.paragraph_bloom_dedup(seed, probe, mode="auto")
    assert sorted(map(tuple, stay.collect())) == base
    assert (
        "map_from_entries"
        in stay._jdf.queryExecution().optimizedPlan().toString()
    )


def test_paragraph_bloom_sharded_empty_lines_doc(spark):
    """A probe doc with an EMPTY lines array produces no exploded rows —
    the left join back must restore it as (0 paras, 0 flagged, '')."""
    seed = spark.createDataFrame(
        [(100, ["seen para one"])], "doc_id bigint, lines array<string>"
    )
    probe = spark.createDataFrame(
        [(1, []), (2, ["seen para one", "fresh body"])],
        "doc_id bigint, lines array<string>",
    )
    for mode in ("broadcast", "sharded"):
        out = {
            r.doc_id: r
            for r in lines.paragraph_bloom_dedup(seed, probe, mode=mode).collect()
        }
        assert (out[1].n_paras, out[1].n_flagged, out[1].text_clean) == (0, 0, "")
        assert (out[2].n_paras, out[2].n_flagged, out[2].text_clean) == (
            2, 1, "fresh body",
        ), mode
