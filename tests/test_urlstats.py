"""URL/domain analytics + benchmark-contamination semantics on planted data."""

from pyspark.sql import functions as F

from dq import contamination, urlstats


def test_url_docs_construction(spark):
    docs = spark.createDataFrame(
        [(0, "en"), (3, "pt"), (5, "en"), (8, "de")], "doc_id bigint, lang string"
    )
    out = {r.doc_id: r.url for r in urlstats.url_docs(docs).collect()}
    # doc 0: hot (0 % 10 < 4), banned seg (0 % 5 == 0, token idx 0), query (0 % 4 == 0)
    assert out[0] == f"https://{urlstats.HOT_DOMAIN}/ads/item-0?utm_source=feed"
    # doc 3: hot (3 < 4), no seg, no query
    assert out[3] == f"https://{urlstats.HOT_DOMAIN}/item-3"
    # doc 5: cold idx 0, banned seg (5 % 5 == 0, token idx 5%3=2)
    assert out[5] == f"https://{urlstats.COLD_DOMAINS[0]}/signup/item-5"
    # doc 8: cold idx 3, query (8 % 4 == 0)
    assert out[8] == f"https://{urlstats.COLD_DOMAINS[3]}/item-8?utm_source=feed"


def test_domain_stats_hot_flag_and_share(spark):
    # 6 docs on hot.example, 2 on a.example, 2 on b.example -> hot >= 10%
    rows = [(i, f"https://hot.example/p{i}", "en") for i in range(6)]
    rows += [(10, "https://a.example/x", "en"), (11, "https://a.example/y", "pt")]
    rows += [(12, "https://b.example/x", "en"), (13, "https://b.example/y", "en")]
    base = spark.createDataFrame(rows, "doc_id bigint, url string, lang string")
    out = {r.domain: r for r in urlstats.domain_stats(base, hot_share_pct=50).collect()}
    assert out["hot.example"].n_docs == 6
    assert out["hot.example"].is_hot  # 6*100 >= 50*10
    assert not out["a.example"].is_hot
    assert out["hot.example"].share_bp == 6000
    assert out["a.example"].n_langs == 2


def test_url_blocklist_rules(spark):
    blocked = urlstats.BLOCKED_DOMAINS[0]
    base = spark.createDataFrame(
        [
            (1, f"https://{blocked}/item-1"),          # blocked domain
            (2, "https://ok.example/ads/item-2"),      # banned path
            (3, "https://ok.example/item-3?utm=x"),    # query string
            (4, "https://ok.example/item-4"),          # clean
            (5, "https://ok.example/adsitem-5"),       # 'ads' NOT a segment
        ],
        "doc_id bigint, url string",
    )
    out = {r.doc_id: r for r in urlstats.url_blocklist_filter(base).collect()}
    assert out[1].is_blocked_domain and not out[1].keep
    assert out[2].has_banned_path and not out[2].keep
    assert out[3].has_query and not out[3].keep
    assert out[4].keep
    assert out[5].keep and not out[5].has_banned_path


def test_contamination_planted_overlap(spark):
    m = contamination.BENCH_DOC_MOD
    bench_text = "alpha beta gamma delta epsilon zeta eta"  # doc 0 -> benchmark
    rows = [
        (0, bench_text),
        # doc 1: contains the benchmark's first 5-gram once, 3 grams total
        (1, "alpha beta gamma delta epsilon other other"),
        # doc 2: disjoint vocabulary
        (2, "one two three four five six seven"),
        # doc 3: too short to form a 5-gram
        (3, "tiny doc"),
        # doc m: also benchmark (excluded from output)
        (m, "unrelated benchmark text present here today now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in contamination.contamination_scores(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_grams == 3 and out[1].n_hits == 1
    assert out[1].contamination_bp == 3333
    assert out[2].n_hits == 0 and not out[2].is_contaminated
    assert out[3].n_grams == 0 and out[3].contamination_bp == 0
    assert out[1].is_contaminated  # 3333 >= 2000


def test_contamination_full_copy_flagged(spark):
    m = contamination.BENCH_DOC_MOD
    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, t), (1, t)], "doc_id bigint, text string"
    )
    assert m != 1
    r = contamination.contamination_scores(docs).collect()[0]
    assert r.doc_id == 1 and r.contamination_bp == 10000 and r.is_contaminated


def test_canonical_url_rules(spark):
    from dq.urlstats import canonical_url_col

    cases = [
        ("https://Ex.COM/Path#frag", "https://ex.com/Path"),          # host lower, path case kept
        ("HTTPS://HOST/p?utm_source=a", "https://host/p"),            # scheme+tracking
        ("https://h/p?utm_source=a&x=1", "https://h/p?x=1"),          # first-of-many
        ("https://h/p?x=1&gclid=99", "https://h/p?x=1"),              # mid
        ("https://h/p?x=1&fbclid=2&y=3", "https://h/p?x=1&y=3"),      # mid keeps rest
        ("https://h/dir/", "https://h/dir"),                          # trailing slash
        ("https://h/p?keep=utm_source", "https://h/p?keep=utm_source"),  # value untouched
        ("no-scheme/relative", "no-scheme/relative"),                 # non-url passthrough
    ]
    df = spark.createDataFrame(cases, "url string, expect string")
    from pyspark.sql import functions as F

    bad = df.where(canonical_url_col(F.col("url")) != F.col("expect")).collect()
    assert bad == [], bad


def test_url_canonicalize_collapses_planted_variants(spark):
    from dq.queries import CANON_VARIANT_MOD, CANON_VARIANT_REM, url_canonical_dups
    from tests.conftest import SF0001

    out = {r.doc_id: r for r in url_canonical_dups(spark, SF0001).collect()}
    for did, r in out.items():
        if did % CANON_VARIANT_MOD == CANON_VARIANT_REM:
            assert r.changed and r.n_same_canon == 2      # variant collapsed
            assert out[did - 1].url_canon == r.url_canon  # onto its neighbor


def test_robots_rules_longest_match_semantics(spark):
    """Hand urls against the planted rule set: whole-site disallow,
    prefix carve-out, nested carve-out, equal-length tie -> allow,
    unmatched domain/path -> allow."""
    rows = [
        # hot domain: /ads disallowed, /ads/item-1* carved back in
        (1, f"https://{urlstats.HOT_DOMAIN}/ads/item-150"),
        (2, f"https://{urlstats.HOT_DOMAIN}/ads/item-90"),
        (3, f"https://{urlstats.HOT_DOMAIN}/item-7"),
        # blog: site-wide disallow, /signup carve-out
        (4, "https://blog.alpha.example/tracker/item-15"),
        (5, "https://blog.alpha.example/signup/item-35"),
        # wiki: equal-length allow+disallow on /item-2 -> allow wins
        (6, "https://wiki.epsilon.example/item-24"),
        # unknown domain: no rules at all
        (7, "https://nowhere.example/item-1"),
    ]
    base = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {
        r.doc_id: r for r in urlstats.robots_rules_filter(base).collect()
    }
    assert got[1].allowed and got[1].matched_len == len("/ads/item-1")
    assert not got[2].allowed and got[2].matched_len == len("/ads")
    assert got[3].allowed and got[3].matched_len == 0  # no hot rule matches
    assert not got[4].allowed and got[4].matched_len == 1  # "/"
    assert got[5].allowed and got[5].matched_len == len("/signup")
    assert got[6].allowed and got[6].matched_len == len("/item-2")
    assert got[7].allowed and got[7].matched_len == 0
    # exactly one row per input url (the argmax collapses the rule fan-out)
    assert len(got) == len(rows)


# ---- crawl budget apportionment ---------------------------------------------


def _quota(spark, counts, budget):
    from dq.urlstats import crawl_budget_quota

    rows = [(d,) for d, n in counts.items() for _ in range(n)]
    base = spark.createDataFrame(rows, "domain string")
    return {r.domain: r for r in crawl_budget_quota(base, budget=budget).collect()}


def _hamilton_py(counts, budget):
    total = sum(counts.values())
    base = {d: budget * n // total for d, n in counts.items()}
    rem = {d: budget * n % total for d, n in counts.items()}
    left = budget - sum(base.values())
    order = sorted(counts, key=lambda d: (-rem[d], d))
    return {d: base[d] + (1 if i < left else 0) for i, d in enumerate(order)}


def test_budget_sums_exactly_and_within_quota(spark):
    counts = {"a.com": 7, "b.com": 13, "c.com": 1, "d.com": 29, "e.com": 3}
    out = _quota(spark, counts, budget=100)
    assert sum(r.quota for r in out.values()) == 100
    for d, r in out.items():
        assert r.extra in (0, 1) and r.quota == r.base_quota + r.extra
    assert {d: r.quota for d, r in out.items()} == _hamilton_py(counts, 100)


def test_budget_exact_division_no_extras(spark):
    counts = {"a.com": 2, "b.com": 2, "c.com": 2, "d.com": 2}
    out = _quota(spark, counts, budget=100)
    assert all(r.extra == 0 and r.quota == 25 for r in out.values())


def test_budget_remainder_ties_break_on_domain(spark):
    # four equal-weight domains, budget 6: every rem ties; the 2 extras go
    # to the lexicographically smallest domains
    counts = {"d.com": 1, "b.com": 1, "a.com": 1, "c.com": 1}
    out = _quota(spark, counts, budget=6)
    assert {d: r.quota for d, r in out.items()} == {
        "a.com": 2, "b.com": 2, "c.com": 1, "d.com": 1
    }
    assert {d: r.quota for d, r in out.items()} == _hamilton_py(counts, 6)


def test_budget_matches_python_on_lcg_corpus(spark):
    state, counts = 7, {}
    for i in range(40):
        state = (state * 1103515245 + 12345) % (1 << 31)
        counts[f"dom{i:02d}.com"] = 1 + state % 97
    out = _quota(spark, counts, budget=12345)
    assert {d: r.quota for d, r in out.items()} == _hamilton_py(counts, 12345)
    assert sum(r.quota for r in out.values()) == 12345
