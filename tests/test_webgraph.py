"""Web link graph: href mining, domain edges, integer PageRank."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from dq import webgraph
from dq.synth import render_html
from dq.extract import extract_text
from tests.conftest import SF0001


def ref_pagerank(edges: dict[tuple[str, str], int], iters: int) -> dict[str, int]:
    """Pure-Python twin of dq.webgraph.pagerank (same integer quantization)."""
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    outw: dict[str, int] = defaultdict(int)
    for (u, _), w in edges.items():
        outw[u] += w
    r = {n: webgraph.RANK_SCALE for n in nodes}
    for _ in range(iters):
        s: dict[str, int] = defaultdict(int)
        for (u, v), w in edges.items():
            s[v] += (r[u] * w) // outw[u]
        r = {
            n: webgraph.RANK_BASE + (webgraph.DAMP_NUM * s[n]) // webgraph.DAMP_DEN
            for n in nodes
        }
    return r


def test_links_preserve_extraction_roundtrip():
    text = 'hello <world> & "friends"\nsecond paragraph'
    plain = render_html(text, "t")
    linked = render_html(text, "t", ("doc://src1/out/5", "doc://src0/out/5"))
    assert linked != plain  # nav block really rendered
    assert extract_text(linked) == extract_text(plain) == text


def test_extract_links_col_and_render_col_agree(spark):
    links = ("doc://src3/out/9", "doc://src0/out/9")
    pdf_html = render_html("body text", "u9", links)
    df = spark.createDataFrame([("u9",)], "url string").select(
        "url",
        F.encode(F.lit(pdf_html.decode("utf-8")), "UTF-8").alias("html"),
    )
    got = df.select(webgraph.extract_links_col(F.col("html")).alias("l")).head()["l"]
    assert tuple(got) == links


def test_out_link_urls_python_twin(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        webgraph.out_link_urls(F.col("id")).alias("links"),
    )
    for row in df.collect():
        i = row["doc_id"]
        expect = [
            f"doc://src{(i * m) % webgraph.LINK_DOMAINS}/out/{i}"
            for m in webgraph.LINK_MULTS
        ] + [f"doc://src{webgraph.LINK_HUB}/out/{i}"]
        assert list(row["links"]) == expect


def test_domain_edges_planted(spark):
    rows = [
        ("doc://a/1", render_html("x", "1", ("doc://b/out/1", "doc://b/out/1b")).decode()),
        ("doc://a/2", render_html("y", "2", ("doc://c/out/2",)).decode()),
        ("doc://b/3", render_html("z", "3", ()).decode()),  # no links
    ]
    pages = spark.createDataFrame(rows, "url string, h string").select(
        "url", F.encode(F.col("h"), "UTF-8").alias("html")
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in webgraph.domain_edges(pages).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1}


def test_pagerank_matches_python_reference(spark):
    from dq.queries import docs_as_pages

    edges_df = webgraph.domain_edges(docs_as_pages(spark, SF0001))
    edges = {
        (r["src_domain"], r["dst_domain"]): r["weight"] for r in edges_df.collect()
    }
    expect = ref_pagerank(edges, webgraph.PAGERANK_ITERS)
    got = {r["domain"]: r["rank"] for r in webgraph.pagerank(edges_df).collect()}
    assert got == expect
    # the hub (every doc links to it) must out-rank everyone else
    hub = f"src{webgraph.LINK_HUB}"
    assert got[hub] == max(got.values()) and got[hub] > min(got.values())


def ref_trustrank(
    edges: dict[tuple[str, str], int], seeds: set[str], iters: int
) -> dict[str, int]:
    """Pure-Python twin of dq.webgraph.trustrank (seed-restricted base)."""
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    outw: dict[str, int] = defaultdict(int)
    for (u, _), w in edges.items():
        outw[u] += w
    r = {n: webgraph.RANK_SCALE if n in seeds else 0 for n in nodes}
    for _ in range(iters):
        s: dict[str, int] = defaultdict(int)
        for (u, v), w in edges.items():
            s[v] += (r[u] * w) // outw[u]
        r = {
            n: (webgraph.RANK_BASE if n in seeds else 0)
            + (webgraph.DAMP_NUM * s[n]) // webgraph.DAMP_DEN
            for n in nodes
        }
    return r


def test_trustrank_matches_python_reference(spark):
    from dq.queries import docs_as_pages

    edges_df = webgraph.domain_edges(docs_as_pages(spark, SF0001))
    edges = {
        (r["src_domain"], r["dst_domain"]): r["weight"] for r in edges_df.collect()
    }
    seeds = set(webgraph.TRUST_SEED_DOMAINS)
    expect = ref_trustrank(edges, seeds, webgraph.TRUST_ITERS)
    rows = webgraph.trustrank(edges_df).collect()
    got = {r["domain"]: r["trust"] for r in rows}
    assert got == expect
    assert {r["domain"] for r in rows if r["is_seed"]} == seeds
    # seeds hold trust; the planted graph is dense enough that trust flows
    assert all(got[s] > 0 for s in seeds)
    assert max(got.values()) > 0


def test_trustrank_spam_cluster_gets_zero(spark):
    """A cluster no seed can reach ends with exactly zero trust, however
    heavily it links to itself — the spam-demotion property that
    distinguishes TrustRank from PageRank (where self-linking farms mass
    from the uniform base)."""
    rows = [
        ("seed", "good", 3),
        ("good", "hub", 1),
        ("spamA", "spamB", 50),   # link farm, unreachable from the seed
        ("spamB", "spamA", 50),
        ("spamB", "hub", 1),      # spam linking OUT doesn't earn trust
    ]
    edges = spark.createDataFrame(
        rows, "src_domain string, dst_domain string, weight bigint"
    )
    got = {
        r["domain"]: (r["trust"], r["is_seed"])
        for r in webgraph.trustrank(edges, seeds=("seed",), checkpoint=False).collect()
    }
    assert got["spamA"][0] == 0 and got["spamB"][0] == 0
    assert got["good"][0] > got["hub"][0] > 0  # trust decays with distance
    assert got["seed"][1] and not got["spamA"][1]
    # the SAME farm under pagerank holds plenty of mass (the contrast)
    pr = {r["domain"]: r["rank"] for r in webgraph.pagerank(edges, checkpoint=False).collect()}
    assert pr["spamA"] > pr["good"]


def ref_hits(
    edges: dict[tuple[str, str], int], iters: int
) -> dict[str, tuple[int, int]]:
    """Pure-Python twin of dq.webgraph.hits (max-normalized integer HITS)."""
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    scale = webgraph.RANK_SCALE
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iters):
        ar: dict[str, int] = defaultdict(int)
        for (u, v), w in edges.items():
            ar[v] += h[u] * w
        mx = max(ar.values())
        a = {n: (ar.get(n, 0) * scale) // mx for n in nodes}
        hr: dict[str, int] = defaultdict(int)
        for (u, v), w in edges.items():
            hr[u] += a[v] * w
        mxh = max(hr.values())
        h = {n: (hr.get(n, 0) * scale) // mxh for n in nodes}
    return {n: (h[n], a[n]) for n in nodes}


def test_hits_matches_python_reference(spark):
    from dq.queries import docs_as_pages

    edges_df = webgraph.domain_edges(docs_as_pages(spark, SF0001))
    edges = {
        (r["src_domain"], r["dst_domain"]): r["weight"] for r in edges_df.collect()
    }
    expect = ref_hits(edges, webgraph.HITS_ITERS)
    got = {
        r["domain"]: (r["hub"], r["auth"])
        for r in webgraph.hits(edges_df).collect()
    }
    assert got == expect
    # max-normalization: exactly one score per vector sits at RANK_SCALE
    assert max(h for h, _ in got.values()) == webgraph.RANK_SCALE
    assert max(a for _, a in got.values()) == webgraph.RANK_SCALE


def test_hits_hub_authority_distinction(spark):
    """A directory page linking out to every authority earns hub mass but
    no authority mass; the pages it points at earn authority but (linking
    nowhere) zero hub — the asymmetry HITS exists to expose, invisible to
    PageRank's single score."""
    rows = [
        ("directory", "paperA", 1),
        ("directory", "paperB", 1),
        ("directory", "paperC", 1),
        ("reader1", "directory", 1),   # someone links the directory too
    ]
    edges = spark.createDataFrame(
        rows, "src_domain string, dst_domain string, weight bigint"
    )
    got = {
        r["domain"]: (r["hub"], r["auth"])
        for r in webgraph.hits(edges, checkpoint=False).collect()
    }
    assert got["directory"][0] == webgraph.RANK_SCALE  # the top hub
    assert all(got[p][0] == 0 for p in ("paperA", "paperB", "paperC"))
    assert all(got[p][1] > 0 for p in ("paperA", "paperB", "paperC"))
    assert got["reader1"][1] == 0  # nobody links the reader


def test_pagerank_plan_no_cartesian(spark):
    from dq.queries import docs_as_pages

    plan = webgraph.pagerank(
        webgraph.domain_edges(docs_as_pages(spark, SF0001)), iters=1, checkpoint=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_page_rank_prior_broadcasts_ranks(spark):
    from dq.queries import page_rank_prior

    df = page_rank_prior(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # pages side never shuffles
    assert df.count() == 500  # every page got a prior (all domains ranked)


def test_anchor_terms_extraction_and_counts(spark):
    pages = spark.createDataFrame(
        [
            (1, '<a href="doc://a/x">news</a><a href="doc://a/y">news</a>'
                '<a href="doc://b/z">login</a><a href="doc://a/w"></a>'),
        ],
        "doc_id bigint, html string",
    )
    got = {
        (r.dst_domain, r.term): r.n_mentions
        for r in webgraph.anchor_terms(pages).collect()
    }
    # empty anchors are dropped; counts aggregate per (domain, term)
    assert got == {("a", "news"): 2, ("b", "login"): 1}


def test_top_anchor_terms_deterministic_rank(spark):
    terms = spark.createDataFrame(
        [("d", "beta", 5), ("d", "alpha", 5), ("d", "gamma", 9), ("d", "zeta", 1)],
        "dst_domain string, term string, n_mentions bigint",
    )
    out = webgraph.top_anchor_terms(terms, k=3).collect()
    ranked = sorted((r.term_rank, r.term) for r in out)
    # ties break term-ASC: gamma(9), alpha(5), beta(5); zeta cut
    assert ranked == [(1, "gamma"), (2, "alpha"), (3, "beta")]


def test_anchor_window_runs_over_aggregate_not_rows(spark):
    """The top-k window's subtree must contain the hash aggregate — the
    window sorts the (domain, term) rollup, never the exploded anchors."""
    from dq.queries import anchor_top_terms

    plan = anchor_top_terms(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    below_window = plan[plan.rindex("Window") :]
    assert "HashAggregate" in below_window


# ------------------------------------------------- triangles / communities --


def _edges_df(spark, pairs):
    """Directed (src, dst, weight) edge frame from (src, dst, w) tuples."""
    return spark.createDataFrame(
        [(a, b, w) for a, b, w in pairs],
        "src_domain string, dst_domain string, weight long",
    )


def _py_triangles(und_pairs):
    """Brute-force per-node triangle counts over canonical a<b edges."""
    from itertools import combinations

    es = {tuple(sorted(p)) for p in und_pairs}
    nodes = sorted({v for e in es for v in e})
    tri = {v: 0 for v in nodes}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            tri[x] += 1; tri[y] += 1; tri[z] += 1
    return tri


def test_triangle_stats_matches_bruteforce(spark):
    """K4 ∪ a pendant chain ∪ an isolated 2-cycle: oriented enumeration ==
    brute-force combinations, per node."""
    from dq import webgraph

    und = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d"), ("d", "e"), ("e", "f"), ("x", "y")]
    edges = _edges_df(spark, [(a, b, 1) for a, b in und])
    got = {r.domain: (r.degree, r.tri_cnt, r.wedge_cnt, r.clustering)
           for r in webgraph.triangle_stats(edges).collect()}
    expect_tri = _py_triangles(und)
    deg = {v: sum(1 for e in und if v in e) for v in expect_tri}
    assert set(got) == set(expect_tri)
    for v, t in expect_tri.items():
        d = deg[v]
        w = d * (d - 1) // 2
        assert got[v][0] == d and got[v][1] == t and got[v][2] == w
        assert got[v][3] == (t / w if w else 0.0)
    # K4 interior: clustering exactly 1.0 at a,b,c; pendant chain: 0
    assert got["a"][3] == 1.0 and got["f"][3] == 0.0


def test_triangle_stats_star_hub_has_no_triangles(spark):
    """A 40-leaf star: 0 triangles everywhere, hub clustering 0.0 — and the
    degree orientation sends every edge TOWARD the hub, so no wedge ever
    lands on the hub key (the h^2 skew the orientation exists to avoid)."""
    from dq import webgraph

    edges = _edges_df(spark, [("hub", f"leaf{i:02d}", 1) for i in range(40)])
    rows = {r.domain: r for r in webgraph.triangle_stats(edges).collect()}
    assert rows["hub"].degree == 40 and rows["hub"].tri_cnt == 0
    assert all(r.tri_cnt == 0 for r in rows.values())
    assert rows["hub"].clustering == 0.0


def test_triangle_weights_do_not_affect_counts(spark):
    """Triangles are a property of the simple graph: summed multi-edge
    weights and direction must not change counts."""
    from dq import webgraph

    tri = [("a", "b", 5), ("b", "a", 2), ("b", "c", 1), ("a", "c", 9)]
    got = {r.domain: r.tri_cnt for r in
           webgraph.triangle_stats(_edges_df(spark, tri)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def _py_lpa(und_weighted, iters):
    """Python twin of the synchronous weighted LPA rounds."""
    adj = {}
    for a, b, w in und_weighted:
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    lbl = {v: v for v in adj}
    for _ in range(iters):
        nxt = {}
        for v, nbrs in adj.items():
            votes = {}
            for n, w in nbrs.items():
                votes[lbl[n]] = votes.get(lbl[n], 0) + w
            nxt[v] = min(votes, key=lambda l: (-votes[l], l))
        lbl = nxt
    return lbl


def test_lpa_two_cliques_weak_bridge(spark):
    """Two 4-cliques joined by one weight-1 bridge converge to two
    communities; the spark rounds equal the python twin exactly."""
    from dq import webgraph
    from itertools import combinations

    und = (
        [(a, b, 10) for a, b in combinations(["a1", "a2", "a3", "a4"], 2)]
        + [(a, b, 10) for a, b in combinations(["b1", "b2", "b3", "b4"], 2)]
        + [("a4", "b1", 1)]
    )
    edges = _edges_df(spark, und)
    got = {r.domain: r.community
           for r in webgraph.lpa_communities(edges).collect()}
    assert got == _py_lpa(und, webgraph.LPA_ITERS)
    comms = {got[v] for v in ["a1", "a2", "a3", "a4"]}
    assert len(comms) == 1
    assert {got[v] for v in ["b1", "b2", "b3", "b4"]} == {"b1"} or len(
        {got[v] for v in ["b1", "b2", "b3", "b4"]}
    ) == 1
    assert got["a1"] != got["b2"]


def test_lpa_matches_python_twin_on_mined_graph(spark):
    """The gate-shaped graph (mined domain edges from rendered pages):
    spark LPA == python twin round-for-round."""
    from dq import webgraph
    from dq.queries import docs_as_pages

    pages = docs_as_pages(spark, "/root/testdata/sf0.001")
    edges = webgraph.domain_edges(pages)
    und = [(r.a, r.b, r.w) for r in webgraph.undirected_edges(edges).collect()]
    got = {r.domain: r.community
           for r in webgraph.lpa_communities(edges).collect()}
    assert got == _py_lpa(und, webgraph.LPA_ITERS)


# ---------------------------------------------------------------- deepwalk --


def _py_walks(edge_pairs, steps, walks):
    """Python twin of dq.webgraph.deepwalk_corpus."""
    from dq.classifier import POLY_MOD, POLY_MUL
    from dq.sampling import LCG_ADD, LCG_MUL, SAMPLE_MOD

    def poly(s):
        h = 0
        for ch in s:
            h = (h * POLY_MUL + ord(ch)) % POLY_MOD
        return h

    adj = {}
    for a, b in sorted(set(edge_pairs)):
        adj.setdefault(a, []).append(b)
    for v in adj:
        adj[v] = sorted(set(adj[v]))
    out = {}
    for start in sorted(adj):
        for wn in range(1, walks + 1):
            st = ((poly(start) + wn) * LCG_MUL + LCG_ADD) % SAMPLE_MOD
            cur, seq = start, [start]
            for _ in range(steps):
                nbrs = adj.get(cur, [])
                cur = nbrs[st % len(nbrs)] if nbrs else cur
                seq.append(cur)
                st = (st * LCG_MUL + LCG_ADD) % SAMPLE_MOD
            out[(start, wn)] = "->".join(seq)
    return out


def test_deepwalk_matches_python_twin(spark):
    from dq import webgraph

    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    edges = _edges_df(spark, [(x, y, 1) for x, y in pairs])
    got = {
        (r.start, r.walk_no): r.seq
        for r in webgraph.deepwalk_corpus(edges, steps=5, walks=3).collect()
    }
    assert got == _py_walks(pairs, 5, 3)


def test_deepwalk_dead_end_self_absorbs(spark):
    """'d' has no out-edges: a walk reaching it stays there (and a start
    with edges into only-dead-end space pins the behavior end-to-end)."""
    from dq import webgraph

    edges = _edges_df(spark, [("a", "d", 1)])
    got = {
        (r.start, r.walk_no): r.seq
        for r in webgraph.deepwalk_corpus(edges, steps=3, walks=1).collect()
    }
    assert got == {("a", 1): "a->d->d->d"}


def test_deepwalk_shape_on_mined_graph(spark):
    from dq import webgraph
    from dq.queries import docs_as_pages

    edges = webgraph.domain_edges(docs_as_pages(spark, "/root/testdata/sf0.001"))
    rows = webgraph.deepwalk_corpus(edges).collect()
    assert len(rows) == 20 * webgraph.DEEPWALK_WALKS
    for r in rows:
        assert len(r.seq.split("->")) == webgraph.DEEPWALK_STEPS + 1


def test_skipgram_pairs_match_python_twin(spark):
    from dq import webgraph

    walks = spark.createDataFrame(
        [("a", 1, "a->b->c->b->d"), ("x", 1, "x->y")],
        "start string, walk_no int, seq string",
    )
    got = {
        (r.center, r.context): r.pair_cnt
        for r in webgraph.skipgram_pairs(walks, window=2).collect()
    }
    from collections import Counter

    expect = Counter()
    for seq in ("a->b->c->b->d", "x->y"):
        l = seq.split("->")
        for i, c in enumerate(l):
            for j in range(max(0, i - 2), min(len(l), i + 3)):
                if j != i:
                    expect[(c, l[j])] += 1
    assert got == dict(expect)
    # symmetry of the window: (u,v) and (v,u) counts match
    for (u, v), n in got.items():
        assert got.get((v, u)) == n
