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


# ---- algorithm-level properties for the round-5 exact operators ------------
# (pure python twins of the Spark algebra; the Spark≡python equivalence is
# pinned in test_dedup/test_webgraph/test_cmsketch — here hypothesis drives
# the MATH over thousands of random inputs)


def _ceil_frac(num: int, den: int) -> int:
    return -((-num) // den)


def _py_allpairs_prefix(sets: dict, t_num: int, t_den: int) -> set:
    """Prefix-filtered AllPairs over token SETS: rarest-first (df, token)
    order, prefix sz - ceil(t*sz) + 1, length filter, exact verify — the
    dq.dedup.allpairs_jaccard algebra."""
    from collections import Counter
    from itertools import combinations

    df = Counter()
    for s in sets.values():
        df.update(s)
    index = {}
    for i, s in sets.items():
        sz = len(s)
        ordered = sorted(s, key=lambda g: (df[g], g))
        p = sz - _ceil_frac(t_num * sz, t_den) + 1
        for g in ordered[: max(p, 1)]:
            index.setdefault(g, []).append((i, sz))
    cands = set()
    for lst in index.values():
        for (i, szi), (j, szj) in combinations(sorted(lst), 2):
            lo, hi = min(szi, szj), max(szi, szj)
            if lo * t_den >= hi * t_num:
                cands.add((i, j) if i < j else (j, i))
    out = set()
    for i, j in cands:
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if inter * t_den >= union * t_num:
            out.add((i, j))
    return out


def _py_allpairs_brute(sets: dict, t_num: int, t_den: int) -> set:
    from itertools import combinations

    out = set()
    for i, j in combinations(sorted(sets), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if inter * t_den >= union * t_num:
            out.add((i, j))
    return out


CORPUS = st.lists(
    st.frozensets(st.sampled_from([f"t{k}" for k in range(12)]), min_size=1, max_size=8),
    min_size=2,
    max_size=14,
)
THRESH = st.sampled_from([(1, 2), (3, 5), (2, 3), (4, 5), (9, 10), (1, 1)])


@settings(max_examples=300, deadline=None)
@given(CORPUS, THRESH)
def test_allpairs_prefix_filter_is_lossless(corpus, t):
    """For ANY corpus and ANY threshold num/den <= 1: prefix-filtered
    output == brute force. The 12-token vocabulary forces heavy set
    overlap — the regime where a buggy prefix bound would drop pairs."""
    t_num, t_den = t
    sets = {f"d{i:02d}": s for i, s in enumerate(corpus)}
    assert _py_allpairs_prefix(sets, t_num, t_den) == _py_allpairs_brute(
        sets, t_num, t_den
    )


def _py_oriented_triangles(edges: set) -> dict:
    """Degree-oriented per-node triangle counts — the
    dq.webgraph.triangle_stats algebra."""
    from collections import Counter

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    oriented = {}
    for a, b in und:
        u, x = (a, b) if (deg[a], a) < (deg[b], b) else (b, a)
        oriented.setdefault(u, []).append(x)
    tri = Counter({v: 0 for v in deg})
    for u, outs in oriented.items():
        outs = sorted(outs)
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                v, w = outs[i], outs[j]
                if (v, w) in und:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    return dict(tri)


def _py_brute_triangles(edges: set) -> dict:
    from itertools import combinations

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    tri = {v: 0 for v in nodes}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in und and (y, z) in und and (x, z) in und:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    return tri


GRAPH = st.sets(
    st.tuples(st.sampled_from("abcdefghij"), st.sampled_from("abcdefghij")),
    max_size=30,
)


@settings(max_examples=300, deadline=None)
@given(GRAPH)
def test_triangle_orientation_enumerates_exactly_once(edges):
    """Degree-oriented enumeration == brute-force combinations on random
    graphs (including self-loops to drop and directed duplicates)."""
    assert _py_oriented_triangles(edges) == _py_brute_triangles(edges)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.sampled_from([f"w{k}" for k in range(9)]), max_size=60))
def test_cm_sketch_invariants(stream):
    """CM never underestimates, and sketch(A+B) == sketch(A) + sketch(B)."""
    from collections import Counter

    from tests.test_cmsketch import _py_estimate, _py_sketch

    sk = _py_sketch(stream)
    exact = Counter(stream)
    for w, c in exact.items():
        assert _py_estimate(sk, w) >= c
    half = len(stream) // 2
    a, b = _py_sketch(stream[:half]), _py_sketch(stream[half:])
    merged = Counter(a)
    merged.update(b)
    assert dict(merged) == sk


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**12), max_size=50))
def test_benford_deviations_sum_to_zero(vals):
    """Σ_d dev_micro == 0 EXACTLY for any input: Σobs·1e6 = N·1e6 and the
    micro-proportions sum to exactly 1e6 — the spine-constant property the
    rounding was chosen for."""
    from collections import Counter

    from dq.metrics import BENFORD_MICRO

    pos = [v for v in vals if v > 0]
    n = len(pos)
    obs = Counter(int(str(v)[0]) for v in pos)
    devs = [
        obs.get(d, 0) * 1_000_000 - BENFORD_MICRO[d - 1] * n for d in range(1, 10)
    ]
    assert sum(devs) == 0
