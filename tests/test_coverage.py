"""Greedy max-coverage selection: python twin, tie-breaks, saturation."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dq.coverage import GC_K, greedy_coverage


def _py_greedy(pairs, k):
    """(round, source, gain, covered_total) python twin of greedy_coverage."""
    by_src = {}
    for s, w in pairs:
        by_src.setdefault(s, set()).add(w)
    covered = set()
    out = []
    for r in range(1, k + 1):
        gains = {s: len(ws - covered) for s, ws in by_src.items()}
        gains = {s: g for s, g in gains.items() if g > 0}
        if not gains:
            break
        pick = min(gains, key=lambda s: (-gains[s], s))
        covered |= by_src[pick]
        out.append((r, pick, gains[pick], len(covered)))
    return out


def _pairs_df(spark, pairs):
    return spark.createDataFrame(list(pairs), "source string, w string").distinct()


def test_greedy_coverage_matches_python_twin(spark):
    pairs = (
        [("a", f"w{i}") for i in range(10)]
        + [("b", f"w{i}") for i in range(5, 17)]   # 12 tokens, 5 overlap a
        + [("c", f"w{i}") for i in range(15, 20)]  # 5 tokens, 2 overlap b
        + [("d", "w0"), ("d", "w1")]               # fully dominated
    )
    got = [
        (r.sel_round, r.source, r.gain, r.covered_total)
        for r in greedy_coverage(_pairs_df(spark, pairs), k=4)
        .orderBy("sel_round")
        .collect()
    ]
    assert got == _py_greedy(pairs, 4)
    # greedy must NOT just take the biggest sets: round 2's gain excludes
    # the overlap with round 1's pick
    assert got[0][1] == "b" and got[0][2] == 12
    assert got[1] == (2, "a", 5, 17)


def test_greedy_coverage_tie_break_min_source(spark):
    pairs = [("zed", "x"), ("zed", "y"), ("amy", "p"), ("amy", "q")]
    got = greedy_coverage(_pairs_df(spark, pairs), k=1).collect()
    assert [(r.source, r.gain) for r in got] == [("amy", 2)]


def test_greedy_coverage_saturation_emits_no_row(spark):
    """Once every source's marginal is zero the round vanishes — k=4 over
    two sources with identical vocab yields exactly ONE row."""
    pairs = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    got = greedy_coverage(_pairs_df(spark, pairs), k=4).collect()
    assert [(r.sel_round, r.source, r.gain, r.covered_total) for r in got] == [
        (1, "a", 2, 2)
    ]


PAIRS = st.lists(
    st.tuples(st.sampled_from("abcde"), st.sampled_from([f"w{k}" for k in range(15)])),
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(PAIRS)
def test_greedy_gains_non_increasing_and_cover_union(pairs):
    """Pure-python twin properties: greedy marginal gains are
    non-increasing (submodularity), covered_total telescopes to the union
    of picked sources' sets, and every gain is positive."""
    out = _py_greedy(set(pairs), 5)
    gains = [g for _, _, g, _ in out]
    assert all(g > 0 for g in gains)
    assert all(gains[i] >= gains[i + 1] for i in range(len(gains) - 1))
    by_src = {}
    for s, w in set(pairs):
        by_src.setdefault(s, set()).add(w)
    picked = set()
    for r, s, g, tot in out:
        picked |= by_src[s]
        assert tot == len(picked)
