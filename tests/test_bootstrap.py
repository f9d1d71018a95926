"""dq.bootstrap — Poisson bootstrap: python-twin bit-equality, weight
distribution sanity, CI coverage of the point estimate, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq.bootstrap import (
    BOOT_REPLICAS,
    BOOT_WEIGHT_CAP,
    POISSON1_CUM_BP,
    bootstrap_keep_rates,
    bootstrap_rates_py,
    percentile_ci,
)
from dq.heuristics import keep_expr, with_heuristic_metrics
from dq.sampling import SAMPLE_MOD


@pytest.fixture(scope="module")
def docs(pages):
    """Pages corpus with deterministic integer ids: the heuristic gate
    keeps ~70% of it (the sf* documents tables keep 0% — degenerate for a
    CI test), so the replica spread is a real sampling distribution."""
    from pyspark.sql import Window

    w = Window.orderBy("url")
    df = (
        pages.select(F.row_number().over(w).cast("bigint").alias("doc_id"), "text")
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def rates(docs):
    return {
        r.replica: (r.w_total, r.keep_w, r.keep_rate_bp)
        for r in bootstrap_keep_rates(docs).collect()
    }


def test_python_twin_bit_equality(docs, rates):
    m = with_heuristic_metrics(docs.select("doc_id", "text"))
    keep = [
        (r.doc_id, r.k)
        for r in m.select(
            "doc_id", keep_expr().alias("k")
        ).collect()
    ]
    assert rates == bootstrap_rates_py(keep)


def test_thresholds_are_poisson1_cdf():
    """The integer thresholds really are floor(SAMPLE_MOD * e^-1 * cdf) —
    the constant table cannot silently drift from the math."""
    import math

    cum = 0.0
    fact = 1
    for k, t in enumerate(POISSON1_CUM_BP):
        if k > 0:
            fact *= k
        cum += math.exp(-1) / fact
        assert t == int(cum * SAMPLE_MOD)


def test_replica_weights_look_poisson(docs, rates):
    """Mean replica weight ~ n * E[w] (E[w] ~ 0.996 with the cap-at-4
    fold-in); every replica is within a loose CLT band."""
    n = docs.count()
    e_w = sum(
        k * ((POISSON1_CUM_BP + [SAMPLE_MOD])[k] - ([0] + POISSON1_CUM_BP)[k])
        for k in range(BOOT_WEIGHT_CAP)
    ) / SAMPLE_MOD + BOOT_WEIGHT_CAP * (SAMPLE_MOD - POISSON1_CUM_BP[-1]) / SAMPLE_MOD
    assert len(rates) == BOOT_REPLICAS
    for wt, _, _ in rates.values():
        assert abs(wt - n * e_w) < 6 * (n ** 0.5)


def test_ci_brackets_point_estimate(docs, rates):
    m = with_heuristic_metrics(docs.select("doc_id", "text"))
    kept = m.where(keep_expr()).count()
    point_bp = 10000 * kept // docs.count()
    lo, hi = percentile_ci([bp for _, _, bp in rates.values()])
    assert lo <= point_bp <= hi
    assert lo < hi  # the corpus keep rate is not degenerate


def test_percentile_ci_order_stats():
    assert percentile_ci(list(range(100))) == (2, 97)
    assert percentile_ci([5]) == (5, 5)


def test_weights_within_cap(rates):
    for wt, kw, bp in rates.values():
        assert 0 <= kw <= wt
        assert 0 <= bp <= 10000


def test_plan_shape(docs):
    """Text never enters an exchange: the replica explode happens after the
    metric projection, so only (replica, k, w) scalars shuffle."""
    df = bootstrap_keep_rates(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in ex
    assert df.count() == BOOT_REPLICAS
