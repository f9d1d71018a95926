"""dq.drift — banded snapshot drift: python-twin bit-equality, zero-drift
identity, planted-shift detection, rate-mass bounds, TV summary math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq.crawldiff import (
    CHANGED_MOD,
    CHANGED_REM,
    CHANGED_SUFFIX,
    NEW_DROP_MOD,
    NEW_DROP_REM,
    OLD_DROP_MOD,
    OLD_DROP_REM,
)
from dq.drift import (
    DRIFT_BAND_WIDTH,
    DRIFT_SCALE,
    band_drift,
    band_drift_py,
    drift_summary,
)

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "n_chars"
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def snapshots(docs):
    """The crawldiff planted two-snapshot construction lifted to n_chars:
    OLD drops its planted residue, NEW drops a different one and the
    'changed' docs grow by the suffix length — a real length-shape shift."""
    did = F.col("doc_id")
    old = docs.where(did % OLD_DROP_MOD != OLD_DROP_REM).select("n_chars")
    new = docs.where(did % NEW_DROP_MOD != NEW_DROP_REM).select(
        F.when(
            did % CHANGED_MOD == CHANGED_REM,
            F.col("n_chars") + len(CHANGED_SUFFIX),
        )
        .otherwise(F.col("n_chars"))
        .alias("n_chars")
    )
    return old, new


@pytest.fixture(scope="module")
def bands(snapshots):
    old, new = snapshots
    return {
        r.band: (r.c_old, r.c_new, r.r_old_ppm, r.r_new_ppm, r.delta_ppm)
        for r in band_drift(old, new).collect()
    }


def test_python_twin_bit_equality(docs, bands):
    rows = docs.collect()
    ov = [r.n_chars for r in rows if r.doc_id % OLD_DROP_MOD != OLD_DROP_REM]
    nv = [
        r.n_chars + len(CHANGED_SUFFIX)
        if r.doc_id % CHANGED_MOD == CHANGED_REM
        else r.n_chars
        for r in rows
        if r.doc_id % NEW_DROP_MOD != NEW_DROP_REM
    ]
    assert bands == band_drift_py(ov, nv)


def test_zero_drift_identity(docs):
    """band_drift(x, x) is all-zero deltas and TV exactly 0."""
    b = band_drift(docs, docs)
    assert b.where(F.col("delta_ppm") != 0).count() == 0
    s = drift_summary(b).collect()[0]
    assert s.tv_ppm == 0 and s.n_grown == 0 and s.n_shrunk == 0


def test_planted_shift_detected(snapshots, bands):
    """The planted suffix growth + asymmetric drops must register: some
    band moved, and TV is positive."""
    old, new = snapshots
    s = drift_summary(band_drift(old, new)).collect()[0]
    assert s.tv_ppm > 0
    assert s.n_grown + s.n_shrunk <= s.n_bands
    assert any(d != 0 for *_, d in bands.values())


def test_rate_mass_bounds(bands):
    """Quantized rates each sum to SCALE within the floor remainder."""
    so = sum(ro for _, _, ro, _, _ in bands.values())
    sn = sum(rn for _, _, _, rn, _ in bands.values())
    n = len(bands)
    assert DRIFT_SCALE - n < so <= DRIFT_SCALE
    assert DRIFT_SCALE - n < sn <= DRIFT_SCALE


def test_tv_summary_is_half_abs_sum(bands, snapshots):
    old, new = snapshots
    s = drift_summary(band_drift(old, new)).collect()[0]
    assert s.tv_ppm == sum(abs(d) for *_, d in bands.values()) // 2
    assert s.n_bands == len(bands)


def test_whole_band_translation_tv_is_total(spark):
    """Shifting every value by a full band width moves ALL mass: TV hits
    the quantized maximum (SCALE minus floor dust)."""
    vals = [(i, 10 + (i % 3)) for i in range(90)]
    df = spark.createDataFrame(vals, "doc_id bigint, n_chars bigint")
    shifted = df.select(
        (F.col("n_chars") + DRIFT_BAND_WIDTH).alias("n_chars")
    )
    s = drift_summary(band_drift(df, shifted)).collect()[0]
    assert s.tv_ppm >= DRIFT_SCALE - s.n_bands


# ---------------------------------------------------------------- KS drift --


def _py_ks(a, b):
    """(ks_at, ks_num, n_old, n_new, ks_ppm) python twin of dq.drift.ks_drift."""
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    fa = fb = 0
    best = (-1, None)
    for v in sorted(set(ca) | set(cb)):
        fa += ca.get(v, 0)
        fb += cb.get(v, 0)
        num = abs(fa * nb - fb * na)
        if num > best[0]:
            best = (num, v)
    num, v = best
    return (v, num, na, nb, (num * 1_000_000) // (na * nb))


def _ks_row(spark, a, b):
    from dq.drift import ks_drift

    da = spark.createDataFrame([(v,) for v in a], "n_chars long")
    db = spark.createDataFrame([(v,) for v in b], "n_chars long")
    r = ks_drift(da, db).collect()[0]
    return (r.ks_at, r.ks_num, r.n_old, r.n_new, r.ks_ppm)


def test_ks_matches_python_twin(spark):
    a = [10, 10, 20, 30, 30, 30, 40]
    b = [10, 20, 20, 20, 40, 50]
    assert _ks_row(spark, a, b) == _py_ks(a, b)


def test_ks_identical_distributions_zero(spark):
    a = [5, 5, 7, 9]
    got = _ks_row(spark, a, a)
    assert got[1] == 0 and got[4] == 0
    assert got[0] == 5  # min-value tie-break across the all-zero sups


def test_ks_disjoint_distributions_is_one(spark):
    got = _ks_row(spark, [10, 10, 10], [20, 20])
    assert got == (10, 6, 3, 2, 1_000_000)  # D = 1 exactly at v=10


def test_ks_detects_within_band_shift(spark):
    """The scenario band TV misses: a +5-char shift inside one
    DRIFT_BAND_WIDTH=40 band — banded TV is 0, KS is not."""
    from dq.drift import DRIFT_BAND_WIDTH, band_drift_py

    a = [100] * 50
    b = [105] * 50
    assert 100 // DRIFT_BAND_WIDTH == 105 // DRIFT_BAND_WIDTH
    bands = band_drift_py(a, b)
    assert all(d[4] == 0 for d in bands.values())  # TV blind
    got = _ks_row(spark, a, b)
    assert got[1] > 0 and got[4] == 1_000_000  # KS sees total separation


# ------------------------------------------------------------ rank sum (U) --


def _u_row(spark, a, b):
    from dq.drift import rank_sum_drift

    da = spark.createDataFrame([(v,) for v in a], "n_chars long")
    db = spark.createDataFrame([(v,) for v in b], "n_chars long")
    r = rank_sum_drift(da, db).collect()[0]
    return (r.n_old, r.n_new, r.u2_old, r.u2_new, r.cles_ppm)


def _py_u2(a, b):
    """Doubled Mann-Whitney U via explicit midranks (scipy-free twin)."""
    vals = sorted(a + b)
    # doubled midrank per value: first+last 1-based rank holding it
    first = {}
    for i, v in enumerate(vals, 1):
        first.setdefault(v, i)
    last = {}
    for i, v in enumerate(vals, 1):
        last[v] = i
    m2 = {v: first[v] + last[v] for v in first}
    r2a = sum(m2[v] for v in a)
    r2b = sum(m2[v] for v in b)
    na, nb = len(a), len(b)
    return r2a - na * (na + 1), r2b - nb * (nb + 1)


def test_u_matches_python_twin_with_ties(spark):
    a = [10, 10, 20, 30, 30, 40]
    b = [10, 20, 20, 50, 50]
    na, nb, u2a, u2b, cles = _u_row(spark, a, b)
    assert (u2a, u2b) == _py_u2(a, b)
    assert u2a + u2b == 2 * na * nb  # the U partition invariant
    assert cles == u2a * 1_000_000 // (2 * na * nb)


def test_u_total_separation(spark):
    """All of NEW above all of OLD: U_old = 0, cles = 0; flipped: 1e6."""
    assert _u_row(spark, [1, 2, 3], [10, 20]) == (3, 2, 0, 12, 0)
    assert _u_row(spark, [10, 20], [1, 2, 3]) == (2, 3, 12, 0, 1_000_000)


def test_u_identical_distributions_is_half(spark):
    a = [5, 7, 7, 9]
    na, nb, u2a, u2b, cles = _u_row(spark, a, a)
    assert u2a == u2b and cles == 500_000
