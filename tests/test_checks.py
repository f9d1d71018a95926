"""dq.checks — declarative constraint suite: violation semantics (incl.
NULL two-valuedness), single-scan compilation, fk orphans, report shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dq.checks import ORDERS_CHECKS, Check, run_checks

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, "1-URGENT", 100),
            (2, "B", -5.0, "9-BAD", 100),
            (3, None, 50.0, None, 999),
            (3, "A", 2000.0, "3-MEDIUM", None),
        ],
        "k long, status string, price double, prio string, fkc long",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(100,), (200,)], "dk long")


def _report(df, checks, dims=None):
    return {
        r.constraint: (r.n_rows, r.n_violations, r.passed)
        for r in run_checks(df, checks, dims=dims).collect()
    }


def test_row_predicate_semantics(toy):
    rep = _report(
        toy,
        [
            Check("s_not_null", "not_null", col="status"),
            Check("s_in_set", "in_set", col="status", values=("A", "B")),
            Check("p_range", "in_range", col="price", lo=0.0, hi=1000.0),
            Check("prio_re", "matches", col="prio", pattern="^[1-5]-[A-Z]+$"),
        ],
    )
    # NULL counts as a violation for every value constraint (two-valued)
    assert rep["s_not_null"] == (4, 1, False)
    assert rep["s_in_set"] == (4, 1, False)      # only the NULL row violates
    assert rep["p_range"] == (4, 2, False)        # -5 and 2000
    assert rep["prio_re"] == (4, 2, False)        # "9-BAD" and NULL


def test_unique_counts_non_null_dupes(toy):
    rep = _report(toy, [Check("k_unique", "unique", col="k")])
    # 4 non-null keys, 3 distinct -> 1 violation
    assert rep["k_unique"] == (4, 1, False)


def test_min_rows_both_sides(toy):
    rep = _report(
        toy,
        [Check("ge3", "min_rows", n=3), Check("ge5", "min_rows", n=5)],
    )
    assert rep["ge3"] == (4, 0, True)
    assert rep["ge5"] == (4, 1, False)


def test_fk_orphans_null_exempt(toy, dim):
    rep = _report(
        toy,
        [Check("fk", "fk", col="fkc", dim="d", dim_col="dk")],
        dims={"d": dim},
    )
    # 999 is the only orphan; the NULL fk row is exempt by definition
    assert rep["fk"] == (4, 1, False)


def test_passing_suite(spark):
    clean = spark.createDataFrame([(1, "A"), (2, "B")], "k long, status string")
    rep = _report(
        clean,
        [
            Check("k_unique", "unique", col="k"),
            Check("s_set", "in_set", col="status", values=("A", "B")),
            Check("ge1", "min_rows", n=1),
        ],
    )
    assert all(passed for _, _, passed in rep.values())
    assert all(v == 0 for _, v, _ in rep.values())


def test_orders_suite_single_scan(spark):
    """All row-predicate + unique cells compile into ONE aggregate over one
    scan of orders: the plan contains exactly one orders file scan."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    no_fk = [c for c in ORDERS_CHECKS if c.kind != "fk"]
    rep_df = run_checks(orders, no_fk)
    plan = rep_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") == 1
    rep = {r.constraint: r for r in rep_df.collect()}
    assert len(rep) == len(no_fk)
    # the synthetic orders table satisfies the shape suite
    assert rep["orderkey_not_null"].passed
    assert rep["status_in_set"].passed
    assert rep["at_least_100_rows"].passed


def test_report_is_constraint_rows_only(toy, dim):
    rep_df = run_checks(
        toy,
        [Check("s_not_null", "not_null", col="status"),
         Check("fk", "fk", col="fkc", dim="d", dim_col="dk")],
        dims={"d": dim},
    )
    assert rep_df.columns == ["constraint", "n_rows", "n_violations", "passed"]
    assert rep_df.count() == 2
    # verdicts are two-valued: no NULL booleans ever reach the report
    assert rep_df.where(F.col("passed").isNull()).count() == 0


def test_unknown_kind_raises(toy):
    with pytest.raises(ValueError):
        run_checks(toy, [Check("bogus", "approx_quantile", col="k")])


# ------------------------------------------------------------ k-anonymity --


def test_k_anonymity_flags_small_groups_only(spark):
    from dq.checks import k_anonymity_violations

    rows = (
        [("a", "en")] * 5      # exactly k -> safe
        + [("a", "pt")] * 4    # k-1 -> flagged
        + [("b", "en")] * 1    # singleton -> flagged
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        (r.source, r.lang): r.group_n
        for r in k_anonymity_violations(df, ["source", "lang"], k=5).collect()
    }
    assert got == {("a", "pt"): 4, ("b", "en"): 1}


def test_k_anonymity_null_qi_is_its_own_group(spark):
    """NULL lang is a linkable value: it must group and flag like any
    other, never vanish from the audit."""
    from dq.checks import k_anonymity_violations

    rows = [("a", None)] * 3 + [("a", "en")] * 9
    df = spark.createDataFrame(rows, "source string, lang string")
    got = k_anonymity_violations(df, ["source", "lang"], k=5).collect()
    assert [(r.source, r.lang, r.group_n) for r in got] == [("a", None, 3)]
