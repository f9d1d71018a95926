"""Gap-based sessionization: planted sessions, tie-breaks, plan shape."""

from __future__ import annotations

import datetime as dt

from dq.sessions import SESSION_GAP_SECONDS, session_rollup, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, uid, sec, value=1.0):
    return (eid, T0 + dt.timedelta(seconds=sec), uid, "click", value, "{}")


SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def test_sessionize_planted_gaps(spark):
    gap = 100
    rows = [
        _ev(1, 7, 0),
        _ev(2, 7, 50),          # same session (gap 50 <= 100)
        _ev(3, 7, 151),         # new (gap 101 > 100)
        _ev(4, 7, 251),         # same (gap exactly 100 — NOT new)
        _ev(5, 9, 0),           # other user starts its own session 1
    ]
    out = {r.event_id: r.session_idx for r in sessionize(
        spark.createDataFrame(rows, SCHEMA), gap_seconds=gap).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_tie_break_on_event_id(spark):
    # two events at the identical timestamp: (ts, event_id) order makes the
    # assignment deterministic regardless of input order
    rows = [_ev(2, 7, 0), _ev(1, 7, 0), _ev(3, 7, 10)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted((r.event_id, r.session_idx) for r in sessionize(df, 5).collect())
    b = sorted(
        (r.event_id, r.session_idx)
        for r in sessionize(df.orderBy("event_id"), 5).collect()
    )
    assert a == b == [(1, 1), (2, 1), (3, 2)]


def test_session_rollup_values(spark):
    rows = [
        _ev(1, 7, 0, 1.25),
        _ev(2, 7, 30, 2.50),
        _ev(3, 7, 10_000_000, 0.99),  # far later: own session
    ]
    out = {
        (r.user_id, r.session_idx): r
        for r in session_rollup(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    s1, s2 = out[(7, 1)], out[(7, 2)]
    assert (s1.n_events, s1.span_sec, s1.cents_total) == (2, 30, 375)
    assert (s2.n_events, s2.span_sec, s2.cents_total) == (1, 0, 99)


def test_session_rollup_single_exchange(spark):
    df = spark.createDataFrame([_ev(1, 7, 0)], SCHEMA)
    plan = (
        session_rollup(df, SESSION_GAP_SECONDS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # window + rollup share it


def test_native_session_window_agrees(spark):
    """Spark's built-in session_window must produce the same grouping as
    the lag-window rule away from the exact-gap boundary (built-in window
    half-open: a gap of exactly `gap` splits; our rule keeps it — planted
    gaps avoid the boundary). Cross-validates dq.sessions against the
    native operator on both counts and session spans."""
    from pyspark.sql import functions as F

    from dq.sessions import SESSION_GAP_SECONDS as GAP

    rows = []
    sec = 0
    eid = 0
    for uid in (3, 4):
        sec = 0
        for gap in (10, GAP - 1, GAP + 1, 5, GAP * 2, 1):
            rows.append(_ev(eid := eid + 1, uid, sec))
            sec += gap
        rows.append(_ev(eid := eid + 1, uid, sec))
    df = spark.createDataFrame(rows, SCHEMA)
    ours = sorted(
        (r.user_id, r.n_events, r.span_sec) for r in session_rollup(df).collect()
    )
    native = sorted(
        (r["user_id"], r["count"], r["span"])
        for r in df.groupBy(
            "user_id", F.session_window("ts", f"{GAP} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("count"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("span"),
        )
        .collect()
    )
    assert ours == native
