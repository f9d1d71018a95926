"""Events analytics: funnel semantics vs the python twin, active windows."""

import datetime as dt

from pyspark.sql import functions as F

from dq import events

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    """rows = (user_id, minutes_after_T0, event_type)."""
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), e) for u, m, e in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


def _lcg_rows(n_users=60, per_user=8):
    """Deterministic pseudo-random event log exercising all orderings."""
    rows, state = [], 12345
    types = events.FUNNEL_STEPS + ["noise"]
    for u in range(n_users):
        for _ in range(per_user):
            state = (state * 1103515245 + 12345) % (1 << 31)
            minute = state % 10_000
            etype = types[(state >> 8) % len(types)]
            rows.append((u, minute, etype))
    return rows


def test_funnel_matches_python_twin(spark):
    rows = _lcg_rows()
    got = sorted(
        tuple(r) for r in events.funnel_counts(_ev(spark, rows)).collect()
    )
    # python twin takes epoch-comparable ts; minutes compare the same way
    want = sorted(events.funnel_counts_py([(u, m, e) for u, m, e in rows]))
    assert got == want


def test_funnel_step_order_enforced(spark):
    rows = [
        # u0 completes in order
        (0, 0, "view"), (0, 1, "click"), (0, 2, "purchase"),
        # u1 has every type but purchase precedes click: stops at click
        (1, 0, "view"), (1, 5, "click"), (1, 3, "purchase"),
        # u2 never views: reaches nothing
        (2, 0, "click"), (2, 1, "purchase"),
        # u3 same-timestamp chain counts (ts >= bound is inclusive)
        (3, 7, "view"), (3, 7, "click"), (3, 7, "purchase"),
    ]
    out = {r.step: r.n_users for r in events.funnel_counts(_ev(spark, rows)).collect()}
    assert out == {"view": 3, "click": 3, "purchase": 2}


def test_funnel_greedy_earliest_is_optimal(spark):
    # u0's first click is BEFORE its view; greedy binds to the earliest
    # view then finds the later click — conversion still counted.
    rows = [(0, 5, "click"), (0, 10, "view"), (0, 20, "click"), (0, 30, "purchase")]
    out = {r.step: r.n_users for r in events.funnel_counts(_ev(spark, rows)).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 1}
    # conversion_bp from step 1
    bp = {r.step: r.conversion_bp for r in events.funnel_counts(_ev(spark, rows)).collect()}
    assert bp == {"view": events.FUNNEL_BP, "click": events.FUNNEL_BP,
                  "purchase": events.FUNNEL_BP}


def test_funnel_empty_and_zero_division(spark):
    df = _ev(spark, [(0, 0, "noise")])
    out = {r.step: (r.n_users, r.conversion_bp)
           for r in events.funnel_counts(df).collect()}
    # greatest(n1, 1) guards the division; all-zero funnel is well-defined
    assert out == {s: (0, 0) for s in events.FUNNEL_STEPS}


def test_funnel_single_user_exchange(spark):
    """One hashpartitioning exchange (user_id) feeds the windows AND the
    per-user rollup; the only other exchange is the steps-sized final agg."""
    df = events.funnel_counts(_ev(spark, _lcg_rows(n_users=10)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_hash = plan.count("hashpartitioning(")
    assert n_hash == 1, plan


def test_active_windows_match_python_twin(spark):
    rows, state = [], 999
    for u in range(40):
        for _ in range(5):
            state = (state * 1103515245 + 12345) % (1 << 31)
            rows.append((u, state % 45, "view"))
    got = sorted(
        tuple(r)
        for r in events.active_user_windows(_ev(spark, [(u, d * 1440, "view") for u, d, _ in rows])).collect()
    )
    want = sorted(
        events.active_user_windows_py(
            [(u, (T0 + dt.timedelta(days=d)).date()) for u, d, _ in rows]
        )
    )
    assert got == want


def test_active_windows_single_user(spark):
    out = events.active_user_windows(_ev(spark, [(1, 0, "view")])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.day, r.dau, r.wau, r.mau, r.stickiness_bp) == (
        "20240101", 1, 1, 1, events.ACTIVE_BP
    )


def test_active_windows_rolling_membership(spark):
    # u1 active day0 only; u2 active day6 only. On day6: dau=1 (u2),
    # wau=2 (day0 is within the 7-day window ending day6), mau=2.
    rows = [(1, 0, "view"), (2, 6 * 1440, "view")]
    out = {r.day: r for r in events.active_user_windows(_ev(spark, rows)).collect()}
    assert out["20240101"].dau == 1 and out["20240101"].wau == 1
    d6 = out["20240107"]
    assert (d6.dau, d6.wau, d6.mau) == (1, 2, 2)
    assert d6.stickiness_bp == 1 * events.ACTIVE_BP // 2


def test_cube_grains_reconcile(spark):
    """Every CUBE grain must reconcile with the grand total."""
    from dq.queries import events_cube_report

    out = events_cube_report(spark, "/root/testdata/sf0.001").collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r.gid, []).append(r)
    total = by_gid[3][0]
    assert len(by_gid[3]) == 1
    assert total.event_type == "ALL" and total.day == "ALL"
    for gid in (0, 1, 2):
        assert sum(r.n_events for r in by_gid[gid]) == total.n_events
        assert sum(r.sum_value_cents for r in by_gid[gid]) == total.sum_value_cents
    # rolled-up labels come from the grouping flag, not data
    assert all(r.day == "ALL" for r in by_gid[1])
    assert all(r.event_type == "ALL" for r in by_gid[2])


def test_moving_windows_gap_semantics(spark):
    """RANGE frame shrinks across calendar gaps; lag is previous OBSERVED
    day; first-row prev coalesces to 0."""
    import tempfile

    from dq.queries import events_moving_windows

    rows = (
        [(1, d * 1440, "view") for d in (0, 1, 2)] * 2          # days 0-2, 2 ev each
        + [(1, 20 * 1440, "view")]                              # gap, then day 20
    )

    with tempfile.TemporaryDirectory() as td:
        _ev(spark, rows).withColumnRenamed("ts", "ts").selectExpr(
            "cast(user_id as bigint) as event_id", "ts", "user_id",
            "event_type", "cast(1.0 as double) as value", "'{}' as props"
        ).write.parquet(f"{td}/events.parquet")
        out = {r.day: r for r in events_moving_windows(spark, td).collect()}
    assert out["20240101"].prev_events == 0 and out["20240101"].delta == 2
    assert out["20240103"].ma7_events == 6          # days 1-3 all in range
    d20 = out["20240121"]
    assert d20.ma7_events == 1                      # gap: window holds only day 20
    assert d20.prev_events == 2                     # previous OBSERVED day (day 2)
    assert d20.delta == -1


def test_pivot_daily_reconciles_and_no_nulls(spark):
    from dq.queries import PIVOT_TYPES, events_pivot_daily

    out = events_pivot_daily(spark, "/root/testdata/sf0.001").collect()
    assert out
    cols = [f"n_{t}" for t in PIVOT_TYPES] + ["n_other"]
    total = sum(sum(getattr(r, c) for c in cols) for r in out)
    n_events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
    assert total == n_events
    for r in out:
        for c in cols:
            assert getattr(r, c) is not None and getattr(r, c) >= 0


def test_user_set_ops_semantics(spark):
    from dq.queries import HI_VALUE, user_set_ops

    got = {r.user_id for r in user_set_ops(spark, "/root/testdata/sf0.001").collect()}
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = ev.select("user_id", "event_type", "value").collect()
    viewers = {r.user_id for r in rows if r.event_type == "view"}
    clickers = {r.user_id for r in rows if r.event_type == "click"}
    hi = {r.user_id for r in rows
          if r.event_type == "purchase" and r.value >= HI_VALUE}
    assert got == (viewers & clickers) - hi
    assert got  # non-degenerate at the gate sf


def test_props_stats_bad_parse_accounting(spark):
    """Planted malformed JSON and wrong-typed values land in n_bad; the
    parsed aggregates cover exactly the good rows."""
    from dq.queries import events_props_stats

    out = events_props_stats(spark, "/root/testdata/sf0.001").collect()
    assert out
    n_events = sum(r.n_events for r in out)
    n_bad = sum(r.n_bad for r in out)
    assert n_events == 1000
    # residues 97 and 89 both plant failures (89*k overlapping 97*j rows
    # count once) — at 1000 events that's >= 10+11-0 bad rows
    assert n_bad >= 21
    for r in out:
        assert r.n_parsed + r.n_bad == r.n_events
        assert 0 <= r.min_k <= r.max_k
        assert r.sum_k >= r.max_k  # at least one parsed row per type here
