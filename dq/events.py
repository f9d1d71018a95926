"""Events analytics: sequential funnel and rolling active-user windows.

Clickstream additions in the reference's volumetry spirit (the reference
counts rows per partition — SURVEY.md §2.11; these lift the same
scorecard discipline to user grain): the ordered-step conversion funnel
and the DAU/WAU/MAU activity windows every events warehouse publishes
next to its volumetry. Both are exact-integer and oracle twinned.

Funnel semantics (the standard "windowed funnel" with an unbounded
window): a user reaches step k when there is an event of step k's type
at-or-after the time they reached step k-1; the reach time is the
EARLIEST such event (greedy-earliest matching, the classic funnel
definition — earliest completion is monotone, so greedy is optimal and
the verdict is order-independent). Output is one row per step with the
distinct-user reach count and the conversion from step 1 in basis
points — integers only, bit-identical cross-engine (timestamp min/compare
is exact; no durations divided).

Active-window semantics: DAU(d) = distinct users active on day d;
WAU(d)/MAU(d) = distinct users active in the ACTIVE_W/ACTIVE_M days
ending at d. stickiness_bp = DAU * ACTIVE_BP DIV MAU (the DAU/MAU ratio
product teams track). Only days that actually appear in the corpus are
reported (leading windows are truncated by data availability — a
property of the data, not an epsilon hack; both engines agree).

Scale shape (100 TB notes):
- funnel: the step filter prunes the scan to the step types; ONE
  user_id exchange feeds all three window mins AND the per-user rollup
  (same key — no second exchange); exchange width is (user_id, ts,
  event_type) ~ 20 B. The final frame is steps-sized. Hot users (bots)
  are bounded by their own event history — same caveat + same
  per-(user, day) pre-split remedy as dq.sessions.
- active windows: the heavy reduction to user-day grain happens FIRST
  (distinct on (user_id, day) — map-side combinable), then the window
  fan-out multiplies the ALREADY-REDUCED grain by ACTIVE_M: at 10^9
  user-days and M=28 that is a 16-B-row explode the next distinct
  absorbs; text never appears. Exact rolling distinct fundamentally
  needs user x window pairs — for approximate-at-scale, merge per-day
  HLL sketches instead (dq.sketch has the mergeable-state tier); this
  op is the exact path and says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---- shared constants (dq.oracles generates SQL from these) ----------------

FUNNEL_STEPS = ["view", "click", "purchase"]  # ordered step event types
FUNNEL_BP = 10_000   # fixed-point scale for conversion ratios

ACTIVE_W = 7         # WAU window, days (ending at the report day)
ACTIVE_M = 28        # MAU window, days
ACTIVE_BP = 10_000   # fixed-point scale for stickiness


def funnel_reach(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Per-user step reach times: (user_id, t1..tn) — tk is the earliest
    event of steps[k-1]'s type at-or-after t(k-1), NULL when never
    reached. One user_id exchange shared by every window min."""
    steps = steps or FUNNEL_STEPS
    w = Window.partitionBy("user_id")
    cur = events.where(F.col("event_type").isin(steps)).select(
        "user_id", "ts", "event_type"
    )
    prev_t = None
    for k, step in enumerate(steps, 1):
        cond = F.col("event_type") == step
        if prev_t is not None:
            cond = cond & (F.col("ts") >= F.col(prev_t))
        cur = cur.withColumn(f"t{k}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev_t = f"t{k}"
    return cur.groupBy("user_id").agg(
        *[F.max(f"t{k}").alias(f"t{k}") for k in range(1, len(steps) + 1)]
    )


def funnel_counts(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """(step_idx, step, n_users, conversion_bp) — one row per funnel step;
    conversion_bp = n_users * FUNNEL_BP DIV n_users(step 1)."""
    steps = steps or FUNNEL_STEPS
    reach = funnel_reach(events, steps)
    totals = reach.agg(
        *[
            F.count(f"t{k}").cast("bigint").alias(f"n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    stack_args = ", ".join(
        f"{k}L, '{s}', n{k}" for k, s in enumerate(steps, 1)
    )
    return totals.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step_idx, step, n_users)"
        ),
        F.col("n1"),
    ).select(
        "step_idx",
        "step",
        "n_users",
        F.expr(f"CAST(n_users * {FUNNEL_BP} AS BIGINT)"
               " DIV greatest(n1, 1)").alias("conversion_bp"),
    )


def active_user_windows(events: DataFrame) -> DataFrame:
    """(day, dau, wau, mau, stickiness_bp) per observed activity day.

    A user active on day a contributes to the W/M windows of days
    a..a+W-1 / a..a+M-1; the contribution explode runs over the
    user-day grain (already distinct), and the per-window distinct
    collapses multi-day users. Constant-size sequence() arrays are safe
    under explode (the inferred size() filter constant-folds —
    CLAUDE.md)."""
    act = (
        events.select("user_id", F.to_date("ts").alias("_day")).distinct()
    )
    dau = act.groupBy("_day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))

    def rolled(window_days: int, out: str) -> DataFrame:
        contrib = act.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("_i"),
            "_day",
        ).select("user_id", F.expr("date_add(_day, _i)").alias("_day"))
        return (
            contrib.distinct()
            .groupBy("_day")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    return (
        dau.join(rolled(ACTIVE_W, "wau"), "_day")
        .join(rolled(ACTIVE_M, "mau"), "_day")
        .select(
            F.date_format("_day", "yyyyMMdd").alias("day"),
            "dau",
            "wau",
            "mau",
            F.expr(f"CAST(dau * {ACTIVE_BP} AS BIGINT) DIV mau").alias(
                "stickiness_bp"
            ),
        )
    )


# ---- pure-python twins (the pytest oracle) ----------------------------------


def funnel_counts_py(
    rows: list[tuple[int, float, str]], steps: list[str] | None = None
) -> list[tuple[int, str, int, int]]:
    """rows = (user_id, ts_epoch, event_type); returns the funnel table."""
    steps = steps or FUNNEL_STEPS
    per_user: dict[int, list[tuple[float, str]]] = {}
    for uid, ts, et in rows:
        if et in steps:
            per_user.setdefault(uid, []).append((ts, et))
    reached = [0] * len(steps)
    for evs in per_user.values():
        bound = None
        for k, step in enumerate(steps):
            cands = [t for t, et in evs if et == step and (bound is None or t >= bound)]
            if not cands:
                break
            bound = min(cands)
            reached[k] += 1
    n1 = max(reached[0], 1)
    return [
        (k + 1, s, reached[k], reached[k] * FUNNEL_BP // n1)
        for k, s in enumerate(steps)
    ]


def active_user_windows_py(
    rows: list[tuple[int, "object"]]
) -> list[tuple[str, int, int, int, int]]:
    """rows = (user_id, date); returns (day, dau, wau, mau, stickiness_bp)."""
    import datetime as _dt

    act = {(u, d) for u, d in rows}
    days = sorted({d for _, d in act})
    out = []
    for d in days:
        dau = len({u for u, a in act if a == d})
        wau = len({u for u, a in act if _dt.timedelta(0) <= d - a < _dt.timedelta(ACTIVE_W)})
        mau = len({u for u, a in act if _dt.timedelta(0) <= d - a < _dt.timedelta(ACTIVE_M)})
        out.append((d.strftime("%Y%m%d"), dau, wau, mau, dau * ACTIVE_BP // mau))
    return out
