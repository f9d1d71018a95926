"""Gap-based sessionization over the events stream.

Classic web-analytics operator (reference scope is table-level DQ; this is
an engine addition from the clickstream family): an event starts a new
session for its user when more than SESSION_GAP_SECONDS passed since the
user's previous event. Session index = running count of session starts per
user; per-session rollup gives span, event count and money total.

Determinism: events order by (ts, event_id) — the tie-break makes the lag
window identical on both engines; money quantizes to cents with
floor(x*100) BEFORE summing (CLAUDE.md cross-engine rule); the span is an
exact epoch-seconds difference.

Scale shape (100 TB notes): the lag window and the rollup both key on
user_id — ONE shuffle, reused by both steps (the rollup's (user_id,
session_idx) keys are a superset of the window partitioning, no second
exchange). Per-user data is bounded by a user's event history; for
adversarially hot keys (bot accounts), pre-split the stream by (user_id,
day) — sessions never span the gap anyway when the split granularity
exceeds SESSION_GAP_SECONDS — or cap per-user history upstream. The
events row never carries text; exchange width is the event row itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 6 * 3600  # a new session after >6h of inactivity


def sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """All input columns + ``session_idx``.

    session_idx is 1-based per user in (ts, event_id) order; an event opens
    a new session when epoch(ts) - epoch(prev ts) > gap_seconds. The lag
    and the running sum share one window spec — a single sort under a
    single user_id exchange.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ep = F.lag(F.unix_timestamp("ts")).over(w)
    starts = F.when(
        prev_ep.isNull() | (F.unix_timestamp("ts") - prev_ep > gap_seconds), 1
    ).otherwise(0)
    return (
        events.withColumn("_new", starts)
        .withColumn(
            "session_idx",
            F.sum("_new")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
        .drop("_new")
    )


def session_rollup(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Per-session aggregates: event count, exact epoch-second span, cents
    total. Keys (user_id, session_idx) refine the sessionize window's
    partitioning, so the rollup is a partial-agg on already-shuffled data —
    no second exchange."""
    ep = F.unix_timestamp("ts")
    return sessionize(events, gap_seconds).groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max(ep) - F.min(ep)).cast("bigint").alias("span_sec"),
        F.sum(F.floor(F.col("value") * 100)).cast("bigint").alias("cents_total"),
    )
