"""Join operators beyond the reference's left-equi family (SURVEY.md §2.3):
as-of join and range join — the time-series shapes a crawl/event pipeline
needs that Spark lacks as primitives.

Both are compositions of existing DataFrame ops (SURVEY-mandated
preference): no UDFs, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: each left row picks the right row with the greatest
    ``right_time`` <= ``left_time`` for the same key (NULLs when none).

    Scale shape — the union-merge formulation: tag both sides, union, ONE
    shuffle by key, sort within partition by (time, side), and carry the
    latest right ROW forward as a single struct with last(ignoreNulls) over
    an unbounded preceding window. Cost is a single exchange + sort of
    |L|+|R| rows — never the O(|L|x|R|) range explosion of an inequality
    join, and no per-key driver loop. Right rows must be unique per
    (key, time) for deterministic output (pre-aggregate ties away).

    The carried value is one STRUCT, not per-column lasts: per-column
    ignoreNulls would skip a newer matching row's NULL column and reach
    back to an older row's value, stitching together a right row that
    never existed. The struct is non-NULL for every right row, so the
    whole match is atomic and its NULL fields stay NULL.
    """
    lcols = left.columns
    overlap = set(lcols) & set(right_cols)
    if overlap:
        raise ValueError(
            f"right_cols collide with left columns: {sorted(overlap)} — "
            "rename before joining (the output would overwrite left data)"
        )
    l = left.select(
        *lcols,
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        # programmatic type, not a DDL string: quoted/reserved column names
        # and char/varchar types survive (ADVICE r3)
        F.lit(None).cast(
            T.StructType([right.schema[c] for c in right_cols])
        ).alias("_r"),
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.struct(*right_cols).alias("_r"),
    )
    merged = l.unionByName(r, allowMissingColumns=True).withColumn(
        "_is_r", F.when(F.col("_r").isNotNull(), 1).otherwise(0)
    )
    # right rows sort before left rows at equal time => <= semantics
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *lcols,
        "_is_r",
        F.last("_r", ignorenulls=True).over(w).alias("_rc"),
    )
    return carried.where(F.col("_is_r") == 0).select(
        *lcols, *[F.col("_rc").getField(c).alias(c) for c in right_cols]
    )


def range_join_small(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    inclusive_hi: bool = True,
) -> DataFrame:
    """Band/interval join of a fact table against a SMALL ranges dimension:
    broadcast nested-loop with the inequality predicate — at any fact-table
    scale this is the right physical plan because the ranges side is tiny
    and the facts side streams through untouched (no shuffle, no explode).
    For large interval tables, bucketize both sides to an equi-join first.
    """
    v = F.col(value_col)
    hi_pred: Column = v <= F.col(hi_col) if inclusive_hi else v < F.col(hi_col)
    return facts.join(F.broadcast(ranges), (v > F.col(lo_col)) & hi_pred)
