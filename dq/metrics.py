"""Grouped profiling aggregations — the reference's qualitativo family.

VivoPlay/VivoMoney/VivoEyes (qualitativo/VivoPlay.scala:81-195 etc.) are all
the same shape: bucketize a value column with a CASE chain, then group and
compute [conditional] distinct counts, [conditional] sums, decimal ratios.
Here that shape is ONE spec-driven builder over native expressions: the
bucket column is computed first (so grouping is on a plain column, not a
repeated CASE — A10), and every aggregate is a single-pass hash aggregate
with map-side partials. DISTINCT aggs at 10^12 scale should flip to
approx_count_distinct (provided as an option).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_col(value: Column, edges: list[float], labels: list[str] | None = None) -> Column:
    """CASE-chain bucketizer (≙ the 12-band histogram VivoPlay.scala:173-186).

    ``edges`` are ascending upper bounds; label i covers
    (edges[i-1], edges[i]]; an ``over_<last>`` band catches the tail.
    """
    labels = labels or [f"<= {e:g}" for e in edges] + [f"> {edges[-1]:g}"]
    # NULL value -> NULL band: without the guard every when() is NULL (not
    # true) and the CASE falls through to the overflow label, silently
    # counting missing values in the top band
    expr = F.when(value.isNull(), F.lit(None).cast("string")).when(
        value <= F.lit(edges[0]), F.lit(labels[0])
    )
    for i in range(1, len(edges)):
        expr = expr.when(value <= F.lit(edges[i]), F.lit(labels[i]))
    return expr.otherwise(F.lit(labels[len(edges)]))


def value_band_histogram(
    df: DataFrame, value_col: str, edges: list[float], group_cols: list[str] | None = None
) -> DataFrame:
    """Histogram over value bands (A11): bucket first, then hash-agg count."""
    banded = df.withColumn("valor_faixa", band_col(F.col(value_col), edges))
    keys = (group_cols or []) + ["valor_faixa"]
    return banded.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("valor_faixa_qtde"))


def conditional_distinct_counts(
    df: DataFrame,
    group_cols: list[str],
    entity_col: str,
    conditions: dict[str, Column],
    approx: bool = False,
) -> DataFrame:
    """Per-cohort distinct entities (A5 ≙ VivoPlay.scala:93-161):
    count(distinct case when <cond> then <entity> end) per condition."""
    entity = F.col(entity_col)
    aggs = []
    for name, cond in conditions.items():
        guarded = F.when(cond, entity)
        agg = (
            F.approx_count_distinct(guarded) if approx else F.count_distinct(guarded)
        ).cast("bigint").alias(name)
        aggs.append(agg)
    return df.groupBy(*group_cols).agg(*aggs)


def profile(
    df: DataFrame,
    group_cols: list[str],
    sums: dict[str, Column] | None = None,
    ratios: dict[str, tuple[Column, Column]] | None = None,
    decimal: str = "decimal(20,2)",
) -> DataFrame:
    """General qualitativo aggregate: decimal sums + derived ratios (A7/A8,
    ≙ VivoEyes.scala:95-97, VivoPlay.scala:88-89)."""
    aggs: list[Column] = []
    for name, col in (sums or {}).items():
        aggs.append(F.sum(col).cast(decimal).alias(name))
    for name, (num, den) in (ratios or {}).items():
        aggs.append((num / den).cast(decimal).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)
