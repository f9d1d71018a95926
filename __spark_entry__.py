"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter pipeline at sf0.001;
``queries()`` exposes every implemented operator (SURVEY.md §2 + the
training-data additions, see COVERAGE.md); ``oracle_sql()`` returns the
DuckDB twins generated in dq/oracles.py from the same constants.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full keep/drop pipeline lineage at sf0.001 (rows > 0)."""
    from dq.queries import pipeline_lineage

    return pipeline_lineage(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dq.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dq.oracles import ORACLES

    return dict(ORACLES)
