"""SparkSession factory tuned for the DQ engine.

Local-mode testing runs one JVM with N threads; on a real cluster the same
conf block rides along via spark-submit --py-files. AQE is on so skewed
shuffles re-plan at runtime (skew-join splitting + partition coalescing) —
the scale path for 10^12-doc inputs where per-domain hot keys are expected.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "dq",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``; pass
    ``master="submit"`` to leave the master to spark-submit/cluster conf
    (the builder then sets no master at all).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("DQ_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))

    builder = SparkSession.builder.appName(app_name)
    if master != "submit":
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("DQ_DRIVER_MEMORY", "16g"))
        # catalog-table surface (S1/S6/S7): in-memory session catalog backed
        # by a writable warehouse dir; a cluster deployment points this at
        # its Hive/Iceberg warehouse instead. The default is PER-PROCESS
        # (pid-suffixed): the in-memory catalog cannot see other sessions'
        # tables, so a shared dir would let drop_table's orphan cleanup
        # destroy a concurrent session's live managed table (VERDICT r2
        # ADVICE). Opt into sharing explicitly via DQ_WAREHOUSE_DIR.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("DQ_WAREHOUSE_DIR", f"/tmp/dq-warehouse-{os.getpid()}"),
        )
        # Non-ANSI: NULL (not error) on overflow/bad cast, matching the
        # reference's Hive-1.x semantics (SURVEY.md §7.3 item 3).
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
