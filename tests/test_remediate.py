"""Flop family: failure-window selection, remediation loop, status flip."""

from pyspark.sql import functions as F

from dq import remediate, volumetry
from dq.schema import DQ_FAILURES

PEXPR = "date_format(ts, 'yyyyMMdd')"


def _failures(spark):
    rows = [
        ("db", "ev", "20240101", "ts", "2", 0),   # in daily window, partition exists
        ("db", "ev", "20231201", "ts", "2", 0),   # out of window
        ("db", "ev", "20240101", "ts", "2", 1),   # already fixed
        ("db", "gone", "20240101", "ts", "2", 0),  # partition still missing
    ]
    return spark.createDataFrame(rows, schema=DQ_FAILURES)


def _loader(spark):
    ev = spark.createDataFrame(
        [(i, "2024-01-01 10:00:00") for i in range(8)], "id long, s string"
    ).select("id", F.to_timestamp("s").alias("ts"))
    empty = ev.where(F.lit(False))

    def load(banco, tabela):
        return ev if tabela == "ev" else empty

    return load


def test_window_selection(spark):
    f = _failures(spark)
    daily = remediate.failure_window(f, "diario", today="20240102").collect()
    assert {(r.tabela, r.dt_foto) for r in daily} == {("ev", "20240101"), ("gone", "20240101")}
    weekly = remediate.failure_window(f, "semanal", today="20231205").collect()
    assert {r.dt_foto for r in weekly} == {"20231201"}


def test_remediation_flips_only_fixable(spark):
    hist = volumetry.empty_history(spark)
    new_hist, new_fail = remediate.remediate_volumetria(
        spark, _failures(spark), hist, _loader(spark), mode="diario", today="20240102"
    )
    assert new_hist.count() == 1
    assert new_hist.collect()[0].qtde_registros == 8
    rows = {(r.tabela, r.dt_foto): r.status for r in new_fail.collect()}
    assert rows[("ev", "20240101")] == 1      # flipped
    assert rows[("gone", "20240101")] == 0    # hole remains open
    assert rows[("ev", "20231201")] == 0      # untouched, out of window


def test_remediation_idempotent(spark):
    hist = volumetry.empty_history(spark)
    h1, f1 = remediate.remediate_volumetria(
        spark, _failures(spark), hist, _loader(spark), mode="diario", today="20240102"
    )
    h2, f2 = remediate.remediate_volumetria(
        spark, f1, h1, _loader(spark), mode="diario", today="20240102"
    )
    assert sorted(map(tuple, h2.collect())) == sorted(map(tuple, h1.collect()))
    assert sorted(map(tuple, f2.collect())) == sorted(map(tuple, f1.collect()))


def test_exclusion_list(spark):
    hist = volumetry.empty_history(spark)
    orig = _failures(spark)
    _, new_fail = remediate.remediate_volumetria(
        spark, orig, hist, _loader(spark),
        mode="diario", today="20240102", excluded_tables={"ev"},
    )
    # excluded table -> manifest untouched, nothing flipped
    assert sorted(map(tuple, new_fail.collect())) == sorted(map(tuple, orig.collect()))
