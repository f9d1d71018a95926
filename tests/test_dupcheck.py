"""Duplicidade family: single-scan metric ≡ literal two-scan reference form."""

from pyspark.sql import functions as F

from dq import dupcheck


def _tbl(spark):
    rows = [("a", 1), ("a", 1), ("a", 1), ("b", 2), ("c", None), ("c", None)]
    return spark.createDataFrame(rows, "k string, v int")


def test_single_scan_equals_two_scan(spark):
    df = _tbl(spark)
    one = dupcheck.dup_counts(df).collect()[0]
    two = dupcheck.dup_counts_two_scan(df).collect()[0]
    assert (one.qtde1, one.qtde2, one.diferenca) == (two.qtde1, two.qtde2, two.diferenca) == (6, 3, 3)


def test_null_rows_fingerprint_safe(spark):
    """NULL-bearing duplicate rows count as duplicates (concat_ws would
    collapse NULLs and miscount — SURVEY.md §7.3 item 2)."""
    df = spark.createDataFrame([("x", None), ("x", None), ("x", "")], "k string, v string")
    r = dupcheck.dup_counts(df).collect()[0]
    assert (r.qtde1, r.qtde2, r.diferenca) == (3, 2, 1)


def test_dup_metric_row_shape(spark):
    out = dupcheck.dup_metric_row(_tbl(spark), "db", "t", "20240101").collect()[0]
    assert (out.banco, out.tabela, out.dt_foto, out.fonte) == ("db", "t", "20240101", "2")
    assert out.diferenca == 3


def test_consolidate_supersedes_history(spark):
    hist = spark.createDataFrame(
        [("db", "t", "20240101", "20260101", 10, 9, 1, "1"),
         ("db", "t", "20240102", "20260101", 20, 20, 0, "1")],
        schema=dupcheck.DQ_DUPLICADOS,
    )
    aux = spark.createDataFrame(
        [("db", "t", "20240102", "20260101", 21, 20, 1, "2")],
        schema=dupcheck.DQ_DUPLICADOS,
    )
    out = dupcheck.consolidate(hist, aux).orderBy("dt_foto").collect()
    assert len(out) == 2
    assert out[1].qtde1 == 21 and out[1].fonte == "2"
    # idempotent re-merge
    out2 = dupcheck.consolidate(dupcheck.consolidate(hist, aux), aux).orderBy("dt_foto").collect()
    assert out2 == out


def test_dup_counts_subset_columns(spark):
    df = _tbl(spark)
    r = dupcheck.dup_counts(df, cols=["k"]).collect()[0]
    assert (r.qtde1, r.qtde2, r.diferenca) == (6, 3, 3)


def test_dup_counts_null_is_one_distinct_group(spark):
    """NULL values form ONE distinct cluster (null-safe fingerprint); the
    DuckDB oracle adds the same +1 on top of count(DISTINCT) — pinned here
    so the two sides cannot drift on null-bearing corpora."""
    df = spark.createDataFrame([("a",), (None,), (None,)], "text string")
    row = dupcheck.dup_counts(df, cols=["text"]).collect()[0]
    assert (row.qtde1, row.qtde2, row.diferenca) == (3, 2, 1)


def test_hll_estimate_within_bound(spark):
    """dup_metric_approx: the HLL++ estimate stays within 2x the configured
    relative standard deviation of the exact distinct count."""
    from dq.queries import HLL_RSD, dup_metric_approx_check

    row = dup_metric_approx_check(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.delta == row.qtde2_approx - row.qtde2_exact
    assert abs(row.delta) <= max(2 * HLL_RSD * row.qtde2_exact, 5)


def test_dup_cluster_histogram_planted(spark):
    # 6 docs: one 3x family, one 2x family, one singleton
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)], "text string"
    )
    out = {r.cluster_size: r for r in dupcheck.dup_cluster_histogram(df).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[3].n_clusters, out[3].n_docs, out[3].share_bp) == (1, 3, 5000)
    assert (out[2].n_clusters, out[2].n_docs, out[2].share_bp) == (1, 2, 3333)
    assert (out[1].n_clusters, out[1].n_docs, out[1].share_bp) == (1, 1, 1666)


def test_dup_cluster_histogram_nulls_form_one_family(spark):
    df = spark.createDataFrame([(None,), (None,), ("x",)], "text string")
    out = {r.cluster_size: r for r in dupcheck.dup_cluster_histogram(df).collect()}
    assert out[2].n_clusters == 1  # both NULL-text rows co-cluster
    assert out[1].n_clusters == 1


def test_dup_cluster_histogram_text_never_shuffles(spark):
    df = spark.createDataFrame([("a",), ("a",)], "text string")
    plan = (
        dupcheck.dup_cluster_histogram(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for frag in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in frag  # only the 8-B fingerprint / size keys
