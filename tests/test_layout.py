"""dq.layout — Z-order interleave + two-key clustered writes.

The pure-Python twin pins BOTH dialect renderings of the interleave; the
layout test reads real parquet footers and shows the property that
justifies the op: a Z-order write bounds per-file min/max ranges on BOTH
keys, where the single-key sorted layout leaves the off-key spanning the
full domain (so it never prunes).
"""

from __future__ import annotations

import glob

import duckdb
import pyarrow.parquet as pq
import pytest

from dq import io as dqio
from dq.layout import Z_BITS, Z_MASK, write_zorder_layout, zvalue_py, zvalue_sql

EDGES = [0, 1, 2, 3, 15, 16, 255, 4095, Z_MASK, Z_MASK + 7, -3]


def test_zvalue_python_twin_interleaves_bits():
    # hand case: x=0b101 (bits 0,2 -> even positions), y=0b011 (odd positions)
    assert zvalue_py(0b101, 0b011, bits=4) == 0b011011
    assert zvalue_py(0, 0) == 0
    assert zvalue_py(Z_MASK, Z_MASK) == (1 << (2 * Z_BITS)) - 1
    # clamp: negatives floor to 0, oversized saturate to the mask
    assert zvalue_py(-5, 3) == zvalue_py(0, 3)
    assert zvalue_py(Z_MASK + 99, 1) == zvalue_py(Z_MASK, 1)


def test_zvalue_spark_rendering_matches_python(spark):
    rows = [(x, y) for x in EDGES for y in EDGES]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.selectExpr("x", "y", f"{zvalue_sql('x', 'y', 'spark')} AS z").collect()
    }
    assert got == {(x, y): zvalue_py(x, y) for x, y in rows}


def test_zvalue_duckdb_rendering_matches_python():
    con = duckdb.connect()
    rows = [(x, y) for x in EDGES for y in EDGES]
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = {
        (x, y): z
        for x, y, z in con.execute(
            f"SELECT x, y, {zvalue_sql('x', 'y', 'duckdb')} AS z FROM t"
        ).fetchall()
    }
    assert got == {(x, y): zvalue_py(x, y) for x, y in rows}


def test_zvalue_monotone_per_axis():
    """With the other key fixed, z is strictly increasing in each key —
    a contiguous z-range therefore bounds a contiguous range per key."""
    for fixed in (0, 7, 63):
        xs = [zvalue_py(v, fixed, bits=8) for v in range(64)]
        ys = [zvalue_py(fixed, v, bits=8) for v in range(64)]
        assert xs == sorted(xs) and len(set(xs)) == 64
        assert ys == sorted(ys) and len(set(ys)) == 64


def _per_file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_zorder_write_bounds_both_keys(spark, tmp_path):
    """4096-row 64x64 uniform grid, 16 files: the single-key layout keeps
    x tight but leaves y's per-file footer range at ~the full domain; the
    Z-order layout holds BOTH keys' per-file ranges to a fraction of the
    domain — the two-key pruning the op exists for."""
    rows = [(i, i % 64, (i * 2654435761 % 4096) // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint").orderBy("id")

    p_sorted = str(tmp_path / "sorted_x")
    p_z = str(tmp_path / "zorder")
    dqio.write_sorted_layout(df, p_sorted, ["x"], n_files=16)
    write_zorder_layout(df, p_z, "x", "y", n_files=16, bits=6)

    domain = 63.0
    widest = lambda rs: max(hi - lo for lo, hi in rs) / domain  # noqa: E731
    # single-key layout: off-key files span (almost) the whole domain
    assert widest(_per_file_ranges(p_sorted, "y")) >= 0.9
    # z-order: BOTH keys bounded well under the domain per file
    assert widest(_per_file_ranges(p_z, "x")) <= 0.55
    assert widest(_per_file_ranges(p_z, "y")) <= 0.55
    # and nothing was lost or duplicated by the rewrite
    assert spark.read.parquet(p_z).count() == 4096


def test_zvalue_projection_is_zero_exchange(spark):
    """The interleave itself must add no shuffle — only the writer's one
    range exchange pays, exactly like write_sorted_layout."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        docs.selectExpr(
            "doc_id",
            f"least(greatest(coalesce(n_chars, 0) DIV 16, 0), {Z_MASK}) AS len_bucket",
        )
        .selectExpr("doc_id", f"{zvalue_sql('len_bucket', 'len_bucket', 'spark')} AS z")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
