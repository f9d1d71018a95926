"""Z-order (Morton-curve) multi-key data layout.

``dq.io.write_sorted_layout`` range-clusters on ONE key; when two filter
keys genuinely compete for the sort order (SCALING.md §"Data layout" —
e.g. per-site audits filter ``source`` while length-band scans filter
``n_chars``), a single-key sort leaves the second key's per-file min/max
footers spanning the full domain, so that key never prunes. The classic
fix (Morton 1966; Iceberg/Delta "Z-ORDER BY") interleaves the bits of both
keys into one integer and range-clusters on THAT: a file holding a
contiguous z-range covers a ~√file-fraction tile of BOTH key domains, so
parquet row-group min/max stats prune on either predicate.

The interleave is pure bounded-integer bit arithmetic — clamp each key to
``Z_BITS`` bits, then z = Σ_i ((x>>i & 1) << 2i) + ((y>>i & 1) << (2i+1)).
Both dialect renderings are generated from the same Python loop
(CLAUDE.md: never hand-duplicate a literal): Spark spells shifts
``shiftleft/shiftright``, DuckDB spells them ``<< >>``; the bit positions
are disjoint so ``+`` is exact OR in both. That makes the z-value column
itself DuckDB-oracle-able bit-for-bit.

Scale shape: the z-value is a zero-exchange projection; the writer adds
exactly one range exchange (sampled boundaries, skew-safe) — the same
write-time cost as the single-key layout it replaces. Nothing here ever
shuffles more than the rows being written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per key; 2 keys -> z fits in 32 bits (BIGINT-safe)
Z_MASK = (1 << Z_BITS) - 1


def _clamp_sql(col: str, mask: int) -> str:
    # keys are non-negative small ints by contract; clamp defensively so a
    # stray negative/oversized value degrades to the domain edge instead of
    # scattering sign bits through the curve.
    return f"least(greatest({col}, 0), {mask})"


def zvalue_sql(x_col: str, y_col: str, dialect: str, bits: int = Z_BITS) -> str:
    """The interleave expression for ``dialect`` in {'spark', 'duckdb'}.

    One generator, two spellings — the term list (bit positions, clamp,
    sum) is identical, so Spark and DuckDB compute the same integer.
    Every term is fully parenthesized: DuckDB gives ``+`` a TIGHTER
    binding than ``<<`` (C-style), so an unparenthesized ``a << 0 + b``
    parses as ``a << (0 + b)`` — probed, it overflows the shift.
    """
    mask = (1 << bits) - 1
    cx, cy = _clamp_sql(x_col, mask), _clamp_sql(y_col, mask)
    terms = []
    for i in range(bits):
        for src, off in ((cx, 0), (cy, 1)):
            pos = 2 * i + off
            if dialect == "spark":
                terms.append(f"shiftleft(shiftright({src}, {i}) & 1, {pos})")
            else:
                terms.append(f"(((({src}) >> {i}) & 1) << {pos})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zvalue_col(x_col: str, y_col: str, bits: int = Z_BITS) -> Column:
    return F.expr(zvalue_sql(x_col, y_col, "spark", bits))


def zvalue_py(x: int, y: int, bits: int = Z_BITS) -> int:
    """Pure-Python twin (the pytest oracle for both dialect renderings)."""
    mask = (1 << bits) - 1
    x, y = min(max(x, 0), mask), min(max(y, 0), mask)
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int | None = None,
    bits: int = Z_BITS,
) -> None:
    """Z-order-clustered write: one range exchange on the interleaved key,
    sort within partitions, drop the helper column, write parquet.

    ``x_col``/``y_col`` must already be bounded non-negative integer
    expressions (bucketize upstream — e.g. ``n_chars DIV 16``, a dense
    domain code). The trailing select is a narrow Project after the sort;
    it does not reshuffle, so the written row order — and therefore the
    per-file min/max footers on BOTH original keys — keeps the z-curve
    tiling.
    """
    z = "__zval"
    out = (
        df.withColumn(z, zvalue_col(x_col, y_col, bits))
        .repartitionByRange(*([n_files] if n_files else []), F.col(z))
        .sortWithinPartitions(z)
        .drop(z)
    )
    out.write.mode("overwrite").parquet(path)
