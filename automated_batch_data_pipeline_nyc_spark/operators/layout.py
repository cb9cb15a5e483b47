"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB, scan cost is dominated by how much data a query can SKIP.
Partitioning prunes on one column; queries that filter on a *second*
column still read every file.  Z-ordering interleaves the bits of
several columns into one sort key, so sorting/range-partitioning by it
co-locates rows that are close in EVERY dimension — per-file min/max
stats then stay narrow on all the interleaved columns at once, and
engines (Parquet row-group stats, Delta/Iceberg file skipping) prune
multi-predicate scans.  This is the layout behind Delta Lake's
``OPTIMIZE ... ZORDER BY`` and Iceberg's z-ordered rewrites, built here
from first principles as pure column arithmetic: shift/mask/or — fully
codegen'd, map-only, shuffle-free until the explicit range repartition.

The code is deliberately SQL-expressible (the same shift/mask terms run
in DuckDB), so the layout key itself is oracle-verifiable bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_code", "zorder_layout"]


def morton_code(cols: Sequence[str | Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one BIGINT
    Morton (Z-order) key: bit ``i`` of column ``j`` lands at position
    ``i * k + j``.

    Columns must be non-negative integers (bucket/normalize first —
    e.g. ``col % (1 << bits)`` or a rank/ntile for skewed domains);
    ``len(cols) * bits`` must fit in 63 bits.  The expression is a flat
    OR of ``k * bits`` shift/mask terms — whole-stage-codegen'd JVM
    arithmetic, no UDF, no shuffle.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits = {k * bits} > 63 bits")
    terms: list[Column] = []
    for j, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    code = terms[0]
    for t in terms[1:]:
        code = code.bitwiseOR(t)
    return code


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Return *df* clustered for multi-column skipping: a ``zcode``
    Morton key over *cols* plus a range-repartition + within-partition
    sort on it.

    Writing the result yields files whose per-file min/max are narrow
    in EVERY z-ordered column simultaneously — the row-group /
    file-skipping layout for multi-predicate scans.  One range shuffle
    (sampled boundaries, skew-proof by construction) and a local sort;
    downstream ``write_parquet`` inherits the layout.
    """
    out = df.withColumn("zcode", morton_code(cols, bits))
    parted = (
        out.repartitionByRange(n_files, "zcode")
        if n_files
        else out.repartitionByRange("zcode")
    )
    return parted.sortWithinPartitions("zcode")
