"""Data-layout operators: multi-dimensional clustering for scan pruning.

The reference writes whatever file layout PyIceberg's single append
produces (`salesforce_pipeline.py:176`) - fine for CRM-sized tables,
hostile at 100 TB where min/max file skipping is the difference between
reading 100 TB and reading 100 GB. Z-ordering interleaves the bits of
several columns into one sort key so that range-partitioning on the key
co-locates rows that are close in EVERY dimension: files end up with
tight min/max ranges on each z-ordered column, and predicates on ANY of
them prune files (the Delta/Iceberg OPTIMIZE ZORDER BY idea, done with
plain DataFrame ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column. Column j's bit i lands at output position ``i*ncols + j``.

    Pure JVM-side expression (aggregate over a literal bit sequence,
    shift/mask arithmetic - no UDF), so it rides whole-stage codegen
    and costs one projection. Inputs are masked to ``bits`` bits;
    pre-bucket continuous domains first (e.g. ``floor(x / width)``).
    ``ncols * bits`` must stay < 63 to fit a signed long.
    """
    ncols = len(cols)
    if ncols * bits >= 63:
        raise ValueError(f"{ncols} cols x {bits} bits overflows a long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]

    # bits/ncols are compile-time constants, so the interleave unrolls
    # into one flat shift/mask expression (ncols*bits terms) that
    # whole-stage codegen fuses into a single projection.
    out: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * ncols + j)
    return out


def zorder_layout(
    df: DataFrame, cols: list[str], num_files: int = 32, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition by the interleaved
    key so each output file covers a tight hyper-rectangle of the
    z-ordered dimensions.

    ``repartitionByRange`` samples the key distribution (no global
    sort), then a local sort inside each partition finishes the
    clustering - the standard two-phase OPTIMIZE ZORDER shape. Write
    the result with ``.write.parquet``/``writeTo`` and every file's
    parquet min/max stats prune on all ``cols`` at once.
    """
    z = zorder_key(cols, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
