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


def hilbert_key_2d(
    x: str | Column, y: str | Column, bits: int = 16
) -> Column:
    """Hilbert-curve sort key for two columns — the locality upgrade
    over :func:`zorder_key`: the Hilbert curve visits every cell of
    the 2^bits x 2^bits grid exactly once with UNIT steps (adjacent
    d-values are adjacent cells), so range-partitioning on the key
    produces files whose min/max boxes are tighter than Z-order's
    (the Z curve takes long diagonal jumps at block boundaries; this
    is why newer lakehouse clustering uses Hilbert).

    Implementation: the classic per-bit fold (Wikipedia `xy2d`,
    rotation via ``s-1`` reflection) as ONE ``aggregate`` expression
    over the literal bit sequence with a (x, y, d) struct accumulator
    — no UDF, no Python, 16 bounded steps per row. Higher-order
    functions run interpreted, which is fine here: layout keys are
    computed once per write, and the per-row cost is a fixed ~16
    steps of integer arithmetic (measured in the same ballpark as a
    projection at sf0.1). All ops are two's-complement BIGINT
    arithmetic, bit-identical in Spark, python, and DuckDB — the
    oracle replays the fold as a chain of CTE stages.

    Inputs are masked to ``bits`` bits; pre-bucket continuous domains
    first. ``2 * bits`` must stay < 63 to fit a signed long.
    """
    if 2 * bits >= 63:
        raise ValueError(f"2 x {bits} bits overflows a long")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long").bitwiseAND(
        F.lit((1 << bits) - 1)
    )
    yc = (F.col(y) if isinstance(y, str) else y).cast("long").bitwiseAND(
        F.lit((1 << bits) - 1)
    )

    def step(acc: Column, s: Column) -> Column:
        ax, ay, ad = acc["x"], acc["y"], acc["d"]
        rx = (ax.bitwiseAND(s) > 0).cast("long")
        ry = (ay.bitwiseAND(s) > 0).cast("long")
        d2 = ad + s * s * ((rx * 3).bitwiseXOR(ry))
        xf = F.when(rx == 1, s - 1 - ax).otherwise(ax)
        yf = F.when(rx == 1, s - 1 - ay).otherwise(ay)
        nx = F.when(ry == 0, yf).otherwise(ax)
        ny = F.when(ry == 0, xf).otherwise(ay)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    # The fold walks the precomputed block sizes s = 2^(bits-1) .. 1
    # (literal array — shiftleft needs a compile-time shift amount).
    return F.aggregate(
        F.array(*[F.lit(1 << i).cast("long") for i in reversed(range(bits))]),
        F.struct(
            xc.alias("x"), yc.alias("y"), F.lit(0).cast("long").alias("d")
        ),
        step,
        lambda acc: acc["d"],
    )


def hilbert_layout(
    df: DataFrame, x: str, y: str, num_files: int = 32, bits: int = 16
) -> DataFrame:
    """Two-column clustering for writing, :func:`zorder_layout`'s shape
    with the Hilbert key: range-partition + local sort on the curve
    position, so each output file covers a contiguous curve segment
    (a compact blob in (x, y) space, tighter than the Z equivalent)."""
    z = hilbert_key_2d(x, y, bits).alias("__h")
    return (
        df.withColumn("__h", z)
        .repartitionByRange(num_files, F.col("__h"))
        .sortWithinPartitions("__h")
        .drop("__h")
    )


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
