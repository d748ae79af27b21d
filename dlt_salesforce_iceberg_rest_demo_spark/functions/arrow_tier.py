"""The raw-Arrow Python tier: ``applyInArrow`` / ``mapInArrow``.

Spark 4 exposes the Arrow batches themselves (pyarrow.Table /
RecordBatch iterators) underneath the Pandas tier - no pandas
conversion, no index semantics, columnar end-to-end. It is the right
tier when the per-group/per-batch logic is already columnar (pyarrow
compute kernels, zero-copy slicing) or when pandas dtype coercion
would corrupt values (large uint64s, nested structs).

Like functions/udfs.py, each member here has a JVM-native twin and a
test asserting exact agreement - the native version is what ships in
the registry; these exist to prove the tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def group_extrema_apply_in_arrow(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key (count, min, max) computed by ``applyInArrow``: the
    group arrives as ONE pyarrow.Table; pure pyarrow.compute kernels,
    no pandas. Twin of the native groupBy().agg(count/min/max) -
    integer/extrema stats, so agreement is exact (no float-sum order
    sensitivity in the comparison)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: "pa.Table") -> "pa.Table":
        v = table.column(value_col)
        return pa.table(
            {
                key_col: [table.column(key_col)[0].as_py()],
                "n_events": [table.num_rows],
                "min_value": [pc.min(v).as_py()],
                "max_value": [pc.max(v).as_py()],
            }
        )

    return df.select(key_col, value_col).groupBy(key_col).applyInArrow(
        stats, schema=f"{key_col} long, n_events long, min_value double, max_value double"
    )


def add_double_map_in_arrow(df: DataFrame, value_col: str = "value") -> DataFrame:
    """``mapInArrow`` pass: batch-streaming RecordBatch transform
    (append one computed column) with no pandas materialization - the
    shape for columnar featurizers over 100 TB scans. Twin of the
    native ``withColumn(v*2)``; doubling is exact in IEEE, so the
    equality test is strict."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schema_str = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", doubled double"

    def double(batches):
        for b in batches:
            yield b.append_column(
                "doubled", pc.multiply(b.column(value_col), pa.scalar(2.0))
            )

    return df.mapInArrow(double, schema=schema_str)
