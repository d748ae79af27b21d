"""Table profiling: per-column statistics in one distributed pass.

The reference's only verification surface is row counts and a 3-row
head sample per table (reference check_tables.py:39-53,
airflow/dags/salesforce_iceberg_dag.py:123-125). This generalizes it
to the standard data-quality profile a pipeline gate needs: per
column - row count, null count, exact distinct count, min, max.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """One-pass profile: ``column, n_rows, n_null, n_distinct,
    min_value, max_value`` (min/max cast to string so heterogeneous
    column types share one output schema).

    Plan shape: a single global aggregation computes every column's
    stats in one pass over the table (partial aggregates map-side,
    one 1-row reduce), then the row pivots to per-column rows with a
    driver-free explode of a struct array.

    Scale caveat: k exact COUNT(DISTINCT) aggregates in one query make
    Catalyst Expand the input k-fold before the shuffle. Fine for the
    handful of columns a quality gate checks; for very wide tables
    swap `F.count_distinct` for `F.approx_count_distinct` (single
    pass, no Expand, ~2% error).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.isnull(c).cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(entries).alias("e")).select("e.*")
