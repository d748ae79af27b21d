"""Parquet table source for the driver fixtures.

Parity: the reference stages every batch as Parquet before the
destination load (``/root/reference/salesforce_pipeline.py:62``,
``loader_file_format="parquet"``) and its physical tables are
Parquet-in-Iceberg. ``spark.read.parquet`` is the native equivalent:
vectorized scan, predicate pushdown, column pruning all come from
Catalyst for free (SURVEY.md §4).

Scale note: at 100 TB these would be partitioned/bucketed Iceberg
tables; the loader keeps the call-site identical (``load_table(spark,
sf_dir, name)``) so swapping in ``spark.table("lake.ns.name")`` is a
one-liner.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated TPC-H-ish star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@functools.lru_cache(maxsize=None)
def _nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects (PARQUET_TYPE_ILLEGAL). One cheap driver-side footer read,
    cached per path."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return tuple(
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        )
    except Exception:
        return ()


def _ntz_to_sessiontz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-tz TIMESTAMP.

    The driver fixtures store naive microsecond timestamps
    (`timestamp[us]`, isAdjustedToUTC=false), which Spark reads as
    TIMESTAMP_NTZ. Every operator (and DuckDB's naive-UTC oracle
    semantics) works on session-tz timestamps with the session pinned
    to UTC, so the cast changes the type, not the instant."""
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan -> full pushdown support.

    Nanosecond-timestamp columns (a historical fixture format for
    `events.ts`) are read as long nanos
    (`spark.sql.legacy.parquet.nanosAsLong`, set at runtime so the
    driver's own SparkSession works too) and converted to native
    microsecond timestamps - truncation, matching DuckDB's ns->us cast.
    Naive microsecond columns (the current fixture format) are cast
    from TIMESTAMP_NTZ to session-tz TIMESTAMP (UTC session -> same
    instant; see `_ntz_to_sessiontz`).
    """
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return _ntz_to_sessiontz(spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return _ntz_to_sessiontz(df)


def load_table_incremental(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_col: str,
    cursor_gt: str,
) -> DataFrame:
    """Cursor scan (`ts > cursor`) with the predicate pushed to parquet
    even for nanos-timestamp columns.

    The plain path (load_table + filter) filters the *converted*
    timestamp, which Catalyst cannot push through `timestamp_micros(ns
    DIV 1000)` - every row group gets read. Here the equivalent raw
    predicate `ns > us*1000 + 999` (exactly `ns DIV 1000 > us` for
    ns >= 0) is applied before conversion, so row-group min/max skipping
    works - at 100 TB an idle cursor poll touches only the tail files.
    """
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_timestamp_columns(path)
    cutoff = F.lit(cursor_gt).cast("timestamp")
    if ts_col not in ns_cols:
        from pyspark.sql.types import TimestampNTZType

        df = spark.read.parquet(path)
        if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
            # Filter the raw NTZ column (pushes to the parquet scan);
            # UTC session makes the NTZ cutoff the same instant.
            cutoff_ntz = F.lit(cursor_gt).cast("timestamp_ntz")
            return _ntz_to_sessiontz(df.filter(F.col(ts_col) > cutoff_ntz))
        return df.filter(F.col(ts_col) > cutoff)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    cutoff_ns = F.unix_micros(cutoff) * 1000 + 999
    df = df.filter(F.col(ts_col) > cutoff_ns)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
