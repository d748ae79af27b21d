"""Staging-format readers/writers: Parquet, ORC, JSONL, CSV.

The reference stages every extracted batch as Parquet before the
destination call (``loader_file_format="parquet"``, reference
salesforce_pipeline.py:62); dlt's other loader formats are
jsonl/csv. This module gives the pipeline the same pluggable staging
surface on Spark, with the schema-fidelity rules each format needs:

- parquet: native, lossless (the default - sources/parquet.py);
- orc: native columnar alternative, lossless (vectorized reader,
  predicate pushdown - same scan properties as parquet);
- jsonl: lossless for struct/array/map, but timestamps serialize as
  ISO strings - read back with the explicit schema, never inference;
- csv: flat columns only; header + explicit schema on read (inference
  is both slow - an extra full scan - and lossy at scale).

All three read paths return identical DataFrames for flat tables,
asserted in tests/test_staging_formats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_stage(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write one staged batch. CSV/JSON carry explicit timestamp
    formatting so the round-trip is lossless to the microsecond (the
    reference's canonical datetime format is microsecond ISO-8601,
    salesforce/helpers/records.py:34-45)."""
    w = df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "jsonl":
        w.option("timestampFormat", _TS_FMT).json(path)
    elif fmt == "csv":
        w.option("header", "true").option("timestampFormat", _TS_FMT).csv(path)
    else:
        raise ValueError(f"unknown staging format: {fmt}")


def read_stage(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Read a staged batch back with the EXPLICIT schema - never
    inference: inference costs an extra full scan (csv/json read the
    data twice) and degrades types (ints widen, timestamps stay
    strings on csv edge formats). The pipeline always knows the schema
    it staged."""
    if fmt == "parquet":
        return spark.read.schema(schema).parquet(path)
    if fmt == "orc":
        return spark.read.schema(schema).orc(path)
    if fmt == "jsonl":
        return (
            spark.read.schema(schema)
            .option("timestampFormat", _TS_FMT)
            .json(path)
        )
    if fmt == "csv":
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .option("timestampFormat", _TS_FMT)
            .csv(path)
        )
    raise ValueError(f"unknown staging format: {fmt}")
