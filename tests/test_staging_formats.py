"""Staging-format round-trips: parquet/orc/jsonl/csv must return the
identical DataFrame for flat tables (S6 parity - the reference stages
batches as parquet; dlt's alternate loader formats are jsonl/csv)."""

from __future__ import annotations

import pytest

from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import load_table
from dlt_salesforce_iceberg_rest_demo_spark.sources.staging import (
    read_stage,
    write_stage,
)

from .conftest import SF_DIR


@pytest.mark.parametrize("fmt", ["parquet", "orc", "jsonl", "csv"])
def test_roundtrip_customer(spark, tmp_path, fmt):
    df = load_table(spark, SF_DIR, "customer")
    p = str(tmp_path / fmt)
    write_stage(df, p, fmt)
    back = read_stage(spark, p, fmt, df.schema)
    assert back.schema == df.schema
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_roundtrip_timestamps_to_microsecond(spark, tmp_path, fmt):
    """orders carries timestamps; text formats must preserve them to
    the microsecond via the explicit timestampFormat."""
    df = load_table(spark, SF_DIR, "orders")
    p = str(tmp_path / fmt)
    write_stage(df, p, fmt)
    back = read_stage(spark, p, fmt, df.schema)
    a = sorted((r.o_orderkey, r.o_orderdate) for r in df.collect())
    b = sorted((r.o_orderkey, r.o_orderdate) for r in back.collect())
    assert a == b


def test_unknown_format_rejected(spark, tmp_path):
    df = load_table(spark, SF_DIR, "region")
    with pytest.raises(ValueError):
        write_stage(df, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError):
        read_stage(spark, str(tmp_path / "x"), "avro", df.schema)
