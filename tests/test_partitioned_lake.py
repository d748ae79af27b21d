"""Partitioned-table support in the lake: hive-style layout, partition
pruning, dispositions over partitioned data."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Row
from pyspark.sql import functions as F

from dlt_salesforce_iceberg_rest_demo_spark.sinks.dispositions import ParquetLake


def events_df(spark, days):
    return spark.createDataFrame(
        [
            Row(event_id=i, dt=f"2024-01-{d:02d}", value=float(i))
            for i, d in enumerate(days)
        ]
    )


def make_partitioned(spark, tmp_path):
    lake = ParquetLake(spark, tmp_path / "lake")
    df = events_df(spark, [1, 1, 2, 3])
    lake.create_table("ev", df.schema, partition_by=["dt"])
    lake.append(df, "ev")
    return lake


def test_partitioned_roundtrip(spark, tmp_path):
    lake = make_partitioned(spark, tmp_path)
    assert lake.partition_columns("ev") == ["dt"]
    rows = {r.event_id: (r.dt, r.value) for r in lake.read("ev").collect()}
    assert rows[0] == ("2024-01-01", 0.0) and len(rows) == 4


def test_partition_pruning_in_plan(spark, tmp_path):
    lake = make_partitioned(spark, tmp_path)
    df = lake.read("ev").filter(F.col("dt") == "2024-01-01")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the dt filter must land in PartitionFilters (file-listing prune),
    # not in the row-level PushedFilters
    assert "PartitionFilters: [isnotnull(dt" in plan
    assert df.count() == 2


def test_merge_on_partitioned_table(spark, tmp_path):
    lake = make_partitioned(spark, tmp_path)
    batch = events_df(spark, [3]).withColumn("value", F.lit(99.0))
    lake.merge(batch, "ev", ("event_id",))
    rows = {r.event_id: r.value for r in lake.read("ev").collect()}
    assert rows[0] == 99.0  # batch row 0 upserted (event_id 0, day 3)
    assert len(rows) == 4


def test_replace_keeps_partitioning(spark, tmp_path):
    lake = make_partitioned(spark, tmp_path)
    lake.replace(events_df(spark, [5, 5]), "ev")
    assert lake.count("ev") == 2
    # hive layout on disk for the new snapshot
    dirs = list((lake.root / "ev").glob("data_*/dt=2024-01-05"))
    assert dirs, "expected hive-style dt= directories"
