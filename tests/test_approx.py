"""Error-bound checks for the approximate aggregates (rows-only in the
driver gate; bounded here against exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dlt_salesforce_iceberg_rest_demo_spark.plans import REGISTRY, query_fns
from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import load_table

from .conftest import SF_DIR


def setup_module():
    query_fns()


def test_approx_count_distinct_within_5pct(spark):
    approx = {
        r.event_type: r.approx_users
        for r in REGISTRY["approx_distinct_and_quantiles"].spark(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.05  # HLL++ default rsd is 5%


def test_approx_median_within_10pct(spark):
    approx = {
        r.event_type: r.approx_median_value
        for r in REGISTRY["approx_distinct_and_quantiles"].spark(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.m
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for et, m in exact.items():
        assert abs(approx[et] - m) / abs(m) < 0.10


def test_sample_fraction_and_determinism(spark):
    df1 = REGISTRY["sample_events"].spark(spark, SF_DIR)
    df2 = REGISTRY["sample_events"].spark(spark, SF_DIR)
    n_total = load_table(spark, SF_DIR, "events").count()
    n1 = df1.count()
    assert 0.05 * n_total < n1 < 0.15 * n_total  # ~10% Bernoulli
    # same seed + same input layout -> identical sample
    assert sorted(r.event_id for r in df1.collect()) == sorted(
        r.event_id for r in df2.collect()
    )
