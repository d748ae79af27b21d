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


def test_count_min_never_underestimates_and_excess_bounded(spark):
    est = {
        r.user_id: r.est
        for r in REGISTRY["sketch_count_min_users"].spark(spark, SF_DIR).collect()
    }
    exact = {
        r.user_id: r.c
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    n = sum(exact.values())
    assert set(est) == set(exact)
    excesses = []
    for uid, c in exact.items():
        assert est[uid] >= c, f"CM underestimated user {uid}"
        excesses.append(est[uid] - c)
    # expected excess per hash row is ~n/width (=64); min over depth=4
    # rows keeps the mean well under that - allow 2x headroom
    assert sum(excesses) / len(excesses) <= 2 * n / 64


def test_hll_sketch_within_5pct_and_mergeable(spark):
    est = {
        r.event_type: r.est_distinct_users
        for r in REGISTRY["sketch_hll_distinct_users"].spark(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.exact
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, m in exact.items():
        assert abs(est[et] - m) / m < 0.05, (et, est[et], m)
    # mergeability: union of per-type sketches == one whole-table sketch
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct


def test_sample_topk_per_key_exact_sizes(spark):
    out = REGISTRY["sample_topk_per_key"].spark(spark, SF_DIR)
    sizes = {
        r.user_id: r.n
        for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.user_id: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(sizes) == set(totals)
    for uid, n in totals.items():
        assert sizes[uid] == min(3, n)


class TestKllQuantiles:
    def test_kll_within_rank_error_of_exact(self, spark, duck):
        """KLL's normalized rank error at default k(=200) is ~1.65%;
        assert each estimated quantile's TRUE rank is within 3% of the
        target rank (3x headroom on the published bound)."""
        from dlt_salesforce_iceberg_rest_demo_spark.plans import REGISTRY

        from .conftest import SF_DIR

        rows = REGISTRY["sketch_kll_price_quantiles"].spark(spark, SF_DIR).collect()
        assert rows
        exact = duck.execute(
            "SELECT o_orderstatus, list(o_totalprice ORDER BY o_totalprice) v "
            "FROM orders GROUP BY 1"
        ).fetchall()
        sorted_vals = {r[0]: r[1] for r in exact}
        for r in rows:
            vals = sorted_vals[r.o_orderstatus]
            n = len(vals)
            assert r.n == n
            for q, est in ((0.25, r.q25), (0.5, r.q50), (0.75, r.q75)):
                true_rank = sum(1 for x in vals if x <= est) / n
                assert abs(true_rank - q) <= 0.03, (r.o_orderstatus, q, true_rank)


class TestPortableHll:
    def test_estimates_within_hll_band_and_merge_exact(self, spark, duck):
        """Portable HLL: per-type estimates within the standard-error
        band (1.04/sqrt(64) ~ 13%; 3x headroom), and the merged
        '__ALL__' register table must equal the whole-table sketch
        EXACTLY (mergeability is a bit-level identity, not an
        approximation)."""
        from pyspark.sql import functions as F

        from dlt_salesforce_iceberg_rest_demo_spark.operators.sketches import (
            hll_table,
        )
        from dlt_salesforce_iceberg_rest_demo_spark.plans import REGISTRY
        from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import load_table

        from .conftest import SF_DIR

        rows = {
            r.event_type: r.estimate
            for r in REGISTRY["sketch_hll_portable_users"].spark(spark, SF_DIR).collect()
        }
        exact = {
            r[0]: r[1]
            for r in duck.execute(
                "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
            ).fetchall()
        }
        exact["__ALL__"] = duck.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events"
        ).fetchone()[0]
        assert set(rows) == set(exact)
        for et, est in rows.items():
            assert abs(est - exact[et]) / exact[et] <= 0.40, (et, est, exact[et])

        ev = load_table(spark, SF_DIR, "events")
        merged = (
            hll_table(ev, "user_id", ["event_type"])
            .groupBy("j")
            .agg(F.max("register").alias("register"))
        )
        whole = ev.withColumn("g", F.lit("x"))
        whole_tbl = hll_table(whole, "user_id", ["g"]).select("j", "register")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole_tbl.collect())
        )
