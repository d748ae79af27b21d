"""Partition-count invariance: the registry's determinism contract,
tested directly.

Every float-bearing query claims order-independence (exact integer /
decimal accumulation, single final IEEE expression). If that claim
slips anywhere — a raw double SUM, an engine corr kernel, a
partition-seeded RNG — changing the shuffle layout changes the result.
This suite reruns the riskiest queries under a different
``spark.sql.shuffle.partitions`` AND a repartitioned input layout and
requires bit-identical output, which is exactly what the driver's
hash-compare needs to hold on ANY cluster size.
"""

from __future__ import annotations

import pytest

from dlt_salesforce_iceberg_rest_demo_spark.plans import REGISTRY, query_fns

from .conftest import SF_DIR, normalize_pdf

# Queries with float outputs riding on the determinism machinery.
RISKY = [
    "agg_pricing_summary",          # decimal-stabilized sums
    "stats_corr_regression",        # exact integer moments
    "stats_skew_kurtosis",          # 3rd/4th moments
    "stats_chi_square_independence",
    "stats_ab_test_conversion",
    "text_bm25_topk",               # fixed-point term sums
    "zscore_order_prices",
    "percentile_cont_order_prices",
    "embedding_random_projection",  # fixed-point folds
    "similarity_topk_exact",        # fixed-point dot products
    "graph_pagerank_customers_suppliers",  # integer iteration
    "corpus_mix_to_target",         # md5 membership
]


def _names():
    query_fns()
    return [n for n in RISKY if n in REGISTRY]


@pytest.mark.parametrize("name", _names())
def test_result_invariant_under_shuffle_layout(spark, name):
    q = REGISTRY[name]
    base = normalize_pdf(q.spark(spark, SF_DIR).toPandas())
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        alt = normalize_pdf(q.spark(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    import pandas as pd

    pd.testing.assert_frame_equal(base, alt, check_exact=True, obj=name)
