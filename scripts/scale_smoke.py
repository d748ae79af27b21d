"""Scale smoke: run the hottest headliners at sf0.1 AND a generated
sf1.0 slice (10x rows) and report, per query and scale: wall time,
Exchange (shuffle) count of the physical plan, shuffle-write bytes,
SPILL bytes (memory+disk), and peak execution memory — via the Spark
UI REST API (stage-level task metrics). The claims under test: plans
are scale-stable (no new shuffles appear), wall time grows
near-linearly, and nothing SPILLS at sf1.0 in this 128 GiB JVM — the
measured evidence behind the "designed for 100 TB" statements in the
operator docstrings.

TWO slices (scripts/make_scale_slice.py):
- disjoint (HOT list): per-copy key/token universes — per-token df
  constant, work scales linearly by construction. Measures engine
  scaling at fixed data statistics.
- growdf (GROWDF list): fixed token vocabulary, 10x volume — every
  df grows ~10x, the Zipf-head regime the df-split operators
  (containment hot/cold split, prefix filter, sparse-cosine df cap)
  are DESIGNED for. For containment the entry also records the
  cost-based df_cap and hot-shingle count at both scales: the df_cap
  CROSSOVER (shingles going hot at 10x) is demonstrated, not assumed.

Each query runs in its OWN Spark session (subprocess): a shared
session let heavy neighbors inflate later measurements 2-10x via
driver GC / block-manager pressure (observed: ann_lsh 1.0s solo vs
10.2s after the containment run), which is measurement noise, not
engine behavior.

Usage: python scripts/scale_smoke.py                 # full suite
       python scripts/scale_smoke.py --query N [--growdf]  # (internal)
Writes SCALE_SMOKE.json; prints one compact summary line.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1.0"
DST_GROWDF = "/tmp/growdf_sf1.0"
FACTOR = 10

HOT = [
    "graph_triangle_count_suppliers",
    "dedup_containment_pairs",
    "dedup_clusters_minhash",
    "graph_pagerank_customers_suppliers",
    "similarity_ann_lsh",
    "text_sparse_cosine_pairs",
    "similarity_pq_topk",
    "embedding_dbscan_lsh_clusters",
    "similarity_ivf_topk",
    "dedup_minhash_lsh",
    "text_tfidf_top_terms",
    "text_pack_sequences",
    # round-7: the two slowest bench headliners — iterative
    # checkpoint loops (k-core peel, truss support peel) whose round
    # depth is where a 100x surprise would hide. On the DISJOINT
    # slice the 10x graph is 10 structurally-identical copies, so the
    # peel depth (and hence the plan) must not grow with scale.
    "graph_k_core_customers_parts",
    "graph_k_truss_suppliers",
    # round-7: ExactSubstr dedup — the O(corpus tokens) window shuffle
    # is the cost claim; on the disjoint slice dup structure is
    # per-copy, so work must scale linearly with no new exchanges.
    "text_exact_substring_dedup",
    # round-9: the removal step (the round-8 verdict's missing smoke):
    # one corpus-token exchange (the explicit doc_id repartition) must
    # stay the ONLY token-scale shuffle at 10x.
    "text_exact_substring_remove",
    # round-10 (r9 verdict task 7): Misra-Gries heavy hitters — its
    # summary is localCheckpointed before fanning out to two consumers
    # (r9), so the checkpoint must stay SUMMARY-sized (O(capacity) per
    # partition), not input-sized, as the input grows 10x.
    "approx_heavy_hitters_users",
]

# The df-split operators, re-measured on the saturated-vocabulary
# slice (the regime the disjoint slice cannot produce).
GROWDF = [
    "dedup_containment_pairs",
    "dedup_prefix_jaccard",
    "text_sparse_cosine_pairs",
    # The absolute-cap twin goes vacuous on this slice BY DESIGN (every
    # df outgrows the fixed cap and the cap drops it — measured r4);
    # the corpus-relative autocap keeps the same 5% vocabulary slice at
    # any scale, so ITS growdf entry measures real df^2 join growth.
    "text_sparse_cosine_autocap",
    # Dense-candidate regime for banding + connected components: the
    # growdf slice makes every doc resemble ~100 others, so the banded
    # LSH bucket join and the CC rounds see x26 output clusters.
    "dedup_clusters_minhash",
    # Saturated-vocabulary regime for ExactSubstr: with a fixed token
    # universe at 10x volume, window repeat counts grow ~10x and the
    # dup fraction saturates — the boilerplate-heavy corpus case.
    "text_exact_substring_dedup",
    # Removal under the saturated regime: the covered fraction
    # approaches 1, so the coverage join and the per-doc reassembly
    # both run at full corpus-token width.
    "text_exact_substring_remove",
]

# Entries whose plan DELIBERATELY changes with scale: excluded from the
# plans_stable summary (still recorded per-entry).
PLAN_CHANGE_BY_DESIGN = {
    "growdf:dedup_containment_pairs": (
        "containment auto-routes index -> dense-bitmap when the slice "
        "saturates the vocabulary (hot token mass > 0.5) — the route "
        "IS the scale design, see operators/dedup.py"
    ),
    "embedding_dbscan_lsh_clusters": (
        "connected-components propagation depth is data-dependent "
        "(O(log n) rounds to the fixed point): the 10x graph converges "
        "one round later, adding that round's exchanges — logarithmic "
        "iterative growth, not a shuffle regression"
    ),
}


def _execute(df) -> int:
    """Run the query's FULL physical plan (toRdd row count) — see
    bench.py `_execute`: a plain count() lets Catalyst prune computed
    columns and eliminate row-preserving joins, timing a plan that
    never runs the operator (found round 8 on the ExactSubstr
    doc-stats shape)."""
    return df._jdf.queryExecution().toRdd().count()


def _stage_rows(spark) -> list[dict]:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages", timeout=30
    ) as r:
        return json.load(r)


def _metrics_since(spark, before_ids: set) -> dict:
    rows = [
        s
        for s in _stage_rows(spark)
        if (s["stageId"], s["attemptId"]) not in before_ids
    ]
    return {
        "spill_bytes": sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            for s in rows
        ),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in rows),
        "peak_exec_mem": max(
            (s.get("peakExecutionMemory", 0) for s in rows), default=0
        ),
    }


def run_one(name: str, big_dir: str, with_split_stats: bool) -> dict:
    """Measure one query at both scales inside THIS process's fresh
    Spark session; returns the report entry."""
    import contextlib
    import io

    from dlt_salesforce_iceberg_rest_demo_spark.plans import query_fns
    from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark

    spark = get_spark(
        "scale-smoke", extra_conf={"spark.ui.enabled": "true"}
    )
    fns = query_fns()
    entry: dict = {}
    for label, sf_dir in (("sf0.1", SRC), ("sf1.0", big_dir)):
        # Warm with collect() ON the explained DataFrame so the explain
        # below shows the FINAL adaptive plan (isFinalPlan=true), not
        # the initial one: size-based statistics flip broadcast joins
        # to SortMergeJoin in the INITIAL sf1.0 plan (+2 shuffle
        # exchanges per join) that AQE converts right back to broadcast
        # at runtime — counting initial-plan exchanges misreported that
        # as scale instability. Collect also doubles as the warm run.
        df = fns[name](spark, sf_dir)
        df.collect()
        # NB: collect() (not count()) everywhere in this file — a
        # count() lets Catalyst prune computed columns / eliminate
        # row-preserving joins and times a plan that never runs the
        # operator (bench.py `_execute` has the full story).
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # Finalized-AQE formatted output appends the "Initial Plan"
        # section after the final tree — truncate there, or the count
        # double-counts every exchange (and re-inherits the initial
        # plan's broadcast->SMJ statistics flips).
        import re

        plan_txt = buf.getvalue().split("Initial Plan", 1)[0]
        n_shuffle = len(re.findall(r"(?<![A-Za-z])Exchange", plan_txt))
        n_bcast = plan_txt.count("BroadcastExchange")
        runs = []
        before = {
            (s["stageId"], s["attemptId"]) for s in _stage_rows(spark)
        }
        for _ in range(2):
            t0 = time.perf_counter()
            n = _execute(fns[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        mets = _metrics_since(spark, before)
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass
        entry[label] = {
            "sec": round(min(runs), 3),
            "rows": n,
            "exchanges": n_shuffle,
            "broadcasts": n_bcast,
            **mets,
        }
        if with_split_stats:
            from dlt_salesforce_iceberg_rest_demo_spark.operators.dedup import (
                containment_split_stats,
            )
            from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import (
                load_table,
            )

            entry[label]["containment_split"] = containment_split_stats(
                load_table(spark, sf_dir, "documents")
            )
    entry["time_ratio"] = round(
        entry["sf1.0"]["sec"] / max(entry["sf0.1"]["sec"], 1e-9), 2
    )
    entry["rows_ratio"] = round(
        entry["sf1.0"]["rows"] / max(entry["sf0.1"]["rows"], 1), 2
    )
    small, big = entry["sf0.1"], entry["sf1.0"]
    # Plan stability over FINAL adaptive plans. Two deltas are healthy
    # adaptive behavior, not instability:
    # - broadcast->shuffle join flips when a build side outgrows the
    #   broadcast threshold at 10x (each flip: -1 broadcast, +2 shuffle
    #   exchanges). A plan that kept broadcasting a growing side would
    #   be the actual scale bug.
    # - AQE empty-relation propagation collapsing a 0-row result to a
    #   LocalRelation (exchanges -> 0).
    flips = max(0, small["broadcasts"] - big["broadcasts"])
    entry["plan_stable"] = (
        big["exchanges"] == small["exchanges"]
        or big["exchanges"] == small["exchanges"] + 2 * flips
        or (big["rows"] == 0 and big["exchanges"] == 0)
    )
    if flips and big["exchanges"] == small["exchanges"] + 2 * flips:
        entry["adaptive_join_flips"] = flips
    if big["rows"] == 0 and big["exchanges"] == 0:
        entry["plan_note"] = "AQE empty-relation propagation (0-row result)"
    return entry


HOTWIN_DIR = "/tmp/hotwin_sf"
HOTWIN_KEY = "hotwindow:text_exact_substring_dedup"


def _ensure_hotwin_slice(spark) -> None:
    """Deterministic hot-single-window slice: 10k docs that are ONE
    8-token phrase repeated 100 times (periodic text => every stride-1
    window is one of 8 rotations, each occurring ~1e6 times corpus-
    wide), plus the sf0.1 documents as background. The pathological
    boilerplate case: one window text carrying a million occurrences."""
    from pyspark.sql import functions as F

    from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import load_table

    if Path(HOTWIN_DIR, "documents.parquet").exists():
        return
    phrase = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    hot = spark.range(10_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(" ".join([phrase] * 100)).alias("text"),
    )
    bg = load_table(spark, SRC, "documents").select("doc_id", "text")
    hot.unionByName(bg).write.mode("overwrite").parquet(
        str(Path(HOTWIN_DIR, "documents.parquet"))
    )


def _task_skew(spark, before_ids: set) -> dict:
    """Straggler evidence over the stages this measurement ran:
    ``max_task_ms`` = the single longest task anywhere (with its
    stage's task count) — at toy scale AQE byte-coalesces the hot
    exchange to ONE task, so the concentration shows up as one long
    task, not an intra-stage ratio — plus ``max_median_task_ratio``
    over stages that kept >= 4 tasks. The claim under test: the
    groupBy-fp duplicate flag partial-aggregates hot windows map-side,
    so NO task inherits a hot window's full occurrence list (the
    count-over-window formulation funnels all ~1e6 occurrences of a
    hot window text through one task)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    out = {
        "max_task_ms": 0,
        "max_task_stage_tasks": 0,
        "max_median_task_ratio": 0.0,
    }
    for s in _stage_rows(spark):
        sid = (s["stageId"], s["attemptId"])
        if sid in before_ids or s.get("numCompleteTasks", 0) < 1:
            continue
        url = (
            f"{base}/api/v1/applications/{app}/stages/{s['stageId']}/"
            f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
        )
        try:
            with urllib.request.urlopen(url, timeout=30) as r:
                q = json.load(r)
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        if mx > out["max_task_ms"]:
            out["max_task_ms"] = int(mx)
            out["max_task_stage_tasks"] = s["numCompleteTasks"]
        if s["numCompleteTasks"] >= 4 and mx >= 200:
            out["max_median_task_ratio"] = max(
                out["max_median_task_ratio"], round(mx / max(med, 1.0), 2)
            )
    return out


def run_hotwindow_variant(variant: str) -> dict:
    """Warm steady-state measurement (bench convention: warm once,
    median of 3 fresh-plan runs — a single cold run is dominated by
    Janino/JIT compile, observed 14.2 s cold vs 2.6 s warm for the
    SAME plan) of one duplicate-flag formulation on the hot-window
    slice, in its own session. Records wall time, shuffle-write bytes
    (the deterministic half of the claim: the groupBy-fp shape puts
    only 16-byte fps and flagged int rows on the wire, the
    count-over-window shape shuffles every window row with its text),
    spill, and the longest single task across the timed runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dlt_salesforce_iceberg_rest_demo_spark.operators import text as t_ops
    from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark

    spark = get_spark("scale-smoke", extra_conf={"spark.ui.enabled": "true"})
    _ensure_hotwin_slice(spark)
    docs = spark.read.parquet(str(Path(HOTWIN_DIR, "documents.parquet")))

    def make():
        if variant == "shipped":
            return t_ops.exact_substring_spans(docs, window=8)
        # round-7 shape: count(*) OVER (PARTITION BY wtext) — no
        # map-side partial agg, a hot window's rows land on one task
        win = t_ops._substring_windows(docs, "text", 8)
        dup = (
            win.withColumn(
                "c", F.count("*").over(Window.partitionBy("wtext"))
            )
            .filter(F.col("c") > 1)
            .select("doc_id", "pos", "e")
        )
        return t_ops._span_stats(docs, "text", dup)

    n = _execute(make())  # warm: codegen/JIT/footers
    before = {(s["stageId"], s["attemptId"]) for s in _stage_rows(spark)}
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = _execute(make())
        runs.append(time.perf_counter() - t0)
    mets = _metrics_since(spark, before)
    mets["shuffle_write_bytes"] //= 3  # per-run (3 timed runs summed)
    return {
        "sec": round(sorted(runs)[1], 3),
        "rows": n,
        **mets,
        **_task_skew(spark, before),
    }


REMOVAL_KEY = "hotwindow:text_exact_substring_remove"


def run_removal_variant(variant: str) -> dict:
    """Warm median-of-3 of one ExactSubstr REMOVAL formulation on the
    hot-window slice (1e6-occurrence phrase: nearly every token of the
    hot docs is covered, so the coverage join and per-doc reassembly
    run at full width). shipped = round-9 single-exchange shape (docs
    repartition(doc_id) -> coverage-marking LEFT join -> ONE groupBy
    for text_clean + n_tokens + n_removed; the stats join back carries
    only (doc_id, is-null)); contrast = the round-8 shape ((doc_id, p)
    anti-join, separate doc_id reassembly groupBy, then a stats join
    that re-shuffles the full text column)."""
    from dlt_salesforce_iceberg_rest_demo_spark.operators import text as t_ops
    from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("scale-smoke", extra_conf={"spark.ui.enabled": "true"})
    _ensure_hotwin_slice(spark)
    docs = spark.read.parquet(str(Path(HOTWIN_DIR, "documents.parquet")))

    def make():
        if variant == "shipped":
            return t_ops.exact_substring_remove(docs, window=8)
        # round-8 shape, reconstructed from the same internals
        dup = t_ops._duplicated_windows(docs, "text", 8)
        cov = t_ops._merged_spans(dup).select(
            "doc_id", F.explode(F.sequence("s", "e")).alias("p")
        )
        tk = F.split(F.col("text"), " ")
        toks = docs.select(
            "doc_id", F.posexplode(tk).alias("p0", "tok")
        ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
        kept = toks.join(cov, ["doc_id", "p"], "left_anti")
        clean = kept.groupBy("doc_id").agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(p, tok))),"
                " x -> x.tok), ' ')"
            ).alias("__clean"),
            F.count("*").alias("__n_kept"),
        )
        n_tokens = (
            F.when(F.col("text").isNull(), F.lit(None).cast("long"))
            .otherwise(F.size(tk).cast("long"))
            .alias("n_tokens")
        )
        return (
            docs.select("doc_id", F.col("text").alias("__text"), n_tokens)
            .join(clean, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("__text").isNull(), F.lit(None).cast("string"))
                .otherwise(F.coalesce(F.col("__clean"), F.lit("")))
                .alias("text_clean"),
                "n_tokens",
                (
                    F.col("n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0))
                ).alias("n_removed"),
            )
        )

    n = _execute(make())  # warm: codegen/JIT/footers
    before = {(s["stageId"], s["attemptId"]) for s in _stage_rows(spark)}
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = _execute(make())
        runs.append(time.perf_counter() - t0)
    mets = _metrics_since(spark, before)
    mets["shuffle_write_bytes"] //= 3  # per-run (3 timed runs summed)
    return {
        "sec": round(sorted(runs)[1], 3),
        "rows": n,
        **mets,
        **_task_skew(spark, before),
    }


def run_removal_hotwindow() -> dict:
    """Shipped single-exchange removal vs the round-8 two-exchange
    shape, each in its own subprocess on the hot slice."""
    entry: dict = {}
    for key, variant in (
        ("shipped", "shipped"),
        ("r8_shape_contrast", "contrast"),
    ):
        proc = subprocess.run(
            [sys.executable, __file__, "--removal-variant", variant],
            capture_output=True, text=True,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("VARIANT ")
            ),
            None,
        )
        if line is None:
            raise RuntimeError(
                f"removal variant {variant} failed:\n{proc.stderr[-800:]}"
            )
        entry[key] = json.loads(line[len("VARIANT "):])
    entry["rows_equal"] = (
        entry["shipped"]["rows"] == entry["r8_shape_contrast"]["rows"]
    )
    entry["note"] = (
        "hot slice (one 8-token phrase, ~1e6 occurrences/rotation; hot "
        "docs ~100% covered), warm median-of-3 per variant in its own "
        "session. shipped = round-9 single token-scale exchange "
        "(repartition(doc_id) satisfies the coverage join AND the one "
        "combined reassembly/stats aggregation; the doc join back "
        "carries no text); r8_shape_contrast = (doc_id,p) anti-join + "
        "separate reassembly groupBy + a stats join re-shuffling the "
        "full text column."
    )
    return entry


def run_hotwindow() -> dict:
    """The hot-single-window entry: the SHIPPED groupBy-fp duplicate
    flag vs the round-7 count-over-window formulation, each measured
    cold in its own subprocess on the 1e6-occurrence slice."""
    entry: dict = {}
    for key, variant in (
        ("shipped", "shipped"),
        ("window_flag_contrast", "contrast"),
    ):
        proc = subprocess.run(
            [sys.executable, __file__, "--hotwindow-variant", variant],
            capture_output=True, text=True,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("VARIANT ")
            ),
            None,
        )
        if line is None:
            raise RuntimeError(
                f"hotwindow variant {variant} failed:\n{proc.stderr[-800:]}"
            )
        entry[key] = json.loads(line[len("VARIANT "):])
    entry["rows_equal"] = (
        entry["shipped"]["rows"] == entry["window_flag_contrast"]["rows"]
    )
    entry["note"] = (
        "hot slice: one 8-token phrase at ~1e6 occurrences/rotation, "
        "warm median-of-3 per variant in its own session. shipped = "
        "groupBy-fp partial agg + semi-join (hot windows collapse "
        "map-side; only 16-byte fps and flagged (doc_id,pos,e) rows "
        "shuffle); contrast = the round-7 count-over-window flag "
        "(every window row incl. its text shuffles on wtext and a "
        "hot window's occurrence list lands on one task; at this toy "
        "scale LZ4+dictionary makes the hot text shuffle cheap and "
        "AQE byte-coalescing funnels it to few-task stages — at "
        "crawl scale neither mercy applies)"
    )
    return entry


def _ensure_slice(dst: str, mode: str) -> None:
    if not Path(dst, "documents.parquet").exists():
        subprocess.run(
            [sys.executable, str(REPO / "scripts" / "make_scale_slice.py"),
             "--src", SRC, "--dst", dst, "--factor", str(FACTOR),
             "--mode", mode],
            check=True,
        )


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--query":
        name = sys.argv[2]
        growdf = "--growdf" in sys.argv
        big = DST_GROWDF if growdf else DST
        stats = growdf and name == "dedup_containment_pairs"
        print("RESULT " + json.dumps(run_one(name, big, stats)))
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--hotwindow-variant":
        print("VARIANT " + json.dumps(run_hotwindow_variant(sys.argv[2])))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--hotwindow":
        print("RESULT " + json.dumps(run_hotwindow()))
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--removal-variant":
        print("VARIANT " + json.dumps(run_removal_variant(sys.argv[2])))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--removal-hotwindow":
        print("RESULT " + json.dumps(run_removal_hotwindow()))
        return

    _ensure_slice(DST, "disjoint")
    _ensure_slice(DST_GROWDF, "growdf")
    report: dict[str, dict] = {}
    jobs = [(n, False) for n in HOT] + [(n, True) for n in GROWDF]
    for name, growdf in jobs:
        key = f"growdf:{name}" if growdf else name
        cmd = [sys.executable, __file__, "--query", name]
        if growdf:
            cmd.append("--growdf")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")),
            None,
        )
        if line is None:
            print(f"{key}: FAILED\n{proc.stderr[-500:]}", flush=True)
            continue
        entry = json.loads(line[len("RESULT "):])
        if key in PLAN_CHANGE_BY_DESIGN:
            entry["plan_change_by_design"] = PLAN_CHANGE_BY_DESIGN[key]
        report[key] = entry
        print(
            f"{key}: {entry['sf0.1']['sec']}s -> {entry['sf1.0']['sec']}s "
            f"(x{entry['time_ratio']}, rows x{entry['rows_ratio']}, "
            f"exchanges {entry['sf0.1']['exchanges']}->"
            f"{entry['sf1.0']['exchanges']}, "
            f"spill {entry['sf0.1']['spill_bytes']}->"
            f"{entry['sf1.0']['spill_bytes']}, "
            f"peakmem {entry['sf1.0']['peak_exec_mem']})",
            flush=True,
        )

    # hot-single-window straggler slice (own subprocess, custom shape)
    proc = subprocess.run(
        [sys.executable, __file__, "--hotwindow"],
        capture_output=True, text=True,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")),
        None,
    )
    if line is None:
        print(f"{HOTWIN_KEY}: FAILED\n{proc.stderr[-500:]}", flush=True)
    else:
        entry = json.loads(line[len("RESULT "):])
        report[HOTWIN_KEY] = entry
        print(
            f"{HOTWIN_KEY}: shipped {entry['shipped']['sec']}s "
            f"max/med {entry['shipped']['max_median_task_ratio']} vs "
            f"window-flag {entry['window_flag_contrast']['sec']}s "
            f"max/med "
            f"{entry['window_flag_contrast']['max_median_task_ratio']}",
            flush=True,
        )

    # removal on the same hot slice (shipped vs round-8 shape)
    proc = subprocess.run(
        [sys.executable, __file__, "--removal-hotwindow"],
        capture_output=True, text=True,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")),
        None,
    )
    if line is None:
        print(f"{REMOVAL_KEY}: FAILED\n{proc.stderr[-500:]}", flush=True)
    else:
        entry = json.loads(line[len("RESULT "):])
        report[REMOVAL_KEY] = entry
        print(
            f"{REMOVAL_KEY}: shipped {entry['shipped']['sec']}s vs "
            f"r8-shape {entry['r8_shape_contrast']['sec']}s",
            flush=True,
        )

    (REPO / "SCALE_SMOKE.json").write_text(json.dumps(report, indent=1) + "\n")
    two_scale = {
        k: r for k, r in report.items() if "time_ratio" in r
    }
    worst = max(r["time_ratio"] for r in two_scale.values())
    stable = all(
        r["plan_stable"]
        for k, r in two_scale.items()
        if k not in PLAN_CHANGE_BY_DESIGN
    )
    spill_free = all(
        r["sf1.0"]["spill_bytes"] == 0 for r in two_scale.values()
    )
    print(
        json.dumps(
            {
                "metric": "scale_smoke_worst_time_ratio_at_10x",
                "value": worst,
                "plans_stable": stable,
                "sf1_spill_free": spill_free,
                "details": "SCALE_SMOKE.json",
            }
        )
    )


if __name__ == "__main__":
    main()
