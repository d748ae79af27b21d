"""Scale smoke: run the hottest headliners at sf0.1 AND a generated
sf1.0 slice (10x rows, disjoint key universes — scripts/
make_scale_slice.py) and report the wall-time ratio plus the Exchange
(shuffle) count of each physical plan at both scales. The claim under
test: the plans are scale-stable (no new shuffles appear) and
wall-time grows near-linearly — the measured evidence behind the
"designed for 100 TB" statements in the operator docstrings.

Each query runs in its OWN Spark session (subprocess): a shared
session let heavy neighbors inflate later measurements 2-10x via
driver GC / block-manager pressure (observed: ann_lsh 1.0s solo vs
10.2s after the containment run), which is measurement noise, not
engine behavior.

Usage: python scripts/scale_smoke.py           # full suite
       python scripts/scale_smoke.py --query N # one query (internal)
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
]


def run_one(name: str) -> dict:
    """Measure one query at both scales inside THIS process's fresh
    Spark session; returns the report entry."""
    import contextlib
    import io

    from dlt_salesforce_iceberg_rest_demo_spark.plans import query_fns
    from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark

    spark = get_spark("scale-smoke")
    fns = query_fns()
    entry: dict = {}
    for label, sf_dir in (("sf0.1", SRC), ("sf1.0", DST)):
        df = fns[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        nx = buf.getvalue().count("Exchange")
        fns[name](spark, sf_dir).count()  # warm
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = fns[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass
        entry[label] = {"sec": round(min(runs), 3), "rows": n, "exchanges": nx}
    entry["time_ratio"] = round(
        entry["sf1.0"]["sec"] / max(entry["sf0.1"]["sec"], 1e-9), 2
    )
    entry["rows_ratio"] = round(
        entry["sf1.0"]["rows"] / max(entry["sf0.1"]["rows"], 1), 2
    )
    entry["plan_stable"] = entry["sf1.0"]["exchanges"] == entry["sf0.1"]["exchanges"]
    return entry


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--query":
        print("RESULT " + json.dumps(run_one(sys.argv[2])))
        return

    if not Path(DST, "lineitem.parquet").exists():
        subprocess.run(
            [sys.executable, str(REPO / "scripts" / "make_scale_slice.py"),
             "--src", SRC, "--dst", DST, "--factor", str(FACTOR)],
            check=True,
        )
    report: dict[str, dict] = {}
    for name in HOT:
        proc = subprocess.run(
            [sys.executable, __file__, "--query", name],
            capture_output=True,
            text=True,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")),
            None,
        )
        if line is None:
            print(f"{name}: FAILED\n{proc.stderr[-500:]}", flush=True)
            continue
        entry = json.loads(line[len("RESULT "):])
        report[name] = entry
        print(
            f"{name}: {entry['sf0.1']['sec']}s -> {entry['sf1.0']['sec']}s "
            f"(x{entry['time_ratio']}, rows x{entry['rows_ratio']}, "
            f"exchanges {entry['sf0.1']['exchanges']}->"
            f"{entry['sf1.0']['exchanges']})",
            flush=True,
        )

    (REPO / "SCALE_SMOKE.json").write_text(json.dumps(report, indent=1) + "\n")
    worst = max(r["time_ratio"] for r in report.values())
    stable = all(r["plan_stable"] for r in report.values())
    print(
        json.dumps(
            {
                "metric": "scale_smoke_worst_time_ratio_at_10x",
                "value": worst,
                "plans_stable": stable,
                "details": "SCALE_SMOKE.json",
            }
        )
    )


if __name__ == "__main__":
    main()
