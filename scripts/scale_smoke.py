"""Scale smoke: run the hottest headliners at sf0.1 AND a generated
sf1.0 slice (10x rows, disjoint key universes — scripts/
make_scale_slice.py) and report the wall-time ratio plus the Exchange
(shuffle) count of each physical plan at both scales. The claim under
test: the plans are scale-stable (no new shuffles appear) and
wall-time grows near-linearly — the measured evidence behind the
"designed for 100 TB" statements in the operator docstrings.

Usage: python scripts/scale_smoke.py  (writes SCALE_SMOKE.json, prints
a compact summary line)
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
]


def exchanges(df) -> int:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().count("Exchange")


def main() -> None:
    if not Path(DST, "lineitem.parquet").exists():
        subprocess.run(
            [sys.executable, str(REPO / "scripts" / "make_scale_slice.py"),
             "--src", SRC, "--dst", DST, "--factor", str(FACTOR)],
            check=True,
        )

    from dlt_salesforce_iceberg_rest_demo_spark.plans import query_fns
    from dlt_salesforce_iceberg_rest_demo_spark.session import get_spark

    spark = get_spark("scale-smoke")
    fns = query_fns()

    def drop_leaked_blocks() -> None:
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass

    report: dict[str, dict] = {}
    for name in HOT:
        entry: dict = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1.0", DST)):
            df = fns[name](spark, sf_dir)
            nx = exchanges(df)
            fns[name](spark, sf_dir).count()  # warm
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                n = fns[name](spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            drop_leaked_blocks()
            entry[label] = {
                "sec": round(min(runs), 3),
                "rows": n,
                "exchanges": nx,
            }
        entry["time_ratio"] = round(
            entry["sf1.0"]["sec"] / max(entry["sf0.1"]["sec"], 1e-9), 2
        )
        entry["rows_ratio"] = round(
            entry["sf1.0"]["rows"] / max(entry["sf0.1"]["rows"], 1), 2
        )
        entry["plan_stable"] = (
            entry["sf1.0"]["exchanges"] == entry["sf0.1"]["exchanges"]
        )
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
