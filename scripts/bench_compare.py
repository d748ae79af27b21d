"""Compare a bench capture against the per-query min-of-3 floor anchor.

The round-over-round perf instrument (r9 verdict task 1): median-sum
totals swing ±10% with box noise (the noise_gap <= 3 target failed in
all seven r8-r9 captures), while per-query min-of-3 FLOORS are stable
across captures. So regressions are judged per query: a floor that
moves more than the anchor's threshold (default +0.3 s) is a
regression CANDIDATE — re-measure it solo before accepting, since even
floors inherit occasional one-off smears.

Usage:
    python scripts/bench_compare.py [BENCH.json] [--anchor BENCH_ANCHOR.json]

Prints a one-line JSON verdict plus a human table of movers; exit code
stays 0 (this is an instrument, not a gate — the builder adjudicates
candidates with solo re-runs).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def compare(bench: dict, anchor: dict) -> dict:
    floors_new = bench.get("min_of_3") or {}
    floors_old = anchor["floors"]
    thr = anchor.get("threshold_sec", 0.3)
    shared = sorted(set(floors_new) & set(floors_old))
    regressions = {
        q: {"anchor": floors_old[q], "now": floors_new[q],
            "delta": round(floors_new[q] - floors_old[q], 3)}
        for q in shared
        if floors_new[q] - floors_old[q] > thr
    }
    improvements = {
        q: {"anchor": floors_old[q], "now": floors_new[q],
            "delta": round(floors_new[q] - floors_old[q], 3)}
        for q in shared
        if floors_old[q] - floors_new[q] > thr
    }
    return {
        "metric": "bench_floor_deltas_vs_anchor",
        "anchor_round": anchor.get("anchor_round"),
        "threshold_sec": thr,
        "n_compared": len(shared),
        "new_queries": sorted(set(floors_new) - set(floors_old)),
        "dropped_queries": sorted(set(floors_old) - set(floors_new)),
        "floor_sum_anchor": round(sum(floors_old[q] for q in shared), 3),
        "floor_sum_now": round(sum(floors_new[q] for q in shared), 3),
        "regression_candidates": regressions,
        "improvements": improvements,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", nargs="?", default=str(REPO / "BENCH.json"))
    ap.add_argument(
        "--anchor", default=str(REPO / "BENCH_ANCHOR.json")
    )
    args = ap.parse_args()
    bench = json.loads(Path(args.bench).read_text())
    anchor = json.loads(Path(args.anchor).read_text())
    out = compare(bench, anchor)
    for label, movers in (
        ("REGRESSION CANDIDATE", out["regression_candidates"]),
        ("improved", out["improvements"]),
    ):
        for q, d in sorted(
            movers.items(), key=lambda kv: -abs(kv[1]["delta"])
        ):
            print(
                f"{label:>20}  {q:<44} {d['anchor']:>7.3f} -> "
                f"{d['now']:>7.3f}  ({d['delta']:+.3f}s)"
            )
    print(
        json.dumps(
            {
                k: v
                for k, v in out.items()
                if k not in ("regression_candidates", "improvements")
            }
            | {
                "n_regression_candidates": len(out["regression_candidates"]),
                "n_improved": len(out["improvements"]),
            }
        )
    )


if __name__ == "__main__":
    main()
