"""Compose a per-query-MIN full-catalog bench artifact from N run JSONs.

Usage: python tools/bench_compose.py out.json run1.json run2.json ...

Replicates the r10 composite format (metric all_catalog_queries_min_of_N,
runs_totals, runs_calibrations) so `tools/bench_diff.py` and the
BASELINE.md methodology stay comparable round to round.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in paths]
    names = sorted({n for r in runs for n in r["queries"]})
    queries = {
        n: min(r["queries"][n] for r in runs if n in r["queries"]) for n in names
    }
    artifact = {
        "metric": f"all_catalog_queries_min_of_{len(runs)}",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": runs[0].get("sf"),
        "runs_totals": [r["value"] for r in runs],
        "runs_calibrations": [r.get("calibration_sec") for r in runs],
    }
    json.dump(artifact, open(out, "w"), indent=0)
    print(
        f"{len(runs)} runs -> {len(queries)} queries, composite "
        f"{artifact['value']} s; totals {artifact['runs_totals']} "
        f"calibrations {artifact['runs_calibrations']}"
    )


if __name__ == "__main__":
    main()
