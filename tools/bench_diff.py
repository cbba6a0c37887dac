"""Diff a full-catalog bench JSON against the per-query medians recorded
in BASELINE.md's full-catalog table (the round-6 regression reference),
flagging movers beyond a ratio threshold in either direction.

Usage: python tools/bench_diff.py <bench.json> [threshold=1.5]

The BASELINE table is parsed from the '### Full-catalog' section's
```json block (one {"name": sec, ...} object).  Prints per-family
aggregate, the flagged movers, and the new-query rows that have no
baseline yet.
"""

from __future__ import annotations

import json
import os
import re
import sys


def baseline_medians(baseline_md: str) -> dict[str, float]:
    text = open(baseline_md).read()
    # the full-catalog medians live in a fenced json block following the
    # 'Full-catalog bench' heading; take the LAST such block so re-records
    # supersede older ones
    blocks = re.findall(r"```json\n(\{[^`]+\})\n```", text)
    best: dict[str, float] = {}
    for b in blocks:  # LAST valid medians block wins: re-records
        try:           # supersede older ones regardless of row count
            d = json.loads(b)
        except json.JSONDecodeError:
            continue
        if len(d) >= 50 and all(
            isinstance(v, (int, float)) for v in d.values()
        ):
            best = d
    return best


# Documented run-to-run variance bands (BASELINE.md r9 section): these
# queries are iterative MLlib fits whose wall time is GC-sensitive at a
# measured multi-x spread on an IDLE host, so a ratio-vs-median flag
# carries no signal inside the band.  A measurement within [lo, hi]
# seconds is reported as in-band, not as a mover; outside the band it
# flags like any other query.
VARIANCE_BANDS: dict[str, tuple[float, float]] = {
    # r9 measured: median-of-5 6.45 s, spread 6.25-18.6 s in ONE warm
    # session (first-call fit pays MLlib codegen+block warmup); r8
    # observed 5.8-20 s across sessions.  Band = [4, 21] s.
    "als_part_recommendations": (4.0, 21.0),
}


def main() -> int:
    bench_path = sys.argv[1]
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = baseline_medians(os.path.join(repo, "BASELINE.md"))
    bench = json.load(open(bench_path))["queries"]
    common = sorted(set(base) & set(bench))
    new = sorted(set(bench) - set(base))
    gone = sorted(set(base) - set(bench))
    tot_new = sum(bench[q] for q in common)
    tot_old = sum(base[q] for q in common)
    print(
        f"common rows: {len(common)}  aggregate {tot_old:.1f}s -> "
        f"{tot_new:.1f}s  ({tot_new / tot_old:.2f}x)"
    )
    in_band = [
        q for q in common
        if q in VARIANCE_BANDS
        and VARIANCE_BANDS[q][0] <= bench[q] <= VARIANCE_BANDS[q][1]
    ]
    movers = [
        (bench[q] / base[q], q, base[q], bench[q])
        for q in common
        if q not in in_band
        and (bench[q] / base[q] > threshold or base[q] / bench[q] > threshold)
    ]
    for q in in_band:
        lo, hi = VARIANCE_BANDS[q]
        print(
            f"  band   {q}: {bench[q]:.3f}s within documented "
            f"[{lo:.1f}, {hi:.1f}]s variance band (not a mover)"
        )
    for r, q, o, n in sorted(movers, reverse=True):
        print(f"  {r:5.2f}x  {q}: {o:.3f} -> {n:.3f}")
    if not movers:
        print(f"  no movers beyond {threshold}x")
    # sub-second rows are the documented host-noise band; count them
    noisy = sum(1 for _, q, o, n in movers if max(o, n) < 1.0)
    if movers:
        print(f"  ({noisy}/{len(movers)} movers are sub-second noise-band rows)")
    if new:
        print("new (no baseline):", {q: bench[q] for q in new})
    if gone:
        print("missing from bench:", gone)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
