"""Per-query optimization profiler (guide §1: measure first).

For each named catalog query: one unmeasured warm-up (codegen JIT), then
N timed cold runs (catalog cache cleared per run, same methodology as
bench.py), reporting the median wall time plus the JOB and STAGE counts
the run scheduled (via the status tracker + a job group) — the stage
count is the local[32] proxy for exchange/barrier count, which is what
dominates at sf0.1 where every table is megabytes.

Optionally writes ``plans/r11/<name>_{before,after}.txt`` with
``.explain("formatted")`` when ``--plans before|after`` is given.

Usage:
  python tools/profile_queries.py [--sf DIR] [--repeat N]
         [--plans before|after] query [query ...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plans", choices=["before", "after"], default=None)
    ap.add_argument("--plans-dir", default="r12",
                    help="subdirectory of plans/ for explain dumps")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    sc = spark.sparkContext
    qs = plans.queries()
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.plans_dir)
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.names:
        if name not in qs:
            print(f"{name}: NOT IN CATALOG", flush=True)
            continue
        fn = qs[name]
        # warm-up (uncounted): codegen + parquet footers + broadcast JIT
        spark.catalog.clearCache()
        try:
            fn(spark, args.sf).count()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {e}", flush=True)
            continue
        if args.plans:
            with io.StringIO() as buf, redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
                text = buf.getvalue()
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"),
                      "w") as f:
                f.write(text)
        samples: list[float] = []
        jobs = stages = tasks = 0
        for i in range(args.repeat):
            spark.catalog.clearCache()
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, args.sf)
            n = df.count()
            samples.append(time.time() - t0)
            sc.setJobGroup(None, None)
            if i == args.repeat - 1:
                st = sc.statusTracker()
                ids = st.getJobIdsForGroup(group)
                jobs = len(ids)
                for jid in ids:
                    info = st.getJobInfo(jid)
                    if info is not None:
                        stages += len(info.stageIds)
                        for sid in info.stageIds:
                            si = st.getStageInfo(sid)
                            if si is not None:
                                tasks += si.numTasks
        samples.sort()
        med = samples[len(samples) // 2]
        print(
            f"{name}: median {med:.3f}s over {args.repeat} "
            f"(min {samples[0]:.3f}, max {samples[-1]:.3f}); "
            f"last run: {jobs} jobs, {stages} stages, {tasks} tasks; "
            f"rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
