"""Capture `.explain("formatted")` for named queries into plans/r11/.

Explain-only (no execution), so it can run alongside other work.

Usage: python tools/capture_plans.py <suffix> query [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans")
    qs = plans.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN CATALOG")
            continue
        with io.StringIO() as buf, redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
            text = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: plan written ({len(text)} bytes)")


if __name__ == "__main__":
    main()
