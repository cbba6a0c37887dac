"""Pathological-text differential sweep: the corpus-operator edge-case
gate.

Rewrites the text of half the documents (deterministically by doc_id
mod 10) into adversarial shapes — two exact-duplicate pools (dedup /
greedy-drop tie stress), empty strings, a multibyte unicode +
punctuation soup, and a single repeated token — then runs the full
Spark-vs-DuckDB oracle differential.

Round-5 first run: 194/195 — the one failure was real: DuckDB's
``levenshtein`` counts BYTES while Spark's counts codepoints, so the
SymSpell verify disagreed on multibyte tokens.  ``fuzzy_vocab_
correction`` now uses the positional delete-variant predicate (no
levenshtein at all); 195/195 after.

Usage: python tools/text_sweep.py [src_sf_dir] [query ...]
Exit code is check_oracle's (0 iff all queries match).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_POOL_A = "the quick brown fox jumps over the lazy dog again and again"
_POOL_B = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
_UNICODE = "héllo wörld — naïve café 日本語テキスト!!! ??? ;;; :::"
_REPEAT = "spam " * 11 + "spam"


def build_text_adversarial(src: str, dst: str) -> None:
    spark = get_spark("text-sweep-build")
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "documents":
            m = F.pmod(F.col("doc_id"), F.lit(10))
            new_text = (
                F.when(m == 5, F.lit(_POOL_A))
                .when(m == 6, F.lit(_POOL_B))
                .when(m == 7, F.lit(""))
                .when(m == 8, F.lit(_UNICODE))
                .when(m == 9, F.lit(_REPEAT))
                .otherwise(F.col("text"))
            )
            types = dict(df.dtypes)
            df = df.withColumn("text", new_text).withColumn(
                "n_chars",
                F.length(F.coalesce(F.col("text"), F.lit("")))
                .cast(types["n_chars"]),
            )
        tmpd = f"{dst}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmpd)
        shutil.move(glob.glob(f"{tmpd}/part-*.parquet")[0],
                    f"{dst}/{t}.parquet")
        shutil.rmtree(tmpd)
    spark.stop()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    queries = sys.argv[2:]
    dst = tempfile.mkdtemp(prefix="text_sweep_")
    try:
        build_text_adversarial(src, dst)
        here = os.path.dirname(os.path.abspath(__file__))
        return subprocess.call(
            [sys.executable, os.path.join(here, "check_oracle.py"), dst,
             *queries]
        )
    finally:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
