"""Curation-path scaling smoke: times the document operators on synthetic
corpora of increasing size (default 5k / 50k / 200k docs, ~1% planted
near-dups) — the local stand-in for "does the text pipeline survive 10×?".

Usage: python tools/scaling_smoke_docs.py [sizes...]
Appends nothing; prints a markdown table for SCALE.md.

Corpus synthesis is all JVM column expressions (seeded, reproducible):
each doc is 40-70 tokens drawn from a small vocabulary via per-row
``shuffle``; every 100th doc copies its neighbor's text to plant an
exact near-dup, so the dedup self-join sees a realistic (sparse)
duplicate structure instead of a pathological all-pairs block.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators import dedup as D
from real___time_fraud_detection_using_apache_kafka_spark.operators import text as TX
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "line", "sort", "window", "spark", "order",
    "data", "column", "join", "small", "customer", "query", "big", "the",
    "a", "stream", "group", "vector", "filter", "grain", "shard", "codec",
    "probe", "build", "spill", "fold", "page", "block", "tune",
]


def synth_docs(spark, n: int, seed: int = 7):
    base = (
        spark.range(n)
        .withColumn("doc_id", F.col("id"))
        .withColumn("n_tok", (F.abs(F.hash(F.col("id") + seed)) % 31 + 40))
        .withColumn(
            "toks",
            F.expr(
                f"transform(sequence(1, n_tok), "
                f"i -> {_vocab_sql()}[pmod(hash(id, i, {seed}), {len(VOCAB)})])"
            ),
        )
    )
    docs = base.select(
        "doc_id",
        F.concat_ws(" ", "toks").alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    # plant ~1% duplicates: doc_id % 100 == 1 copies doc_id - 1's text
    dups = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    originals = docs.filter(F.col("doc_id") % 100 != 1)
    return originals.unionByName(dups)


def _vocab_sql() -> str:
    inner = ", ".join(f"'{w}'" for w in VOCAB)
    return f"array({inner})"


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [5_000, 50_000, 200_000]
    spark = get_spark("scaling-smoke-docs")
    print("| docs | quality score | repetition stats | minhash LSH pairs | jaccard near-dup |")
    print("|---|---|---|---|---|")
    for n in sizes:
        path = f"/tmp/smoke_docs_{n}"
        synth_docs(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        docs.count()  # warm footers

        t0 = time.time()
        TX.quality_score(docs).agg(F.sum("keep")).collect()
        t_q = time.time() - t0

        t0 = time.time()
        toks = docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        (
            toks.groupBy("doc_id", "tok").count()
            .groupBy("doc_id")
            .agg(F.sum("count"), F.count("*"))
            .agg(F.count("*"))
            .collect()
        )
        t_rep = time.time() - t0

        t0 = time.time()
        n_mh = D.minhash_lsh_pairs(docs, n=3, bands=4, rows_per_band=4,
                                   threshold=0.5).count()
        t_mh = time.time() - t0

        # The exact tier is capped: on this deliberately low-entropy
        # corpus (40-word vocab) every shingle is common, so prefix-
        # filter candidate generation degenerates quadratically — the
        # measured cliff that makes MinHash LSH the scale path.
        if n <= 50_000:
            t0 = time.time()
            n_jc = D.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                         band_width=200).count()
            jc = f"{time.time() - t0:.2f} s ({n_jc} pairs)"
        else:
            jc = "skipped (exact tier; use LSH)"
        spark.catalog.clearCache()
        print(
            f"| {n//1000}k | {t_q:.2f} s | {t_rep:.2f} s | "
            f"{t_mh:.2f} s ({n_mh} pairs) | {jc} |"
        )


if __name__ == "__main__":
    main()
