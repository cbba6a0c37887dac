"""Invariants for the corpus-stats / funnel / cross-modal queries
(doc_repetition, corpus_top_tokens, embedding_gated_curation,
purchase_funnel).  Hash-parity vs DuckDB is the driver gate; these pin
scale-independent semantics at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

Q = plans.QUERIES


def test_doc_repetition_ratios_bounded(spark, sf_dir):
    df = Q["doc_repetition"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 1 <= r.n_distinct <= r.n_tokens
        assert 0.0 <= r.repetition_ratio < 1.0
        # hottest token can't have more than its share of total, and at
        # least 1/n_distinct of it
        assert r.top_token_share * r.n_tokens >= 1 - 1e-4

def test_corpus_top_tokens_sorted_and_capped(spark, sf_dir):
    rows = Q["corpus_top_tokens"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_embedding_gate_filters_and_joins(spark, sf_dir):
    df = Q["embedding_gated_curation"].fn(spark, sf_dir)
    rows = df.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < len(rows) < n_docs  # the gate must actually drop something
    for r in rows:
        assert r.max_abs <= 0.35
        assert abs(r.l2_norm - 1.0) < 1e-3  # testdata vectors are unit-norm
        assert r.quality_score >= 0.5


def test_purchase_funnel_monotone(spark, sf_dir):
    r = Q["purchase_funnel"].fn(spark, sf_dir).first()
    assert r.n_viewed >= r.n_clicked >= r.n_purchased >= 0
    assert 0.0 <= r.view_to_click <= 1.0
    assert 0.0 <= r.click_to_purchase <= 1.0
    # cross-check n_viewed against a direct distinct count
    e = load_table(spark, sf_dir, "events")
    n_viewers = (
        e.filter(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert r.n_viewed == n_viewers


def test_contamination_flags_benchmark_overlap(spark, sf_dir):
    df = Q["benchmark_contamination"].fn(spark, sf_dir)
    rows = df.collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.filter(F.col("source") != "src0").count()
    for r in rows:
        assert 0 <= r.n_overlap <= r.n_grams
        assert 0.0 <= r.overlap_frac <= 1.0
        assert r.contaminated == (1 if r.overlap_frac >= 0.1 else 0)
