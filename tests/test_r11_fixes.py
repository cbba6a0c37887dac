"""Round-11 regression tests for the ADVICE r10 fixes:

- connected_components drops NULL endpoints BEFORE tier choice, so the
  driver union-find tier and the distributed fixpoint agree (the loop
  silently ignored NULL-endpoint edges — equality joins never match —
  while the driver tier raised TypeError comparing None to an id),
- DuckDB oracle tokenizers spell the explicit whitespace class
  ``[ \\t\\r\\n\\f\\v]+``: Java's ``\\s`` includes vertical tab, RE2's
  does not, so a ``\\x0B`` document would otherwise tokenize
  differently across engines and fail the hash gate spuriously.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestCCNullEdges:
    def _pairs(self, spark):
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType(
            [StructField("doc_a", LongType()), StructField("doc_b", LongType())]
        )
        return spark.createDataFrame(
            [(1, 2), (2, 3), (None, 5), (5, None), (None, None), (7, 8)],
            schema,
        )

    def test_driver_tier_ignores_null_endpoints(self, spark):
        """ADVICE r10 (dedup.py): a (NULL, 5) pair used to crash the
        driver union-find with TypeError; now NULL endpoints are not
        edges at all, so 5 simply never enters the graph."""
        from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
            connected_components,
        )

        stats: dict = {}
        out = connected_components(self._pairs(spark), stats=stats)
        assert stats["tier"] == "driver-unionfind"
        got = {(r.doc_id, r.cluster_id) for r in out.collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}

    def test_tiers_agree_on_null_endpoints(self, spark):
        """Both tiers must return the identical labeling for a graph
        containing NULL-endpoint pairs (tier choice is a performance
        threshold, never a semantics switch)."""
        from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
            connected_components,
        )

        driver = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(self._pairs(spark)).collect()
        }
        dist = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(
                self._pairs(spark), driver_edge_threshold=0
            ).collect()
        }
        assert driver == dist


class TestOracleTokenizerClass:
    def test_vertical_tab_tokenizes_identically(self, spark):
        """ADVICE r10 (queries_sketch.py oracle): 'a\\x0Bb' is TWO
        tokens under Java \\s (the Spark side) and must be two tokens
        under the oracle's explicit class — RE2's \\s would give one."""
        duckdb = pytest.importorskip("duckdb")
        from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_text import (
            WS_CLASS,
        )

        text = "a\x0bb  c\td"
        n_spark = spark.createDataFrame([(text,)], ["text"]).select(
            F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).head()[0]
        con = duckdb.connect()
        n_class = con.execute(
            "SELECT len(string_split_regex(trim(?), ?))", [text, WS_CLASS]
        ).fetchone()[0]
        n_re2_s = con.execute(
            "SELECT len(string_split_regex(trim(?), '\\s+'))", [text]
        ).fetchone()[0]
        con.close()
        assert n_spark == 4
        assert n_class == 4
        assert n_re2_s == 3  # the divergence the explicit class closes

    def test_no_bare_s_class_left_in_oracles(self):
        """Every oracle tokenizer must use the explicit class; a bare
        '\\s+' in a string_split_regex call is the cross-engine hazard
        coming back."""
        import glob
        import os

        pkg = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "real___time_fraud_detection_using_apache_kafka_spark",
            "plans",
        )
        offenders = []
        for path in glob.glob(os.path.join(pkg, "*.py")):
            src = open(path).read()
            if "string_split_regex(trim(text), '\\\\s+')" in src:
                offenders.append(os.path.basename(path))
        assert not offenders, offenders


class TestLshRecallAuditContract:
    def test_green_and_content_only_on_testdata(self, spark, sf_dir):
        """On the driver corpora the audit yields ONLY exact_pair
        content rows (measured recall above the floor, no phantoms)."""
        from real___time_fraud_detection_using_apache_kafka_spark.plans.registry import (
            QUERIES,
        )

        rows = QUERIES["embedding_lsh_recall_audit"].fn(spark, sf_dir).collect()
        assert rows and all(r.kind == "exact_pair" for r in rows)

    def test_floor_trips_on_broken_retrieval(self, spark, sf_dir, monkeypatch):
        """Falsifiability: an LSH tier that returns nothing (a seeding/
        banding/bucket-join break collapses recall toward 0) must
        surface the recall_floor violation row — the loud row-count
        mismatch at the driver's gate."""
        from real___time_fraud_detection_using_apache_kafka_spark.operators import (
            similarity as SIM,
        )
        from real___time_fraud_detection_using_apache_kafka_spark.plans.registry import (
            QUERIES,
        )

        real = SIM.hyperplane_lsh_pairs

        def broken(emb, **kw):
            return real(emb, **kw).limit(0)

        monkeypatch.setattr(SIM, "hyperplane_lsh_pairs", broken)
        rows = QUERIES["embedding_lsh_recall_audit"].fn(spark, sf_dir).collect()
        floors = [r for r in rows if r.kind == "recall_floor"]
        assert len(floors) == 1
        assert floors[0].id_a == 0  # n_found
        assert floors[0].id_b == len(rows) - 1  # n_exact

    def test_phantom_trips_on_subset_violation(self, spark, sf_dir, monkeypatch):
        """A fabricated LSH pair absent from the exact set must surface
        as a phantom row (even one is a genuine bug: both tiers verify
        with the same rounded cosine and threshold)."""
        from pyspark.sql import functions as F

        from real___time_fraud_detection_using_apache_kafka_spark.operators import (
            similarity as SIM,
        )
        from real___time_fraud_detection_using_apache_kafka_spark.plans.registry import (
            QUERIES,
        )

        real = SIM.hyperplane_lsh_pairs

        def fabricating(emb, **kw):
            fake = emb.sparkSession.createDataFrame(
                [(999_999_001, 999_999_002, 0.99)], "id_a long, id_b long, cosine double"
            )
            return real(emb, **kw).unionByName(fake)

        monkeypatch.setattr(SIM, "hyperplane_lsh_pairs", fabricating)
        rows = QUERIES["embedding_lsh_recall_audit"].fn(spark, sf_dir).collect()
        phantoms = [r for r in rows if r.kind == "phantom"]
        assert [(p.id_a, p.id_b) for p in phantoms] == [(999_999_001, 999_999_002)]


class TestKnnIvfRecallAuditContract:
    def test_green_and_content_only_on_testdata(self, spark, sf_dir):
        from real___time_fraud_detection_using_apache_kafka_spark.plans.registry import (
            QUERIES,
        )

        rows = QUERIES["knn_ivf_recall_audit"].fn(spark, sf_dir).collect()
        assert rows and all(r.kind == "exact_top5" for r in rows)

    def test_floor_trips_on_broken_index(self, spark, sf_dir, monkeypatch):
        """A broken IVF index (returns nothing) must surface the
        aggregate recall_floor violation row."""
        from real___time_fraud_detection_using_apache_kafka_spark.operators import (
            similarity as SIM,
        )
        from real___time_fraud_detection_using_apache_kafka_spark.plans.registry import (
            QUERIES,
        )

        real = SIM.ivf_topk

        def broken(q, c, **kw):
            return real(q, c, **kw).limit(0)

        monkeypatch.setattr(SIM, "ivf_topk", broken)
        rows = QUERIES["knn_ivf_recall_audit"].fn(spark, sf_dir).collect()
        floors = [r for r in rows if r.kind == "recall_floor"]
        assert len(floors) == 1
        assert floors[0].query_id == 0  # n_hits
        assert floors[0].neighbor_id == len(rows) - 1  # n_exact

    def test_score_mismatch_trips_on_wrong_scores(self, spark, sf_dir, monkeypatch):
        """The tier promises exact verification of retrieved pairs; an
        off-by-anything reported cosine must surface per-row."""
        from pyspark.sql import functions as F

        from real___time_fraud_detection_using_apache_kafka_spark.operators import (
            similarity as SIM,
        )
        from real___time_fraud_detection_using_apache_kafka_spark.plans.registry import (
            QUERIES,
        )

        real = SIM.ivf_topk

        def skewed(q, c, **kw):
            return real(q, c, **kw).withColumn(
                "cosine", F.round(F.col("cosine") + 0.001, 6)
            )

        monkeypatch.setattr(SIM, "ivf_topk", skewed)
        rows = QUERIES["knn_ivf_recall_audit"].fn(spark, sf_dir).collect()
        mism = [r for r in rows if r.kind == "score_mismatch"]
        exact = [r for r in rows if r.kind == "exact_top5"]
        assert mism and exact  # every retrieved pair flags; content intact
