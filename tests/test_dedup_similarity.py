"""Near-dup / similarity operators: planted-duplicate recovery and
cross-method consistency on synthetic corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators import dedup as D
from real___time_fraud_detection_using_apache_kafka_spark.operators import (
    similarity as SIM,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """12 docs: (1,2) near-dups, (3,4) exact dups, rest unrelated."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = [
        "completely different text about spark distributed query engines",
        "yet another unrelated document mentioning kafka streams and state",
        "numerical linear algebra with vectors matrices and tensor products",
        "cooking recipes for pasta pizza and assorted italian desserts",
        "mountain hiking trails weather forecasts and safety equipment",
        "financial markets bonds equities derivatives and risk models",
        "gardening tips for roses tulips and seasonal vegetable patches",
        "astronomy telescopes planets comets and deep sky observation",
    ]
    rows = (
        [(1, base), (2, near), (3, other[0]), (4, other[0])]
        + [(5 + i, t) for i, t in enumerate(other[1:])]
    )
    return spark.createDataFrame(
        [(i, t, "en", len(t)) for i, t in rows], ["doc_id", "text", "lang", "n_chars"]
    )


def test_ngram_jaccard_finds_planted_pairs(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(corpus, n=3, threshold=0.5).collect()
    }
    assert (1, 2) in pairs  # near-dup
    assert (3, 4) in pairs  # exact dup
    assert all(a in (1, 3) for a, b in pairs)  # no false positives


def test_ngram_jaccard_prefix_orders_agree(corpus):
    """Prefix ordering (hash vs global-df) changes only the CANDIDATE set,
    never the verified result — both orders must emit identical pairs and
    identical jaccard values."""
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    hash_rows = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(
            corpus, n=3, threshold=0.5, prefix_order="hash"
        ).collect()
    )
    df_rows = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(
            corpus, n=3, threshold=0.5, prefix_order="df"
        ).collect()
    )
    assert hash_rows == df_rows


def test_minhash_lsh_finds_planted_pairs(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_pairs(corpus, n=3, threshold=0.5).collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    # verification step guarantees: every reported pair really has j >= 0.5
    for r in D.minhash_lsh_pairs(corpus, n=3, threshold=0.5).collect():
        assert r["jaccard"] >= 0.5


def test_minhash_exact_dup_has_identical_signature(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    rows = sorted(D.minhash_signatures(df, n=2).collect(), key=lambda r: r["doc_id"])
    cols = [c for c in rows[0].asDict() if c != "doc_id"]
    assert [rows[0][c] for c in cols] == [rows[1][c] for c in cols]


def test_simhash_exact_dup_identical_and_unrelated_far(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words about completely other topics here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["simhash"] for r in D.simhash(df).collect()}
    assert got[1] == got[2]
    assert bin(got[1] ^ got[3]).count("1") > 4


@pytest.fixture(scope="module")
def vectors(spark):
    """id 0/1 nearly parallel, id 2 orthogonal, id 3 opposite."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_orders_by_cosine(vectors):
    probes = vectors.filter(F.col("vec_id") == 0)
    got = SIM.brute_force_topk(probes, vectors, k=3).collect()
    order = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]
    assert got[0]["cosine"] > 0.99


def test_cosine_neardup_pairs_threshold(vectors):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_neardup_pairs(vectors, threshold=0.9).collect()
    }
    assert pairs == {(0, 1)}

def test_ivf_full_probe_equals_brute_force(spark):
    """n_probe = n_centroids scores every cell -> IVF must reproduce the
    exact brute-force top-k bit for bit."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(probes, emb, k=5)
    ivf = SIM.ivf_topk(probes, emb, k=5, n_centroids=4, n_probe=4)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    e = [(r["query_id"], r["rank"], r["neighbor_id"]) for r in sorted(exact.collect(), key=key)]
    i = [(r["query_id"], r["rank"], r["neighbor_id"]) for r in sorted(ivf.collect(), key=key)]
    assert e == i


def test_ivf_partial_probe_recall(spark):
    """Probing half the cells keeps recall@5 high on the testdata corpus
    (clustered embeddings -> neighbors share cells)."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    exact = SIM.brute_force_topk(probes, emb, k=5)
    ivf = SIM.ivf_topk(probes, emb, k=5, n_centroids=8, n_probe=4)
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.7, f"recall@5 = {recall:.2f}"


def test_connected_components_multihop_chain(spark):
    """Min-label propagation must traverse chains (a-b, b-c, c-d => one
    component labeled a), not just direct pairs — plus an independent
    pair keeps its own label."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_curate_lsh_matches_exact(spark, sf_dir):
    """The LSH-candidate curation (100 TB shape) agrees with the exact
    pipeline on the real corpus: LSH can only MISS pairs (no false
    positives), so its kept-set is a superset — and on this corpus,
    where planted near-dups are unambiguous, exactly equal."""
    from real___time_fraud_detection_using_apache_kafka_spark import plans

    exact = {
        r.doc_id
        for r in plans.QUERIES["curate_documents"].fn(spark, sf_dir).collect()
    }
    lsh = {
        r.doc_id
        for r in plans.QUERIES["curate_documents_lsh"].fn(spark, sf_dir).collect()
    }
    assert lsh >= exact
    assert lsh == exact


def test_pca_reduce_projects_to_k_dims(spark):
    from real___time_fraud_detection_using_apache_kafka_spark.ml.embedding import pca_reduce

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    red, model = pca_reduce(emb, k=16)
    row = red.first()
    assert len(row.embedding) == 16
    # components capture decreasing variance by construction
    ev = list(model.explainedVariance)
    assert ev == sorted(ev, reverse=True)
    # a second frame transformed with the SAME model lands in the same basis
    red2, _ = pca_reduce(emb.limit(10), k=16, model=model)
    a = {r.vec_id: r.embedding for r in red.filter("vec_id < 10").collect()}
    b = {r.vec_id: r.embedding for r in red2.collect()}
    assert all(a[i] == b[i] for i in a)


def test_pca_ivf_rerank_beats_plain_ivf_and_keeps_exact_scores(spark):
    """The reduce->probe->re-rank tier must (a) reach higher recall than
    plain IVF probing the same corpus fraction at its default budget and
    (b) emit EXACT full-space cosines for every returned pair — scores
    never suffer from the reduced basis, only the shortlist does."""
    from real___time_fraud_detection_using_apache_kafka_spark.ml.embedding import pca_ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 50)
    truth = SIM.brute_force_topk(probes, emb, k=5)
    t = {(r.query_id, r.neighbor_id) for r in truth.collect()}
    approx = pca_ivf_topk(
        probes, emb, k=5, pca_k=32, oversample=6, n_centroids=16, n_probe=8
    )
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.7, f"recall@5 = {recall:.2f}"
    td = {(r.query_id, r.neighbor_id): r.cosine for r in truth.collect()}
    ad = {(r.query_id, r.neighbor_id): r.cosine for r in approx.collect()}
    assert all(abs(td[p] - ad[p]) < 1e-9 for p in (t & a))


def test_hyperplane_lsh_recall_and_no_false_positives(spark):
    """Banded hyperplane LSH on the testdata embeddings: every reported
    pair must be a true pair (exact verify), and recall vs the exact
    all-pairs tier must be high at the same threshold."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_neardup_pairs(emb, threshold=0.45).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in SIM.hyperplane_lsh_pairs(emb, threshold=0.45).collect()
    }
    assert lsh <= exact  # exact verification -> no false positives
    assert exact, "fixture must contain at least one true pair"
    recall = len(lsh & exact) / len(exact)
    # r8 multi-probe defaults measure 0.986 at sf0.1 / 1.0 at sf0.001;
    # pin well above the old no-probe 0.93 so a probe regression fails
    assert recall >= 0.95, f"recall {recall:.2f} too low"


def test_knn_graph_matches_brute_force(spark):
    """The block-kernel kNN graph (local top-k per block + exact re-rank)
    must equal the naive all-queries brute force — same neighbors, same
    ranks, same folded cosines — on the full sf0.001 embeddings table."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.similarity import (
        brute_force_topk,
        knn_graph_topk,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in knn_graph_topk(emb, k=4, n_blocks=4).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_topk(emb, emb, k=4).collect()
    }
    assert got == want


def test_knn_graph_empty_corpus(spark):
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    from real___time_fraud_detection_using_apache_kafka_spark.operators.similarity import knn_graph_topk

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    empty = spark.createDataFrame([], schema)
    assert knn_graph_topk(empty, k=3).count() == 0


def test_hyperplane_lsh_hot_bucket_chunked_parity(spark, monkeypatch):
    """r12 (VERDICT r11 item 1): the cogrouped bucket kernel slices its
    probe side so a degenerate hot bucket (many near-identical vectors
    sharing every band pattern) costs O(chunk x bucket) worker memory,
    not O(bucket^2).  Chunking must not change the emitted pair set:
    run a duplicate-heavy corpus with the chunk forced far below the
    bucket size and compare against the default-chunk output."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    # 120 near-identical vectors -> one all-pairs hot bucket per band
    for i in range(120):
        v = base + 0.001 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    for i in range(120, 200):
        rows.append((i, [float(x) for x in rng.standard_normal(16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.9, bands=2, planes_per_band=6)
    want = {
        (r.id_a, r.id_b, r.cosine)
        for r in SIM.hyperplane_lsh_pairs(emb, **kw).collect()
    }
    # the hot bucket really is all-pairs-dense: every near-identical
    # pair is a true pair and must have surfaced
    assert len(want) >= 120 * 119 // 2
    monkeypatch.setattr(SIM, "_LSH_PROBE_CHUNK", 16)
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in SIM.hyperplane_lsh_pairs(emb, **kw).collect()
    }
    assert got == want


def test_hyperplane_lsh_string_ids(spark):
    """ADVICE r11: the bucket-join output schema must follow the
    caller's id type — the r11 rewrite hard-coded bigint and a string
    id corpus failed at runtime."""
    emb = spark.createDataFrame(
        [
            ("a", [1.0, 0.0, 0.0, 0.0]),
            ("b", [1.0, 1e-4, 0.0, 0.0]),
            ("c", [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    got = {
        (r.id_a, r.id_b)
        for r in SIM.hyperplane_lsh_pairs(
            emb, threshold=0.9, bands=4, planes_per_band=4
        ).collect()
    }
    assert got == {("a", "b")}


def test_shingled_hash_values_unchanged(spark):
    """r12 (VERDICT r11 item 2): `_shingled` rebuilt its shingle strings
    from a once-bound token array — the xxhash64 VALUES (which MinHash
    banding recall depends on) must be bit-identical to the original
    `transform(word_ngrams(text, n), xxhash64)` formula, in the same
    array order."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.text import (
        word_ngrams,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a a a a a a"),                      # duplicate shingles
        (2, "one two"),                           # shorter than n=3
        (3, ""),                                  # empty text
        (4, "unicode éè tokens 中文 here again ok"),
        (5, "x y z x y z x y z"),                 # repeating pattern
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(word_ngrams(F.col("text"), 3), lambda s: F.xxhash64(s))
        ).alias("sh"),
    ).filter(F.size("sh") > 0)
    want = {r.doc_id: r.sh for r in old.collect()}
    got = {r.doc_id: r.sh for r in D._shingled(docs, 3).collect()}
    assert got == want
