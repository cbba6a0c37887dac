"""Text-analysis operators: tokenization laws, n-gram shingles, quality
features, language-ID heuristic, fingerprint determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators import text as TX


def _one(spark, text):
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_token_count_empty_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "two words"), (5, "a  b\tc")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", TX.token_count(F.col("text")).alias("n")).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}


def test_word_ngrams_short_doc_empty(spark):
    df = _one(spark, "only two")
    got = df.select(TX.word_ngrams(F.col("text"), 3).alias("g")).collect()[0]["g"]
    assert got == []


def test_word_ngrams_values_and_distinct(spark):
    df = _one(spark, "a b c a b c")  # 'a b c' appears twice -> distinct once
    got = df.select(TX.word_ngrams(F.col("text"), 3).alias("g")).collect()[0]["g"]
    assert sorted(got) == ["a b c", "b c a", "c a b"]


def test_quality_score_flags_junk(spark):
    df = spark.createDataFrame(
        [
            (1, "this is a perfectly reasonable document with many distinct "
                "informative words about various interesting topics overall"),
            (2, ",,,,....;;;;!!!???"),            # pure punctuation
            (3, "word word word word word word word word word word word word"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in TX.quality_score(df).collect()}
    assert got[1]["keep"] == 1
    assert got[2]["keep"] == 0       # punct ratio + short
    # repetitive doc: distinct-ratio penalty applies (-0.2) but alone does
    # not cross the keep threshold
    assert got[3]["q_distinct_ratio"] < 0.2
    assert got[3]["quality_score"] == got[1]["quality_score"] - 0.2


def test_lang_id_markers_and_und(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat of the mat and a dog"),
            (2, "der hund und die katze und das haus"),
            (3, "le chat et la maison et les chiens"),
            (4, "zzz qqq www"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in TX.lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_deterministic_and_content_addressed(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "different text")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["fingerprint"] for r in TX.fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    # stable across runs (pure function of content)
    again = {r["doc_id"]: r["fingerprint"] for r in TX.fingerprint(df).collect()}
    assert got == again


def test_scrub_pii_removes_every_match(spark, sf_dir):
    """Re-scanning scrubbed text with the same patterns finds nothing:
    the sentinel tokens contain no scannable spans."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.text import PII_PATTERNS, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org today"),
            (2, "see https://a.example.com/p?q=1 and http://b.io/x"),
            (3, "call +1-555-867-5309 or 555-123-4567 now"),
            (4, "nothing sensitive here"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    s = scrub_pii(df)
    rows = {r.doc_id: r for r in s.collect()}
    assert rows[1].n_email == 1 and "<EMAIL>" in rows[1].scrubbed_text
    assert rows[2].n_url == 2 and rows[2].scrubbed_text.count("<URL>") == 2
    assert rows[3].n_phone == 2
    assert rows[4].scrubbed_text == "nothing sensitive here"
    rescan = scrub_pii(s.select("doc_id", F.col("scrubbed_text").alias("text")))
    assert rescan.agg(
        F.sum(F.col("n_email") + F.col("n_url") + F.col("n_phone"))
    ).first()[0] == 0


def test_pack_training_sequences_partitions_corpus_exactly(spark, sf_dir):
    from real___time_fraud_detection_using_apache_kafka_spark import plans
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table
    from real___time_fraud_detection_using_apache_kafka_spark.operators.text import token_count

    df = plans.QUERIES["pack_training_sequences"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # every document lands in exactly one sequence
    assert df.agg(F.sum("n_docs")).first()[0] == docs.count()
    # token mass is conserved
    total_tok = docs.select(F.sum(token_count(F.col("text")))).first()[0]
    assert df.agg(F.sum("seq_tokens")).first()[0] == total_tok
    # within a source, seq_ids are dense from 0 and doc ranges don't
    # overlap: ordering by seq_id orders the (first_doc, last_doc) ranges
    for src_rows in (
        df.groupBy("source").agg(
            F.sort_array(F.collect_list(F.struct("seq_id", "first_doc", "last_doc"))).alias("seqs")
        ).collect()
    ):
        seqs = src_rows.seqs
        assert seqs[0].seq_id == 0
        for a, b in zip(seqs, seqs[1:]):
            assert a.last_doc < b.first_doc


def test_embedding_quantize_bounds_and_error(spark, sf_dir):
    from real___time_fraud_detection_using_apache_kafka_spark import plans

    df = plans.QUERIES["embedding_quantize_stats"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    # int8 range proof and sane reconstruction error for 64-dim vectors
    assert all(r.max_abs_q == 127 for r in rows)
    assert all(0 < r.avg_rel_err < 0.05 for r in rows)
    assert all(r.avg_scale > 0 for r in rows)


def test_mix_sources_budget_is_maximal_hash_prefix(spark, sf_dir):
    from real___time_fraud_detection_using_apache_kafka_spark import plans
    from real___time_fraud_detection_using_apache_kafka_spark.functions.hashing import poly_hash_expr
    from real___time_fraud_detection_using_apache_kafka_spark.operators.text import token_count
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table
    from pyspark.sql import Window

    kept = {
        r.source: r
        for r in plans.QUERIES["mix_sources_token_budget"].fn(spark, sf_dir).collect()
    }
    assert kept and all(r.kept_tokens <= 800 for r in kept.values())
    # maximality: the next doc in hash order would blow the budget
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        token_count(F.col("text")).alias("n_tok"),
        poly_hash_expr("text").alias("hv"),
        "doc_id",
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hv", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = (
        docs.withColumn("cum", F.sum("n_tok").over(w))
        .filter(F.col("cum") > 800)
        .groupBy("source")
        .agg(F.min("cum").alias("first_over"))
    )
    for r in nxt.collect():
        if r.source in kept:
            assert kept[r.source].kept_tokens < r.first_over


def test_doc_chunks_overlap_short_and_striding(spark):
    """A doc shorter than one chunk yields exactly one full-doc chunk; a
    longer doc strides by 12 with 4-token overlap and never emits a chunk
    fully contained in its predecessor."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_text import (
        doc_chunks_overlap,
    )
    import real___time_fraud_detection_using_apache_kafka_spark.plans.queries_text as QT

    short = "only five little tokens here"
    long = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short, "en", "s", len(short)), (2, long, "en", "s", len(long))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    orig = QT.load_table
    QT.load_table = lambda sp, sf, name: df  # noqa: ARG005
    try:
        rows = sorted(
            (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
            for r in doc_chunks_overlap(spark, "unused").collect()
        )
    finally:
        QT.load_table = orig
    by_doc = {}
    for doc, cid, n, txt in rows:
        by_doc.setdefault(doc, []).append((cid, n, txt))
    assert by_doc[1] == [(0, 5, short)]
    # 30 tokens, starts 1,13,25 -> chunks of 16,16,6 tokens
    assert [(c, n) for c, n, _ in by_doc[2]] == [(0, 16), (1, 16), (2, 6)]
    assert by_doc[2][1][2].startswith("w12 ")  # stride 12, 4-token overlap


def test_learn_bpe_merges_greedy_and_deterministic(spark):
    """BPE loop laws: the top pair merges corpus-wide each round, the
    rewrite is greedy left-to-right non-overlapping, and token mass is
    conserved (every original token appears, in order, inside the merged
    symbols)."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b c"),
            (2, "a b c d"),
            (3, "x y x y"),
        ],
        ["doc_id", "text"],
    )
    rewritten, merges = TX.learn_bpe_merges(docs, n_merges=2)
    # round 0: "a b" dominates (4 non-overlapping occurrences); round 1:
    # the NEW symbol pair (a+b, a+b) ties (x, y) at 2 and wins the
    # lexicographic tie-break — merges compose on merged symbols,
    # exactly BPE's behavior
    assert merges[0][1:3] == ("a", "b")
    assert merges[1][1:3] == ("a+b", "a+b")
    got = {r["doc_id"]: r["t"] for r in rewritten.collect()}
    assert got[1] == ["a+b+a+b", "a+b", "c"]
    assert got[2] == ["a+b", "c", "d"]
    assert got[3] == ["x", "y", "x", "y"]
    # determinism: same corpus -> same merge table
    _, merges2 = TX.learn_bpe_merges(docs, n_merges=2)
    assert merges == merges2


def test_learn_bpe_nonoverlap_rule(spark):
    """'a a a' with top pair (a,a) must merge the FIRST pair only —
    the merged symbol never re-matches the left side."""
    docs = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    rewritten, merges = TX.learn_bpe_merges(docs, n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    assert rewritten.collect()[0]["t"] == ["a+a", "a"]


def test_segment_dedup_rebuild_identity_and_accounting(spark, sf_dir):
    """Docs with zero dropped segments must rebuild to their exact
    original character length; dropped counts stay within bounds."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    out = QUERIES["corpus_segment_dedup"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("orig_chars")
    )
    rows = out.join(docs, "doc_id").collect()
    assert rows
    saw_clean = saw_dropped = False
    for r in rows:
        assert 0 <= r["n_dropped"] <= r["n_segs"]
        if r["n_dropped"] == 0:
            saw_clean = True
            assert r["clean_n_chars"] == r["orig_chars"], r["doc_id"]
        else:
            saw_dropped = True
            assert r["clean_n_chars"] < r["orig_chars"]
    assert saw_clean and saw_dropped  # planted dups make both cases real
