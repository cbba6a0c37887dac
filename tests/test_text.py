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
