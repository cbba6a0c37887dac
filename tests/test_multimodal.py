"""Multimodal binary plumbing: packing, Arrow-batched mapInPandas decode,
schema/feature contract (codec itself is a documented deterministic stub)."""

from __future__ import annotations

from real___time_fraud_detection_using_apache_kafka_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_blobs,
    pack_blobs,
)


def test_pack_decode_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 1000)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in decode_blobs(pack_blobs(docs)).collect()}
    assert out[1]["format"] == "IMG0"
    assert out[1]["byte_len"] == len("hello world") + 4
    assert out[2]["byte_len"] == 4
    assert out[3]["byte_len"] == 1004
    for r in out.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["feature"])
        assert 1 <= r["width"] <= 64
        assert 1 <= r["height"] <= 48


def test_decode_deterministic(spark):
    docs = spark.createDataFrame([(i, f"doc {i} text") for i in range(20)],
                                 ["doc_id", "text"])
    a = sorted(map(tuple, decode_blobs(pack_blobs(docs)).collect()))
    b = sorted(map(tuple, decode_blobs(pack_blobs(docs)).collect()))
    assert a == b


def test_decode_distributed_over_partitions(spark):
    """The decode is a narrow map — row multiplicity and content survive an
    arbitrary repartition (no partition-boundary effects in mapInPandas)."""
    docs = spark.createDataFrame([(i, f"text {i}") for i in range(100)],
                                 ["doc_id", "text"])
    one = decode_blobs(pack_blobs(docs).coalesce(1)).collect()
    many = decode_blobs(pack_blobs(docs).repartition(8)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_arrow_tier_matches_pandas_tier(spark):
    """mapInArrow decode must produce byte-identical results to the
    mapInPandas tier — same stub kernel, different batch plumbing."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.multimodal import (
        decode_blobs_arrow,
    )

    docs = spark.createDataFrame(
        [(i, f"document {i} body " * (i % 7)) for i in range(50)],
        ["doc_id", "text"],
    )
    packed = pack_blobs(docs)
    pandas_rows = sorted(map(tuple, decode_blobs(packed).collect()))
    arrow_rows = sorted(map(tuple, decode_blobs_arrow(packed).collect()))
    assert arrow_rows == pandas_rows


def test_resize_images_target_and_determinism(spark):
    from real___time_fraud_detection_using_apache_kafka_spark.operators.multimodal import (
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 2000), (2, "tiny"), (3, "")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in resize_images(pack_blobs(docs)).collect()}
    assert all(r["width"] == 32 and r["height"] == 24 for r in got.values())
    assert len(got[1]["resized_blob"]) <= 32 * 24
    assert got[3]["resized_blob"] == b""  # empty payload -> empty thumb
    again = {r["doc_id"]: r for r in resize_images(pack_blobs(docs)).collect()}
    assert all(got[k]["resized_blob"] == again[k]["resized_blob"] for k in got)


def test_sample_frames_expansion_and_stride(spark):
    """One blob expands to ceil(n_frames / every_n) frame rows with
    correct indices/timestamps — and the expansion survives arbitrary
    repartitioning (pure narrow map)."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_MS,
        sample_frames,
    )

    n_bytes = FRAME_BYTES * 10 + 17  # 11 frames, last partial
    docs = spark.createDataFrame(
        [(1, "v" * n_bytes), (2, "v" * FRAME_BYTES)], ["doc_id", "text"]
    )
    rows = sample_frames(pack_blobs(docs), every_n=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    f1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f1] == [0, 4, 8]  # 11 frames, every 4th
    assert [r["ts_offset_ms"] for r in f1] == [0, 4 * FRAME_MS, 8 * FRAME_MS]
    assert all(len(r["frame"]) == FRAME_BYTES for r in f1[:2])
    assert [r["frame_idx"] for r in by_doc[2]] == [0]
    many = sample_frames(pack_blobs(docs).repartition(8), every_n=4).collect()
    assert sorted(map(tuple, many)) == sorted(map(tuple, rows))
