"""Multimodal column plumbing (driver-mandated extension): image/audio/
video as opaque ``binary`` columns with typed metadata, decoded /
feature-extracted via Arrow-batched ``mapInPandas``.

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernel is a clearly-marked deterministic stub —
but everything Spark-side is real and tested: the schema contract, the
binary packing, the Arrow batch shape through mapInPandas, and the
partition-parallel execution.  Swapping ``_decode_stub`` for a real codec
changes no Spark code.

Scale notes: mapInPandas streams Arrow record batches, so peak memory is
O(batch), not O(partition); decode is a narrow map (no shuffle) and
scales linearly with executors.  ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch size for fat blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output contract of the decode stage.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def pack_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Binary-column packing: UTF-8 bytes stand in for an image payload,
    with a 4-byte magic prefix so the 'format sniffing' path is real."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(b"IMG0"), F.encode(F.col(text_col), "utf-8")
        ).alias("blob"),
    )


def _decode_stub(blob: bytes) -> tuple[str, int, int, list[float]]:
    """STUB decoder — deterministic fake of an image decode.

    A real implementation would be::

        from PIL import Image; img = Image.open(io.BytesIO(blob))
        return img.format, img.width, img.height, extract_features(img)

    PIL is not installed in this container (environment constraint), so
    the stub derives deterministic pseudo-metadata from the bytes.  It
    preserves the exact control flow and types of a real decode.
    """
    fmt = blob[:4].decode("ascii", errors="replace")
    body = blob[4:]
    n = len(body)
    width = (n % 64) + 1
    height = (n % 48) + 1
    # 8 deterministic 'features': byte-histogram moments per stripe
    feature = []
    for k in range(FEATURE_DIM):
        stripe = body[k::FEATURE_DIM]
        feature.append(float(sum(stripe) % 997) / 997.0 if stripe else 0.0)
    return fmt, width, height, feature


def decode_blobs(packed: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, blob) batches."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, feats = [], [], [], []
            for blob in pdf["blob"]:
                if blob is None:
                    # missing payload -> null metadata, never a decoder
                    # crash: at ingest scale a null/corrupt blob is
                    # routine and must dead-letter, not kill the task
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    feats.append(None)
                    continue
                fmt, w, h, feat = _decode_stub(bytes(blob))
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["blob"].map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int32"),
                    "format": fmts,
                    # nullable Int32 so null-blob rows survive the Arrow
                    # conversion (plain int32 cannot hold a null)
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "feature": feats,
                }
            )

    return packed.mapInPandas(decode, DECODED_SCHEMA)


def decode_blobs_arrow(packed: DataFrame) -> DataFrame:
    """Arrow-NATIVE decode: ``mapInArrow`` over pyarrow RecordBatches.

    The zero-boxing tier of :func:`decode_blobs` — binary payloads stay
    as Arrow buffers end to end (``mapInPandas`` materializes every blob
    as a Python ``bytes`` inside an object-dtype pandas column first,
    which at multi-MB image/video blobs doubles memory and burns CPU on
    boxing).  Decode reads each blob via ``memoryview`` on the Arrow
    buffer, and the outputs are assembled straight into a RecordBatch.
    Same schema contract, same stub kernel, parity-tested against the
    pandas tier."""
    import pyarrow as pa

    arrow_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("byte_len", pa.int32()),
            pa.field("format", pa.string()),
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("feature", pa.list_(pa.float32())),
        ]
    )

    def decode(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            blobs = batch.column("blob")
            fmts, ws, hs, feats, lens = [], [], [], [], []
            for v in blobs:
                blob = v.as_py()  # bytes of THIS blob only, no column boxing
                if blob is None:  # null payload -> null metadata (see decode_blobs)
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    feats.append(None)
                    lens.append(None)
                    continue
                fmt, w, h, feat = _decode_stub(blob)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                feats.append(feat)
                lens.append(len(blob))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(lens, pa.int32()),
                    pa.array(fmts, pa.string()),
                    pa.array(ws, pa.int32()),
                    pa.array(hs, pa.int32()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                schema=arrow_schema,
            )

    return packed.mapInArrow(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_blob", T.BinaryType()),
    ]
)


def resize_images(packed: DataFrame, target_w: int = 32,
                  target_h: int = 24) -> DataFrame:
    """Resize stage (stub kernel, real plumbing): blob -> fixed-target
    thumbnail blob.  A real kernel is ``PIL.Image.resize``; the stub
    deterministically re-buckets the payload bytes to ``w*h`` output
    bytes (stride sampling), preserving the exact control flow, types,
    and one-in-one-out batch shape.  Narrow ``mapInPandas`` — no
    shuffle, O(batch) memory, scales with executors."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            out = []
            for blob in pdf["blob"]:
                body = bytes(blob)[4:]
                if not body:
                    out.append(b"")
                    continue
                stride = max(1, len(body) // n_out)
                out.append(body[::stride][:n_out])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "resized_blob": out,
                }
            )

    return packed.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_offset_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

FRAME_BYTES = 256
FRAME_MS = 40  # 25 fps


def sample_frames(packed: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling stage (stub kernel, real plumbing): one input blob
    -> MANY frame rows, keeping every ``every_n``-th frame.  A real
    kernel decodes a video container; the stub treats the payload as
    fixed-256-byte frames at 25 fps.  The 1->N row expansion is the part
    that matters for Spark: ``mapInPandas`` lets one input batch yield a
    differently-sized output batch, so frame explosion happens
    executor-side with no driver involvement and no shuffle; downstream
    per-frame ops see plain rows."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, blobs = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                body = bytes(blob)[4:]
                n_frames = (len(body) + FRAME_BYTES - 1) // FRAME_BYTES
                for k in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(k)
                    offs.append(k * FRAME_MS)
                    blobs.append(body[k * FRAME_BYTES:(k + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_offset_ms": pd.Series(offs, dtype="int32"),
                    "frame": blobs,
                }
            )

    return packed.mapInPandas(frames, FRAME_SCHEMA)
