"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are `binary` columns with a metadata struct;
decode / feature-extract run as Arrow-batched `mapInPandas` so each
batch amortizes codec startup. The actual codecs (PIL/ffmpeg/…) are
NOT in this container — decode is STUBBED behind `_decode_payload`,
which raises NotImplementedError unless `fake=True` produces the
deterministic test double. The Spark-side plumbing (schema,
partitioning, batch shape) is real and oracle-tested.

At 100 TB: payloads stay in parquet binary columns (no small-files
explosion); mapInPandas streams batches so executor memory is bounded
by batch size × payload size; metadata-only queries never touch the
bytes thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("byte_len", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("feature", ArrayType(DoubleType())),
])


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque media payload
    with typed metadata — the multimodal column pattern."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length("text").cast("long").alias("byte_len"),
    )


def _decode_payload(payload: bytes, fake: bool) -> tuple[int, list[float]]:
    """Decode stub. Real path needs a codec library (absent here).

    fake=True → deterministic double: n_frames = byte_len % 10 + 1,
    feature = first-4-byte values scaled to [0,1].
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/av/soundfile) not available in this "
            "container; pass fake=True for the deterministic test double")
    n_frames = len(payload) % 10 + 1
    feature = [b / 255.0 for b in payload[:4]]
    return n_frames, feature


def extract_features(payloads: DataFrame, batch_size: int = 256,
                     fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature pipeline over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames, feats = [], []
            for raw in pdf["payload"]:
                n, f = _decode_payload(bytes(raw), fake)
                frames.append(n)
                feats.append(f)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "n_frames": pd.Series(frames, dtype="int32"),
                "feature": feats,
            })

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_w", IntegerType()),
    StructField("out_h", IntegerType()),
    StructField("out_len", LongType()),
    StructField("resized", BinaryType()),
])


def resize_images(payloads: DataFrame, width: int = 16, height: int = 16,
                  fake: bool = True) -> DataFrame:
    """mapInPandas resize over binary payloads. Real path needs an
    image codec (absent here); fake=True produces the deterministic
    double — payload truncated to AT MOST width*height bytes (shorter
    payloads keep their length) — keeping the Spark plumbing (binary
    in, binary out, bounded batches) real. At scale this is the shape
    of any thumbnailing pass: one streamed mapInPandas, output written
    back as a binary column."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available; pass fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            outs = []
            for raw in pdf["payload"]:
                b = bytes(raw)[:target]
                outs.append(b)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "out_w": pd.Series([width] * len(pdf), dtype="int32"),
                "out_h": pd.Series([height] * len(pdf), dtype="int32"),
                "out_len": pd.Series([len(o) for o in outs],
                                     dtype="int64"),
                "resized": outs,
            })

    return payloads.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_sig", LongType()),
])


def sample_frames(payloads: DataFrame, every_k: int = 2,
                  fake: bool = True) -> DataFrame:
    """mapInPandas frame sampling: each payload expands to one row per
    sampled frame (idx 0, k, 2k, … of its n_frames) — the UDTF-shaped
    explode a video pipeline needs. Decode is stubbed (fake=True):
    n_frames = byte_len % 10 + 1 (same double as extract_features),
    frame_sig a deterministic arithmetic fingerprint. Output
    cardinality is data-dependent — mapInPandas yields as many rows
    per input as it likes, which is the point of this plumbing test."""
    if not fake:
        raise NotImplementedError(
            "video codecs not available; pass fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                blen = len(bytes(raw))
                n_frames = blen % 10 + 1
                for idx in range(0, n_frames, every_k):
                    rows.append((int(doc_id), idx,
                                 (blen * 131 + idx) % 997))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_sig"])

    return payloads.mapInPandas(run, FRAME_SCHEMA)
