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
