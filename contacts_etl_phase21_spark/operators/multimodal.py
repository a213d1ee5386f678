"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are `binary` columns with a metadata struct;
decode / feature-extract run as Arrow-batched `mapInPandas` so each
batch amortizes codec startup.

Codec boundary: formats with a pure-Python/stdlib decode path are REAL
here — binary P6 PPM images (`decode_ppm`/`box_resize_ppm`, a complete
parser + box-filter resampler) and 16-bit PCM WAV audio (`decode_wav`
via the stdlib `wave` module). Formats that need external libraries
(JPEG/PNG via PIL, video via av/ffmpeg) raise NotImplementedError
unless `fake=True` selects the deterministic test double — the Spark
plumbing (schema, partitioning, batch shape) is identical either way
and oracle-tested end-to-end through the real codecs
(llm_ops mm_wav_decode_real / mm_ppm_resize_real / mm_ppm_frames_real).

At 100 TB: payloads stay in parquet binary columns (no small-files
explosion); mapInPandas streams batches so executor memory is bounded
by batch size × payload size; metadata-only queries never touch the
bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)


# ---------------------------------------------------------------------------
# Real pure-Python codecs: binary PPM (P6) and 16-bit PCM WAV
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes, offset: int = 0
               ) -> tuple[int, int, int, bytes, int]:
    """Parse one binary-PPM (P6) image starting at `offset`.

    Full format support: whitespace-separated header tokens with
    '#' comments, arbitrary dimensions, maxval ≤ 255, raw RGB body.
    Returns (width, height, maxval, rgb_bytes, next_offset) so
    concatenated frame sequences can be walked."""
    if payload[offset:offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    i, vals = offset + 2, []
    while len(vals) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte separates maxval from the body
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    end = i + 3 * w * h
    body = payload[i:end]
    if len(body) != 3 * w * h:
        raise ValueError("truncated PPM body")
    return w, h, maxval, body, end


def encode_ppm(w: int, h: int, maxval: int, body: bytes) -> bytes:
    return b"P6\n%d %d\n%d\n" % (w, h, maxval) + body


def box_resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Real image resize: integer box filter (pixel-area mean, floor
    division) over the decoded RGB grid; dimensions must divide
    evenly. Returns a re-encoded P6 payload."""
    w, h, maxval, body, _ = decode_ppm(payload)
    if w % out_w or h % out_h:
        raise ValueError(f"{w}x{h} not divisible by {out_w}x{out_h}")
    bw, bh = w // out_w, h // out_h
    out = bytearray()
    for oy in range(out_h):
        for ox in range(out_w):
            for c in range(3):
                total = 0
                for dy in range(bh):
                    for dx in range(bw):
                        px = (oy * bh + dy) * w + (ox * bw + dx)
                        total += body[px * 3 + c]
                out.append(total // (bw * bh))
    return encode_ppm(out_w, out_h, maxval, bytes(out))


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Walk a concatenated-P6 sequence (the trivial 'video' container)
    into its frame payloads."""
    frames, offset = [], 0
    while offset < len(payload):
        _, _, _, _, end = decode_ppm(payload, offset)
        frames.append(payload[offset:end])
        offset = end
    return frames


def encode_wav(samples: list[int], framerate: int = 8000) -> bytes:
    """16-bit mono PCM WAV from integer samples (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Real RIFF/WAV decode via the stdlib wave module →
    (n_frames, int16 samples). Mono 16-bit PCM only."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only 16-bit mono PCM supported")
        n = wf.getnframes()
        raw = wf.readframes(n)
    return n, list(struct.unpack(f"<{n}h", raw))

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


def _decode_payload(payload: bytes, fake: bool,
                    mime: str = "application/octet-stream"
                    ) -> tuple[int, list[float]]:
    """Decode dispatch. REAL codec paths (no external libraries):

    - audio/x-wav  → stdlib wave: n_frames = PCM frame count, feature =
      first 4 samples normalized to [-1, 1].
    - image/x-portable-pixmap → pure-Python P6 parse: n_frames = 1,
      feature = per-channel pixel means normalized to [0, 1].

    Formats needing PIL/av raise NotImplementedError unless fake=True
    selects the deterministic double (n_frames = byte_len % 10 + 1,
    feature = first-4-byte values scaled to [0, 1])."""
    if mime == "audio/x-wav":
        n, samples = decode_wav(payload)
        return n, [s / 32768.0 for s in samples[:4]]
    if mime == "image/x-portable-pixmap":
        w, h, maxval, body, _ = decode_ppm(payload)
        n_px = w * h
        return 1, [sum(body[c::3]) / n_px / maxval for c in range(3)]
    if not fake:
        raise NotImplementedError(
            f"no codec for {mime} (PIL/av not available in this "
            "container); pass fake=True for the deterministic test double")
    n_frames = len(payload) % 10 + 1
    feature = [b / 255.0 for b in payload[:4]]
    return n_frames, feature


def extract_features(payloads: DataFrame, batch_size: int = 256,
                     fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature pipeline over binary payloads; the
    per-row mime column selects the codec (real for WAV/PPM)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames, feats = [], []
            for raw, mime in zip(pdf["payload"], pdf["mime"]):
                n, f = _decode_payload(bytes(raw), fake, str(mime))
                frames.append(n)
                feats.append(f)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "n_frames": pd.Series(frames, dtype="int32"),
                "feature": feats,
            })

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic payload synthesis + real-codec projections. The synth
# formulas are the oracle contract: a DuckDB twin recomputes the expected
# outputs arithmetically WITHOUT touching the binary, so the whole
# encode→decode round trip through the real codecs is value-checked.
# ---------------------------------------------------------------------------


def synth_wav_payloads(docs: DataFrame) -> DataFrame:
    """Real RIFF/WAV payloads, one per doc: doc d gets
    n = (d % 5 + 1) * 4 mono 16-bit samples, sample i =
    (d*7 + i*13) % 2003 - 1001."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = (d % 5 + 1) * 4
                p = encode_wav([(d * 7 + i * 13) % 2003 - 1001
                                for i in range(n)])
                rows.append((d, p, "audio/x-wav", len(p)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAYLOAD_SCHEMA.fields])

    return docs.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


def synth_ppm_payloads(docs: DataFrame, w: int = 4, h: int = 2,
                       frames: int = 1) -> DataFrame:
    """Real P6 payloads (frames > 1 → concatenated frame sequence):
    frame f, body byte i = (d*31 + f*101 + i*17) % 256."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                p = b"".join(
                    encode_ppm(w, h, 255, bytes(
                        (d * 31 + f * 101 + i * 17) % 256
                        for i in range(3 * w * h)))
                    for f in range(frames))
                mime = ("image/x-portable-pixmap" if frames == 1
                        else "video/x-ppm-seq")
                rows.append((d, p, mime, len(p)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAYLOAD_SCHEMA.fields])

    return docs.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


WAV_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("sum_samples", LongType()),
    StructField("sum_sq", LongType()),
])


def wav_stats(payloads: DataFrame) -> DataFrame:
    """REAL WAV decode (stdlib wave) → integer sample statistics —
    int-exact cross-engine checkable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, raw in zip(pdf["doc_id"], pdf["payload"]):
                n, samples = decode_wav(bytes(raw))
                rows.append((int(d), n, sum(samples),
                             sum(s * s for s in samples)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_STATS_SCHEMA.fields])

    return payloads.mapInPandas(run, WAV_STATS_SCHEMA)


RESIZED_PIXELS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_w", IntegerType()),
    StructField("out_h", IntegerType()),
    StructField("pixels", ArrayType(IntegerType())),
])


def ppm_resize_pixels(payloads: DataFrame, out_w: int = 2,
                      out_h: int = 1) -> DataFrame:
    """REAL P6 decode → integer box-filter resize → re-decode of the
    re-encoded output; emits the resized RGB bytes as ints (row-major),
    proving the full encode→resize→encode→decode loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, raw in zip(pdf["doc_id"], pdf["payload"]):
                resized = box_resize_ppm(bytes(raw), out_w, out_h)
                w2, h2, _, body, _ = decode_ppm(resized)
                rows.append((int(d), w2, h2, list(body)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_PIXELS_SCHEMA.fields])

    return payloads.mapInPandas(run, RESIZED_PIXELS_SCHEMA)


PPM_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_sig", LongType()),
])


def ppm_frame_samples(payloads: DataFrame, every_k: int = 2) -> DataFrame:
    """REAL frame sampling over concatenated-P6 sequences: split on
    parsed frame boundaries, keep idx 0, k, 2k, …, fingerprint each
    kept frame's pixel bytes (sum % 997)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, raw in zip(pdf["doc_id"], pdf["payload"]):
                frames = split_ppm_frames(bytes(raw))
                for idx in range(0, len(frames), every_k):
                    _, _, _, body, _ = decode_ppm(frames[idx])
                    rows.append((int(d), idx, sum(body) % 997))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PPM_FRAME_SCHEMA.fields])

    return payloads.mapInPandas(run, PPM_FRAME_SCHEMA)


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
