"""Streaming ingestion + windowed aggregation over the events table.

Batch and streaming share one transformation (windowed counts); the
streaming variant adds a watermark so late data is bounded and state can
be evicted — the standard Structured Streaming incremental-agg shape:

    readStream (file source, maxFilesPerTrigger)
      → withWatermark("ts", …)
      → groupBy(window(ts, …), event_type).agg(...)
      → writeStream (append/update)

At scale the file source becomes Kafka; everything downstream of
readStream is unchanged — that is the point of keeping the transform a
pure DataFrame function.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.io import load


def _event_ts(df: DataFrame) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS); depending on the Spark
    build it surfaces as long (nanosAsLong) or TIMESTAMP_NTZ. Normalize
    either to session-zone TimestampType — watermarks/windows require
    TIMESTAMP, not NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)."""
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # integer div — float division loses precision at ns-epoch scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # testdata timestamps are wall-clock; session tz is UTC in tests,
        # so this is a metadata-only reinterpretation, not a shift
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the events parquet. Schema comes from a
    batch peek (file streams require an explicit schema)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        # FileStreamSource requires a directory; stage a symlink dir
        # (driver-side, metadata only — no data copy).
        staged = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(os.path.abspath(path),
                   os.path.join(staged, "events.parquet"))
        path = staged
    raw = (spark.readStream
           .schema(schema)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(path))
    return _event_ts(raw)


def windowed_transform(events: DataFrame,
                       window: str = "1 hour") -> DataFrame:
    """The shared batch/stream aggregation: tumbling-window counts and
    value sums per event_type."""
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def windowed_counts_batch(spark: SparkSession, sf_dir: str,
                          window: str = "1 hour") -> DataFrame:
    """Batch twin of the streaming aggregation (oracle-checkable)."""
    return windowed_transform(load(spark, sf_dir, "events"), window) \
        .orderBy("window_start", "event_type")


def stream_windowed_counts(spark: SparkSession, sf_dir: str,
                           watermark: str = "2 hours",
                           window: str = "1 hour") -> DataFrame:
    """Streaming plan: watermarked tumbling counts. Caller attaches the
    sink (writeStream); tests drive it with trigger(availableNow=True)
    into a memory sink."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", watermark)
    return windowed_transform(events, window)


def stream_sliding_counts(spark: SparkSession, sf_dir: str,
                          watermark: str = "2 hours",
                          window: str = "1 hour",
                          slide: str = "30 minutes") -> DataFrame:
    """Streaming sliding-window counts: the same Expand-then-aggregate
    expression as the batch twin, bounded by a watermark."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", watermark)
    return (events
            .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def stream_sessionized_counts(spark: SparkSession, sf_dir: str,
                              watermark: str = "2 hours",
                              gap: str = "5 minutes") -> DataFrame:
    """Streaming session windows per user — session_window is the
    built-in stateful sessionization; with a watermark closed sessions
    are emitted and their state evicted."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", watermark)
    return (events
            .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select("user_id", F.col("s.start").alias("session_start"),
                    "n_events", "sum_value"))


def sliding_window_counts_batch(spark: SparkSession, sf_dir: str,
                                window: str = "1 hour",
                                slide: str = "30 minutes") -> DataFrame:
    """Sliding (overlapping) window counts per event_type — each event
    lands in window/slide windows; Spark expands the membership
    map-side (Expand node), then it is one shuffle like any agg. Same
    expression streams with a watermark."""
    events = load(spark, sf_dir, "events")
    return (events
            .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value")
            .orderBy("window_start", "event_type"))


def sessionized_counts_batch(spark: SparkSession, sf_dir: str,
                             gap: str = "5 minutes") -> DataFrame:
    """Session windows per user (session_window — the built-in stateful
    sessionization; in streaming mode the same expression works with a
    watermark). Returns per-session event counts."""
    events = load(spark, sf_dir, "events")
    return (events
            .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select("user_id", F.col("s.start").alias("session_start"),
                    "n_events", "sum_value")
            .orderBy("user_id", "session_start"))
