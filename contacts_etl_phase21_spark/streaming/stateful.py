"""Custom stateful streaming operator: first-event-per-key dedup via
applyInPandasWithState.

The canonical training-data streaming op — "emit each key's earliest
event, drop the rest" — is not expressible with built-in streaming
aggregates in append mode (min() needs update/complete + a final
dedup). As a stateful grouped-map it is one GroupState per key holding
the best (ts, event_id, value) seen so far; a batch emits a row only
when it improves on the state, so the stream output converges to the
batch argmin.

Scale design: state is O(distinct keys) and partitioned by the group
key (one shuffle); Arrow-batched grouped-map, no per-row Python. With
a watermark + GroupStateTimeout the state is evictable for unbounded
key spaces; the local test drives availableNow over the finite events
table.

Batch twin (`first_event_batch`) is the oracle-checked query: one
window row_number — same result, SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from contacts_etl_phase21_spark.io import load
from contacts_etl_phase21_spark.streaming.events import read_events_stream

_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("first_event_id", LongType()),
    StructField("first_value", DoubleType()),
])

# state: best-so-far (ts_micros, event_id, value); ts+event_id is a
# total order so replays/batch boundaries cannot flip the winner
_STATE_SCHEMA = StructType([
    StructField("ts_us", LongType()),
    StructField("event_id", LongType()),
    StructField("value", DoubleType()),
])


def _make_first_event_fn(ttl_ms: int | None = None):
    """First-event state function; with ttl_ms set, state carries an
    event-time timeout (watermark-driven): a key idle past
    max-seen-event-time + ttl is EVICTED (state removed, nothing
    emitted). Eviction bounds state for unbounded key spaces at a
    documented cost: a key reappearing after its TTL horizon starts
    fresh and re-emits a new 'first' — exactness holds within the
    horizon, memory stays O(active keys) beyond it."""

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        best = state.get if state.exists else None  # (ts_us, event_id, value)
        max_ts_us = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.assign(_ts_us=pdf["ts"].astype("int64") // 1000)
            batch_max = int(pdf["_ts_us"].max())
            max_ts_us = batch_max if max_ts_us is None \
                else max(max_ts_us, batch_max)
            cand = pdf.sort_values(["_ts_us", "event_id"]).iloc[0]
            c = (int(cand["_ts_us"]), int(cand["event_id"]),
                 float(cand["value"]))
            if best is None or (c[0], c[1]) < (best[0], best[1]):
                best = c
        changed = best is not None and (
            not state.exists or tuple(state.get) != best)
        if changed:
            state.update(best)
        if ttl_ms is not None and max_ts_us is not None:
            # timeout must stay ahead of the current watermark
            state.setTimeoutTimestamp(
                max(max_ts_us // 1000 + ttl_ms,
                    state.getCurrentWatermarkMs() + 1))
        if changed:
            yield pd.DataFrame(
                [(key[0], key[1], best[1], best[2])],
                columns=[f.name for f in _OUT_SCHEMA.fields])

    return fn


# default (NoTimeout) function — importable for bespoke test streams
_first_event_fn = _make_first_event_fn(None)


def stream_first_event(spark: SparkSession, sf_dir: str,
                       ttl_ms: int | None = None,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming plan: per (user_id, event_type) emit the earliest
    event (update-mode semantics: a row appears whenever a batch
    improves on the stored best). ttl_ms enables watermark-driven state
    eviction (EventTimeTimeout) for unbounded key spaces."""
    events = read_events_stream(spark, sf_dir)
    if ttl_ms is None:
        return (events
                .groupBy("user_id", "event_type")
                .applyInPandasWithState(
                    _first_event_fn, _OUT_SCHEMA, _STATE_SCHEMA,
                    "update", GroupStateTimeout.NoTimeout))
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id", "event_type")
            .applyInPandasWithState(
                _make_first_event_fn(ttl_ms), _OUT_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.EventTimeTimeout))


def first_event_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: argmin by (ts, event_id) per (user_id, event_type) —
    one window shuffle, SQL-expressible for the oracle."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type") \
        .orderBy("ts", "event_id")
    return (events
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", "event_type",
                    F.col("event_id").alias("first_event_id"),
                    F.col("value").alias("first_value"))
            .orderBy("user_id", "event_type"))
