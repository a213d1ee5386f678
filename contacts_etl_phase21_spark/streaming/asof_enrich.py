"""Streaming point-in-time enrichment: arriving events pick up the
feature/dimension snapshot that was valid AT THEIR TIMESTAMP — the
online half of the as-of join (operators/asof.py is the batch half),
i.e. feature-store serving with point-in-time correctness (an event at
time t must never see a snapshot from t+1 — label leakage).

Why not run asof_join on the stream: its carry-forward windows are
stateful aggregations under streaming semantics. Instead the snapshot
side is compiled ONCE into DISJOINT validity intervals
(operators/asof.validity_intervals: snapshot valid from its ts until
1us before the key's next snapshot; equal-ts ties resolve to the
greatest tie exactly like asof_join), and the stream side becomes a
stateless stream-static RANGE join (operators/range_join.range_join):
row-local bucket assignment, equi-join on (key, bucket) against the
persisted exploded index, containment filter in the projection. With
intervals disjoint + exhaustive past a key's first snapshot, every
event matches AT MOST ONE row — no per-event aggregation, no state
store at all (the progress metrics show zero stateOperators; contrast
ann_serving's per-query top-k, which needs one in-flight key each).
Left-outer keeps events that precede a key's first snapshot (NULL
features), mirroring asof_join.

At 100 TB: the interval index is |snapshots| × (interval_len/span)
rows, persisted (at scale written partitioned by (key-hash, bucket));
each micro-batch reads only the buckets its events land in. The
index build windows per KEY (dimension tables are orders smaller than
event streams — validity_intervals documents the trade); the event
stream itself never shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.operators.asof import validity_intervals
from contacts_etl_phase21_spark.operators.range_join import range_join


def asof_enrichment_index(snapshots: DataFrame, key_col: str,
                          ts_col: str, value_cols: list[str],
                          tie_col: str,
                          horizon_end_us: int) -> DataFrame:
    """Build + persist the static side once (the stream-static join
    re-executes the static plan every micro-batch — same pitfall
    ivfpq_serving_index documents). Caller owns the lifecycle
    (unpersist when the stream stops)."""
    idx = validity_intervals(snapshots, key_col, ts_col, value_cols,
                             tie_col, horizon_end_us).persist()
    idx.count()  # materialize before the first micro-batch
    return idx


def stream_asof_enrich(stream_events: DataFrame, index: DataFrame,
                       key_col: str, ts_col: str,
                       bucket_span_us: int = 3_600_000_000) -> DataFrame:
    """Enrich (streaming or batch) events with the snapshot valid at
    their timestamp: events keep their columns, snapshot columns
    arrive `snap_`-prefixed (snap_<tie>, snap_<values>, snap_valid_from
    / snap_valid_to). Works identically on a batch frame — the twin
    the oracle checks."""
    return range_join(stream_events, index, key_col, ts_col,
                      "valid_from", "valid_to",
                      bucket_span_us=bucket_span_us,
                      prefix="snap_", how="left")
