"""Streaming per-source quota admission — the online half of
sampling.cap_per_source: a 24/7 ingest admits each source's documents
until its quota is spent and drops the rest, so no domain can flood
the corpus between batch compactions.

Semantics: FIRST-cap-BY-ARRIVAL admission (the only meaningful online
quota — a stream cannot rank what has not arrived). Within a
micro-batch a source's rows are admitted in (id) order so replays of
the same batch sequence are deterministic; across batches admission
follows batch order. When arrivals come in id order the stream output
equals the batch twin `source_cap_batch` (first cap by id per source)
exactly — the same documented arrival-order contract as
curate_ingest's fingerprint dedup and er_ingest's first-wins
clustering.

Scale/state design: one GroupState per SOURCE holding a single long
(admitted count) — state is O(|sources|) × 8 bytes, independent of
corpus size and stream lifetime, so unlike window or dedup state it
needs NO eviction: a quota is a property of the whole ingest, not of
a time window (the fourth state regime in this package, after bounded
watermark state, per-in-flight-query state, and zero-state serving).
The grouped-map shuffles only the arriving micro-batch by source;
admitted rows emit with their 1-based admission rank.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

_OUT_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("doc_id", LongType()),
    StructField("adm_rank", IntegerType()),
])

_STATE_SCHEMA = StructType([StructField("taken", LongType())])


def _make_quota_fn(cap: int):
    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        taken = int(state.get[0]) if state.exists else 0
        if taken >= cap:
            # quota spent: no state touch needed — under NoTimeout the
            # stored (taken,) row persists as-is and there is nothing
            # to refresh. (If a timeout policy is ever added, this
            # path MUST call state.update((taken,)) to keep the group
            # alive — r07 ADVICE.)
            yield from ()
            return
        # a group's batch rows can arrive as several Arrow chunks —
        # concat before sorting so within-batch admission order is the
        # batch's full (id) order, not chunk-local order
        batch = [pdf for pdf in pdfs if not pdf.empty]
        if not batch:
            return
        rows = pd.concat(batch).sort_values("doc_id")
        adm = rows.iloc[: cap - taken]
        ranks = range(taken + 1, taken + len(adm) + 1)
        state.update((taken + len(adm),))
        yield pd.DataFrame({
            "source": [key[0]] * len(adm),
            "doc_id": adm["doc_id"].to_numpy(),
            "adm_rank": pd.array(list(ranks), dtype="int32"),
        })

    return fn


def stream_source_cap(docs: DataFrame, cap: int) -> DataFrame:
    """(source, doc_id, adm_rank) per ADMITTED arrival; rows beyond a
    source's quota never emit. Input needs (source, doc_id) columns."""
    return (docs.select("source", "doc_id")
            .groupBy("source")
            .applyInPandasWithState(
                _make_quota_fn(cap), _OUT_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def source_cap_batch(docs: DataFrame, cap: int) -> DataFrame:
    """Batch twin: first cap per source by id — equals the stream's
    arrival-order admission when arrivals come in id order. One
    rank-limited window (WindowGroupLimit bounds it map-side; see
    BASELINE.md r06 s4 for when cap_per_source's bounded plan is the
    better tier)."""
    w = Window.partitionBy("source").orderBy("doc_id")
    return (docs.select("source", "doc_id")
            .withColumn("adm_rank",
                        F.row_number().over(w).cast("int"))
            .filter(F.col("adm_rank") <= cap))
