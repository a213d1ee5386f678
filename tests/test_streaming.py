"""Structured Streaming parity: the streaming plan over the events table
must produce the batch transform's results when drained with
availableNow into a memory sink."""

from __future__ import annotations

import uuid

from contacts_etl_phase21_spark.streaming import (
    first_event_batch, sessionized_counts_batch, stream_first_event,
    stream_windowed_counts, windowed_counts_batch,
)


def test_stream_windowed_counts_matches_batch(spark, sf_small):
    stream_df = stream_windowed_counts(spark, sf_small)
    assert stream_df.isStreaming
    name = f"windowed_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    expected = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
                for r in windowed_counts_batch(spark, sf_small).collect()}
    assert got == expected
    assert len(got) > 0


def test_sessionized_counts_shape(spark, sf_small):
    rows = sessionized_counts_batch(spark, sf_small).limit(50).collect()
    assert rows
    # sessions are per-user, ordered, non-empty
    assert all(r["n_events"] >= 1 for r in rows)


def test_stateful_first_event_matches_batch(spark, sf_small):
    stream_df = stream_first_event(spark, sf_small)
    assert stream_df.isStreaming
    name = f"first_event_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # update-mode memory sink may hold several emissions per key across
    # batches; the LAST one is the converged state — but emissions only
    # improve, so (key → min event) equals taking the final emission.
    got = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        got[(r["user_id"], r["event_type"])] = (
            r["first_event_id"], r["first_value"])
    expected = {(r["user_id"], r["event_type"]):
                (r["first_event_id"], r["first_value"])
                for r in first_event_batch(spark, sf_small).collect()}
    assert got == expected
    assert len(got) > 0
