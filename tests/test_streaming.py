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


def test_stateful_first_event_multibatch_state(spark, sf_small, tmp_path):
    """Two files drained one per micro-batch: GroupState must carry the
    best-so-far across batches, and the LAST emission per key must
    equal the batch argmin over BOTH halves. Later-half events are fed
    FIRST so the state actually gets improved (not just initialized)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.streaming.stateful import (
        _OUT_SCHEMA, _STATE_SCHEMA, _first_event_fn, first_event_batch,
    )

    events = load(spark, sf_small, "events")
    half = events.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    stream_dir = tmp_path / "events_stream"
    # lexicographic file order == processing order for the file source:
    # feed the LATE half first, the early half second
    events.filter(F.col("event_id") >= half).coalesce(1) \
        .write.parquet(str(stream_dir / "a_late"))
    events.filter(F.col("event_id") < half).coalesce(1) \
        .write.parquet(str(stream_dir / "b_early"))
    schema = events.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", True)
              .parquet(str(stream_dir))
              .groupBy("user_id", "event_type")
              .applyInPandasWithState(
                  _first_event_fn, _OUT_SCHEMA, _STATE_SCHEMA,
                  "update", "NoTimeout"))
    name = f"first_event_mb_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    sink = spark.sql(f"SELECT * FROM {name}").collect()
    # update-mode sink keeps one row per key per EMITTING batch (<= 2
    # here). The converged value must be among each key's emissions;
    # extra emissions are batch-1 (late-half) bests later improved on.
    emissions: dict = {}
    for r in sink:
        emissions.setdefault((r["user_id"], r["event_type"]), set()).add(
            (r["first_event_id"], r["first_value"]))
    expected = {(r["user_id"], r["event_type"]):
                (r["first_event_id"], r["first_value"])
                for r in first_event_batch(spark, sf_small).collect()}
    assert set(emissions) == set(expected)
    for key, value in expected.items():
        assert value in emissions[key]
        assert len(emissions[key]) <= 2
    # the late-first ordering must improve at least one key's state in
    # batch 2 -> that key emits twice
    assert len(sink) > len(expected)


def test_incremental_er_matches_batch_on_direct_links(spark, sf_small,
                                                      tmp_path):
    """Single batch over the synthetic corpus (merges are direct
    email-twin links): incremental assignment must equal the batch
    cluster_records fixpoint exactly."""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        cluster_records, prepare_for_matching,
    )
    from contacts_etl_phase21_spark.plans.coverage_queries import (
        synthetic_contact_records,
    )
    from contacts_etl_phase21_spark.streaming.er_ingest import (
        drain_to_table, incremental_er_assignments,
        stream_records_from_dir,
    )

    records = synthetic_contact_records(spark, sf_small)
    staged = str(tmp_path / "er_one")
    records.coalesce(1).write.parquet(staged)
    stream = stream_records_from_dir(spark, records.schema, staged)
    assigned = drain_to_table(
        incremental_er_assignments(prepare_for_matching(stream)),
        f"er_inc_{uuid.uuid4().hex[:8]}")
    got = {r["rid"]: r["cluster_id"] for r in assigned.collect()}
    batch = cluster_records(prepare_for_matching(records))
    expected = {r["rid"]: r["cluster_id"]
                for r in batch.select("rid", "cluster_id").collect()}
    assert got == expected
    assert len(set(expected.values())) < len(expected)  # merges happened


def test_incremental_er_carries_state_across_batches(spark, tmp_path):
    """A linkedin record arriving in batch 2 must join the cluster its
    gmail email-twin founded in batch 1."""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        prepare_for_matching,
    )
    from contacts_etl_phase21_spark.schemas import CONTACT_SCHEMA
    from contacts_etl_phase21_spark.streaming.er_ingest import (
        drain_to_table, incremental_er_assignments,
        stream_records_from_dir,
    )

    def rec(source, row_id, first, last, email):
        base = {f.name: "" for f in CONTACT_SCHEMA.fields}
        base.update(source=source, source_row_id=row_id,
                    source_timestamp=None, first_name=first,
                    last_name=last, full_name=f"{first} {last}",
                    emails=[{"value": email, "label": "home"}],
                    phones=[], addresses=[])
        return base

    batch1 = [rec("gmail", "0", "Jordan", "Example", "j@acme.com"),
              rec("gmail", "1", "Dana", "Solo", "d@solo.com")]
    batch2 = [rec("linkedin", "0", "Jordan", "Example", "j@acme.com")]
    staged = tmp_path / "er_two"
    spark.createDataFrame(batch1, CONTACT_SCHEMA).coalesce(1) \
        .write.parquet(str(staged / "a_first"))
    spark.createDataFrame(batch2, CONTACT_SCHEMA).coalesce(1) \
        .write.parquet(str(staged / "b_second"))
    schema = spark.createDataFrame(batch1, CONTACT_SCHEMA).schema
    stream = stream_records_from_dir(spark, schema, str(staged))
    assigned = drain_to_table(
        incremental_er_assignments(prepare_for_matching(stream)),
        f"er_inc2_{uuid.uuid4().hex[:8]}")
    rows = {(r["block_key"], r["rid"]): r["cluster_id"]
            for r in assigned.collect()}
    assert len(rows) == 3
    by_block: dict = {}
    for (block, _rid), cid in rows.items():
        by_block.setdefault(block, set()).add(cid)
    # Jordan's block: both records share ONE cluster (founded by the
    # gmail row in batch 1); Dana's block: its own singleton cluster
    jordan = [c for b, c in by_block.items() if "example" in b][0]
    dana = [c for b, c in by_block.items() if "solo" in b][0]
    assert len(jordan) == 1
    assert len(dana) == 1


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


def test_incremental_er_bridge_healed_by_reconciliation(spark, tmp_path):
    """A bridge record arriving in a LATER micro-batch links two
    already-founded clusters. Streaming first-wins keeps them separate;
    reconcile_assignments (the periodic batch-fixpoint compaction) must
    heal the assignments to equal cluster_records exactly."""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        cluster_records, prepare_for_matching,
    )
    from contacts_etl_phase21_spark.schemas import CONTACT_SCHEMA
    from contacts_etl_phase21_spark.streaming.er_ingest import (
        drain_to_table, incremental_er_assignments,
        reconcile_assignments, stream_records_from_dir,
    )

    def rec(source, row_id, first, last, emails):
        base = {f.name: "" for f in CONTACT_SCHEMA.fields}
        base.update(source=source, source_row_id=row_id,
                    source_timestamp=None, first_name=first,
                    last_name=last, full_name=f"{first} {last}",
                    emails=[{"value": e, "label": "home"} for e in emails],
                    phones=[], addresses=[])
        return base

    # same block (last name). ratio(Art, Arlo) ≈ 0.571, so A–C scores
    # 0.7·0.571 = 0.4 — no merge. B shares an email with EACH:
    # A–B = 0.7 + 1.0 = 1.7, C–B = 0.4 + 1.0 = 1.4, both ≥ 1.2 and
    # gate 2 passes on the email overlap — B is the bridge.
    batch1 = [rec("gmail", "0", "Art", "Keys", ["a@x.com"])]
    batch2 = [rec("gmail", "1", "Arlo", "Keys", ["c@x.com"])]
    batch3 = [rec("gmail", "2", "Art", "Keys", ["a@x.com", "c@x.com"])]
    staged = tmp_path / "er_bridge"
    for i, batch in enumerate((batch1, batch2, batch3)):
        spark.createDataFrame(batch, CONTACT_SCHEMA).coalesce(1) \
            .write.parquet(str(staged / f"t{i}"))
    schema = spark.createDataFrame(batch1, CONTACT_SCHEMA).schema
    stream = stream_records_from_dir(spark, schema, str(staged))
    assigned = drain_to_table(
        incremental_er_assignments(prepare_for_matching(stream)),
        f"er_bridge_{uuid.uuid4().hex[:8]}")
    streamed = {r["rid"]: r["cluster_id"] for r in assigned.collect()}
    rid_a, rid_c, rid_b = sorted(streamed)  # rids follow row ids A=0,C=1,B=2
    # first-wins divergence: the bridge B joined A's cluster, C kept its own
    assert streamed[rid_a] == streamed[rid_b] == rid_a
    assert streamed[rid_c] == rid_c

    corpus = spark.createDataFrame(batch1 + batch2 + batch3, CONTACT_SCHEMA)
    prepared = prepare_for_matching(corpus)
    healed = reconcile_assignments(prepared, assigned)
    got = {r["rid"]: (r["cluster_id"], r["healed"]) for r in healed.collect()}
    expected = {r["rid"]: r["cluster_id"] for r in
                cluster_records(prepared)
                .select("rid", "cluster_id").collect()}
    assert {k: v[0] for k, v in got.items()} == expected
    # the fixpoint is one cluster; exactly C's label was healed
    assert expected == {rid_a: rid_a, rid_b: rid_a, rid_c: rid_a}
    assert got[rid_c][1] is True
    assert got[rid_a][1] is False and got[rid_b][1] is False


def test_stream_sliding_counts_matches_batch(spark, sf_small):
    from contacts_etl_phase21_spark.streaming import (
        sliding_window_counts_batch, stream_sliding_counts,
    )

    stream_df = stream_sliding_counts(spark, sf_small)
    assert stream_df.isStreaming
    name = f"sliding_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    expected = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
                for r in sliding_window_counts_batch(spark, sf_small)
                .collect()}
    assert got == expected
    assert len(got) > 0


def test_stream_sessionized_counts_matches_batch(spark, sf_small):
    from contacts_etl_phase21_spark.streaming import (
        sessionized_counts_batch, stream_sessionized_counts,
    )

    stream_df = stream_sessionized_counts(spark, sf_small)
    assert stream_df.isStreaming
    name = f"session_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                r["sum_value"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    expected = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                     r["sum_value"])
                for r in sessionized_counts_batch(spark, sf_small)
                .collect()}
    assert got == expected
    assert len(got) > 0
