"""Incremental (streaming) entity resolution: assign arriving contact
records to clusters statefully, per blocking key.

The batch ER core is a global fixpoint (blocked pairs -> gates ->
connected components). A stream cannot wait for the fixpoint, so the
standard design is INCREMENTAL ASSIGNMENT: one GroupState per
block_key holds the block's previously-seen records with their cluster
ids; each arriving record is scored against the stored members with
the SAME pure pair semantics as the batch path
(merge_core.pair_signals + merge_ok, ingest orientation preserved) and
joins the earliest accepted member's cluster, else founds its own
(cluster id = its rid).

Known, documented divergence from batch CC: an arrival that matches
members of two different existing clusters joins the earliest one but
does NOT retroactively union them (no relabeling of emitted rows) —
the streaming answer is first-wins; a periodic batch reconciliation
(cluster_records over the accumulated corpus) restores the fixpoint.
On corpora whose merges are direct pairwise links (e.g. records
sharing an email with one prior record), incremental == batch exactly;
tests pin that equality.

Scale: state is O(records) partitioned by block_key — the same key
that bounds the batch pair join; per-arrival work is O(block size).
Watermark + GroupStateTimeout evict idle blocks for unbounded streams.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from contacts_etl_phase21_spark.functions.merge_core import (
    DedupeConfig, merge_ok, pair_signals,
)

ASSIGN_SCHEMA = StructType([
    StructField("block_key", StringType()),
    StructField("rid", LongType()),
    StructField("cluster_id", LongType()),
])

# members serialized as one JSON string: schema-stable regardless of
# how many records a block accumulates
_STATE_SCHEMA = StructType([StructField("members_json", StringType())])

# the record fields pair_signals/merge_ok consult
_ER_FIELDS = ("source", "first_name", "nickname", "last_name", "suffix",
              "linkedin_url", "emails", "phones", "addresses")


def _as_record(row: pd.Series) -> dict[str, Any]:
    rec: dict[str, Any] = {}
    for f in _ER_FIELDS:
        v = row.get(f)
        if f in ("emails", "phones", "addresses"):
            rec[f] = [dict(x) for x in v] if v is not None else []
        else:
            rec[f] = v if v is not None else ""
    return rec


def _pair_features(rec: dict) -> dict:
    """Per-RECORD derived features for the ratio-independent veto
    pre-gate (r12 — the Python twin of the batch path's
    accepted_edges_fast pruning): computed once per record per batch
    instead of once per PAIR inside pair_signals. Everything here
    mirrors merge_ok's own expressions exactly (same helpers, same
    truthiness rules), so the pre-gate can only skip pairs merge_ok
    rejects."""
    from contacts_etl_phase21_spark.functions.merge_core import (
        address_keys, first_name_candidates,
    )
    from contacts_etl_phase21_spark.functions.names import nickname_root
    from contacts_etl_phase21_spark.functions.text import fold_text

    names = first_name_candidates(rec)
    return {
        "names": names,
        # merge_ok's names_align: any(fold(x) == fold(y)) over truthy
        # candidates — candidates are non-empty by construction, so
        # set intersection of the folds is the same predicate
        "folded": {fold_text(x) for x in names},
        # nickname_equivalent(x, y) ≡ nickname_root(x) == nickname_root(y)
        # for truthy x, y — root-set intersection is the same any()
        "roots": {nickname_root(x) for x in names},
        "has_ident": bool(names and (rec.get("last_name") or "")),
        "emails": {e["value"] for e in rec.get("emails") or []},
        "phones": {p["value"] for p in rec.get("phones") or []},
        "addr": address_keys(rec.get("addresses")),
        "li": rec.get("linkedin_url") or "",
    }


def _gates_can_pass(mf: dict, rf: dict, nickname_equivalence: bool) -> bool:
    """False only when merge_ok is False INDEPENDENT of the difflib
    ratio — exactly Gate 1 (nameless side without hard evidence) and
    Gate 2 (names on both sides but no name-level agreement). Pairs
    skipped here are pairs merge_ok(l, r, pair_signals(l, r)) would
    reject, so the accepted set — and every emitted assignment — is
    identical; what is saved is the per-pair difflib/scoring work on
    the (dominant) non-matching pairs. Equivalence is pinned in
    tests/test_streaming.py against the unpruned scorer."""
    emails_overlap = bool(mf["emails"] & rf["emails"])
    corroborator = (emails_overlap
                    or bool(mf["phones"] & rf["phones"])
                    or bool(mf["addr"] & rf["addr"])
                    or bool(mf["li"] and mf["li"] == rf["li"]))
    # Gate 1: a side with no usable (first/nickname + last) identity
    # may only merge on hard evidence
    if not (mf["has_ident"] and rf["has_ident"]) and not corroborator:
        return False
    # Gate 2: with names on both sides, some name-level agreement
    # (exact fold, nickname root, shared email, same linkedin) is
    # mandatory
    if mf["names"] and rf["names"]:
        names_align = bool(mf["folded"] & rf["folded"])
        nickname_eq = nickname_equivalence and bool(
            mf["roots"] & rf["roots"])
        linkedin_match = bool(mf["li"] and mf["li"] == rf["li"])
        if not (names_align or nickname_eq or emails_overlap
                or linkedin_match):
            return False
    return True


def _make_assign_fn(cfg: DedupeConfig, ttl_ms: int | None = None,
                    ts_col: str = "ingest_ts"):
    def assign(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # idle-block eviction: the block's membership is dropped;
            # a record arriving after the TTL horizon founds a fresh
            # cluster (the periodic batch reconciliation heals any
            # resulting split — same repair path as bridge arrivals)
            state.remove()
            return
        members: list[dict] = (
            json.loads(state.get[0]) if state.exists else [])
        # r12: per-record veto-gate features, computed once per member
        # per batch (and incrementally for appended arrivals) instead
        # of per PAIR — see _pair_features/_gates_can_pass
        feats: list[dict] = [_pair_features(m["rec"]) for m in members]
        out = []
        max_ts_ms = None
        # concatenate FIRST: the iterator yields Arrow chunks, and a
        # per-chunk sort would interleave rid order across chunks
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        batch = (pd.concat(chunks) if len(chunks) > 1
                 else (chunks[0] if chunks else None))
        if batch is not None:
            if ttl_ms is not None and ts_col in batch.columns:
                max_ts_ms = int(batch[ts_col].astype("int64").max()
                                // 1_000_000)
            for _, row in batch.sort_values("rid").iterrows():
                rec = _as_record(row)
                rid = int(row["rid"])
                rf = _pair_features(rec)
                # Orientation matches the batch path's l_rid < r_rid
                # pair construction even when a LATER arrival has a
                # SMALLER rid (difflib's ratio is order-dependent).
                # first-wins: JOIN the earliest accepted member's
                # cluster (never re-found a smaller id — the member's
                # assignment is already emitted and must stay stable).
                accepted = []
                for m, mf in zip(members, feats):
                    # ratio-independent veto pre-gate: skips only
                    # pairs merge_ok rejects regardless of score
                    if not _gates_can_pass(mf, rf,
                                           cfg.nickname_equivalence):
                        continue
                    l, r = ((m["rec"], rec) if int(m["rid"]) < rid
                            else (rec, m["rec"]))
                    if merge_ok(l, r,
                                pair_signals(l, r,
                                             cfg.nickname_equivalence),
                                cfg):
                        accepted.append(int(m["cluster_id"]))
                cid = min(accepted) if accepted else rid
                members.append({"rec": rec, "rid": rid,
                                "cluster_id": cid})
                feats.append(rf)
                out.append((key[0], rid, cid))
        state.update((json.dumps(members),))
        if ttl_ms is not None and max_ts_ms is not None:
            # timeout must stay ahead of the current watermark
            state.setTimeoutTimestamp(
                max(max_ts_ms + ttl_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in ASSIGN_SCHEMA.fields])

    return assign


def incremental_er_assignments(prepared_stream: DataFrame,
                               cfg: DedupeConfig = DedupeConfig(),
                               ttl_ms: int | None = None,
                               ts_col: str = "ingest_ts") -> DataFrame:
    """prepared (streaming) records with block_key + rid ->
    (block_key, rid, cluster_id) assignments, update mode.

    ttl_ms enables watermark-driven idle-block eviction
    (EventTimeTimeout) for unbounded key spaces: the caller must
    provide `ts_col` (event-time timestamp) on the stream WITH a
    watermark already applied. A block idle past its last arrival +
    ttl is evicted; later arrivals found fresh clusters and the batch
    reconciliation (reconcile_assignments) heals any split."""
    if ttl_ms is None:
        cols = prepared_stream.select("block_key", "rid", *_ER_FIELDS)
        return cols.groupBy("block_key").applyInPandasWithState(
            _make_assign_fn(cfg), ASSIGN_SCHEMA, _STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout)
    cols = prepared_stream.select("block_key", "rid", ts_col, *_ER_FIELDS)
    return cols.groupBy("block_key").applyInPandasWithState(
        _make_assign_fn(cfg, ttl_ms, ts_col), ASSIGN_SCHEMA, _STATE_SCHEMA,
        "update", GroupStateTimeout.EventTimeTimeout)


def reconcile_assignments(prepared_corpus: DataFrame,
                          streamed_assignments: DataFrame,
                          cfg: DedupeConfig | None = None) -> DataFrame:
    """Periodic batch-fixpoint compaction over the accumulated corpus.

    Incremental assignment is first-wins: a bridge arrival that links
    two existing clusters joins the earlier one without re-labeling the
    other (module docstring). This compaction re-runs the batch ER core
    (cluster_records: blocked pairs → gates → connected components) on
    everything ingested so far and emits the healed assignment per rid,
    with the streaming label alongside so sinks can re-key:

        (rid, cluster_id, stream_cluster_id, healed)

    `healed` marks rows whose streaming label diverged from the
    fixpoint. Run it from foreachBatch every N triggers or as a
    scheduled batch job over the staged corpus — the input is the SAME
    prepare_for_matching projection the stream consumes, so batch and
    stream agree on rids and block keys by construction. At scale this
    is the standard lambda-style repair: the stream stays low-latency,
    the compaction restores exactness, and its cost is the batch ER
    core's (blocked equi-joins + log-round components, no quadratic
    blowup)."""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        cluster_records,
    )
    import pyspark.sql.functions as F

    # eager=True: this runs per-N-triggers in a long-lived session —
    # materialize and unpersist so cache entries don't accumulate.
    batch = cluster_records(prepared_corpus, cfg or DedupeConfig(),
                            eager=True) \
        .select("rid", "cluster_id")
    old = streamed_assignments.select(
        "rid", F.col("cluster_id").alias("stream_cluster_id"))
    return (batch.join(old, "rid", "left")
            .withColumn("healed",
                        F.col("stream_cluster_id").isNotNull()
                        & (F.col("cluster_id")
                           != F.col("stream_cluster_id"))))


def drain_to_table(stream: DataFrame, name: str,
                   timeout_s: int = 180) -> DataFrame:
    """availableNow -> memory sink helper (tests + driver harness).
    Raises on timeout — a partially-drained sink must never be
    mistaken for the converged result."""
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream '{name}' did not drain within {timeout_s}s")
    return stream.sparkSession.table(name)


def stream_records_from_dir(spark, schema, staged_dir: str,
                            files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over staged CONTACT_SCHEMA parquet files."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(files_per_trigger))
            .option("recursiveFileLookup", True)
            .parquet(staged_dir))
