"""Streaming JSONL corpus ingest — the 24/7 twin of
sources/jsonl_docs.py: a file-source stream over a landing directory,
the same explicit-schema from_json parse, and the clean/quarantine
fork written per micro-batch.

Why this shape at 100 TB/day:

- FILE SOURCE, not a custom receiver: Spark's file stream tracks seen
  files in the checkpoint, so every landed file is processed EXACTLY
  once across restarts — the property a nightly-crawl landing zone
  needs (re-drains after a crash neither skip nor double-ingest).
- The parse is the BATCH source's parse (same from_json, same
  DOC_SCHEMA, same quarantine semantics via conform_docs) — one
  definition of "valid document" for both entry points, so corpus
  statistics cannot drift between backfill (batch) and live ingest.
- foreachBatch writes BOTH splits from one micro-batch scan: the
  clean/quarantine fork is two filters off the same in-memory batch,
  not two passes over the landing files.
- Everything is row-local (parse, gates, projections) — zero
  stateOperators, so there is no watermark/TTL story to get wrong;
  the only state is the file-source's seen-files log.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.sources.jsonl_docs import (
    CORRUPT_COL, DOC_SCHEMA, conform_docs,
)


def stream_jsonl_documents(spark: SparkSession, landing_dir: str,
                           max_files_per_trigger: int | None = None
                           ) -> DataFrame:
    """Streaming scan of a JSONL landing directory pinned to
    DOC_SCHEMA — the readStream twin of load_jsonl_documents.
    max_files_per_trigger bounds per-batch work for steady drains."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    j = F.from_json(
        "value", DOC_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL})
    return (reader.text(landing_dir)
            .select(j.alias("__j"))
            .select(*[F.col(f"__j.{f.name}") for f in DOC_SCHEMA.fields]))


def run_jsonl_quarantine_ingest(spark: SparkSession, landing_dir: str,
                                clean_dir: str, quarantine_dir: str,
                                checkpoint_dir: str,
                                timeout_sec: float = 600.0) -> None:
    """Drain the landing directory once (availableNow): per
    micro-batch, fork into clean/quarantined with conform_docs and
    append each split as parquet. Restart-safe: the checkpoint's
    seen-files log makes re-drains pick up ONLY files landed since
    the last run (pinned in tests/test_jsonl_source.py).

    Raises TimeoutError if the drain outlives timeout_sec (r07
    ADVICE: a silently-ignored awaitTermination(timeout) return would
    let callers read a PARTIAL clean_dir while the query still
    writes); the query is stopped before raising so no writer keeps
    appending behind the caller's back."""
    stream = stream_jsonl_documents(spark, landing_dir)

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        clean, quarantined = conform_docs(batch)
        clean.write.mode("append").parquet(clean_dir)
        quarantined.write.mode("append").parquet(quarantine_dir)

    query = (stream.writeStream
             .foreachBatch(write_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"JSONL landing-zone drain exceeded {timeout_sec}s; query "
            "stopped — clean_dir is partial, re-run to resume from the "
            "checkpoint's seen-files log")
