"""JSONL document-corpus source — the standard entry point for crawl
dumps and dataset releases (one JSON object per line, optionally
gz/zstd-compressed; Spark's text-based json reader handles compression
by extension transparently).

Beyond-reference source (the reference ingests contact exports; an
LLM-data pipeline ingests document corpora). Design points, each the
100 TB-relevant choice:

- EXPLICIT schema, never inference: schema inference is a full extra
  pass over the data before the real scan, and a schema drifting with
  the input is how a nightly crawl silently changes column types
  downstream. The expected shape is declared once (DOC_SCHEMA) and the
  reader is pinned to it.
- PERMISSIVE mode with a corrupt-record column: a 100 TB crawl dump
  ALWAYS contains broken lines (truncated writes, encoding garbage,
  schema drift). FAILFAST would kill a day-long job on line
  999,999,999; DROPMALFORMED silently changes corpus statistics. The
  reader keeps bad lines in `_corrupt` so ingestion can COUNT and
  QUARANTINE them — an auditable split, same philosophy as the
  curate_ingest kept/rejected fork.
- Post-parse hygiene is a separate, composable step (`conform_docs`):
  type coercion and required-field checks are row-local column
  expressions; the quarantine split is two filters off one scan.

Composes directly with the corpus-refresh ring: load_jsonl_documents →
conform_docs → ta_gopher gates → cross_corpus_near_dups →
token_budget_select.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

CORRUPT_COL = "_corrupt"

# The declared corpus shape: ids LONG, text/lang/source STRING.
# n_chars is intentionally ABSENT: derived fields are recomputed at
# ingest (a release's precomputed counters go stale the moment text is
# re-encoded or scrubbed).
DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField(CORRUPT_COL, StringType()),
])


def load_jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """Raw permissive JSONL scan pinned to DOC_SCHEMA.

    Implemented as text scan + explicit from_json rather than
    spark.read.json with columnNameOfCorruptRecord: the built-in
    corrupt-column machinery forbids any downstream query whose pruned
    scan references ONLY the corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — a bare quarantine .count()
    trips it) and its documented workaround is caching the scan,
    which is exactly the corpus-scale persist an ingest source must
    not impose. from_json honors the same corrupt-column option
    INSIDE its struct (no scan restriction), costs the same single
    pass, and the text scan keeps the raw line available for free.
    Parsed lines carry NULL `_corrupt`; unparseable lines — and
    valid-JSON lines with a TYPE-drifted declared field (doc_id a
    string): drift quarantines rather than nulling silently — carry
    the raw line there and NULLs elsewhere.
    """
    j = F.from_json(
        "value", DOC_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL})
    return (spark.read.text(path)
            .select(j.alias("__j"))
            .select(*[F.col(f"__j.{f.name}") for f in DOC_SCHEMA.fields]))


def conform_docs(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a raw scan into (clean, quarantined) — two filters off the
    same scan, no shuffle.

    clean: parsed rows with the REQUIRED fields present (doc_id, text
    non-empty), `lang`/`source` defaulted ('und'/'unknown' — absent
    metadata is data, not an error), n_chars recomputed, corrupt
    column dropped.
    quarantined: unparseable lines plus parsed rows missing required
    fields (absent OR type-drifted — from_json nulls a drifted field),
    each tagged with a reason for the audit trail, carrying doc_id
    when one parsed.
    """
    parsed = raw.filter(F.col(CORRUPT_COL).isNull())
    bad_parse = (raw.filter(F.col(CORRUPT_COL).isNotNull())
                 .select(F.col(CORRUPT_COL).alias("raw_line"),
                         F.lit("unparseable").alias("reason"),
                         "doc_id"))
    missing = (parsed.filter(
        F.col("doc_id").isNull()
        | F.col("text").isNull() | (F.trim("text") == ""))
        .select(F.to_json(F.struct("doc_id", "text", "lang", "source"))
                .alias("raw_line"),
                F.lit("missing_required").alias("reason"),
                "doc_id"))
    clean = (parsed.filter(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(
            "doc_id", "text",
            F.coalesce("lang", F.lit("und")).alias("lang"),
            F.coalesce("source", F.lit("unknown")).alias("source"),
            F.length("text").alias("n_chars")))
    return clean, bad_parse.unionByName(missing)
