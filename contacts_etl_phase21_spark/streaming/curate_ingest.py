"""Streaming ingest curation — the 24/7 half of curate_corpus: every
arriving document passes the cheap hygiene stages ONLINE and lands
already filtered, decontaminated, deduplicated and sharded; expensive
near-dup dedup stays in the periodic batch compactor (curate_corpus /
stream_near_dup_flags), which is how production ingest pipelines split
the work.

Stage order (mirrors curate_corpus where both exist):

  quality filter        row-local column expression in the scan
  content fingerprint   row-local md5 of the RAW sorted token set —
                        computed before any redaction so a doc and its
                        scrubbed twin still collide
  decontamination       ROW-LOCAL: hashed 8-gram array (also built
                        row-locally) checked against the eval set as a
                        broadcast variable inside mapInPandas — the
                        batch operator's explode+join+groupBy would be
                        a stateful aggregation mid-stream
  exact dedup           dropDuplicates on the fingerprint: the ONLY
                        stateful operator in the pipeline (state =
                        distinct fingerprints; availableNow drains
                        bound it; a 24/7 deployment with event-time
                        docs uses dropDuplicatesWithinWatermark, the
                        stream_near_dup_flags_watermarked pattern).
                        The batch twin keeps min-id per fingerprint,
                        equal to arrival-order-first when docs arrive
                        in id order
  PII scrub             row-local regex redaction of the SURVIVORS'
                        text (scrub-before-storage)
  shard assignment      row-local md5 shard

Everything except the fingerprint dedup is a stateless projection, so
the stream side never shuffles and state carries distinct content
fingerprints only — not documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.operators.decontamination import (
    with_rowlocal_contamination,
)
from contacts_etl_phase21_spark.operators.dedup import with_hashed_shingles
from contacts_etl_phase21_spark.operators.pii import redact_pii
from contacts_etl_phase21_spark.operators.sampling import shard_id
from contacts_etl_phase21_spark.operators.text_analysis import (
    content_fingerprint, quality_score,
)


def stream_curate_ingest(docs: DataFrame, eval_bc,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         strata_col: str = "lang",
                         min_quality: int = 90, ngram: int = 8,
                         n_shards: int = 8) -> DataFrame:
    """(id, strata, shard, scrubbed text) per surviving arrival.
    Works identically on a batch frame (the twin the oracle checks),
    except dedup keeps arrival-order-first on a stream and min-id in
    batch — identical when arrival order is id order."""
    q = docs.filter(quality_score(F.col(text_col)) >= min_quality) \
        .withColumn("__fp", content_fingerprint(F.col(text_col)))
    sh = with_hashed_shingles(q, id_col, text_col, ngram,
                              keep_cols=[text_col, strata_col, "__fp"])
    clean = with_rowlocal_contamination(sh, eval_bc) \
        .filter(F.col("contaminated") == 0)
    if clean.isStreaming:
        kept = clean.dropDuplicates(["__fp"])
    else:
        firsts = clean.groupBy("__fp").agg(F.min("doc").alias("doc"))
        kept = clean.join(firsts, ["__fp", "doc"])
    return kept.select(
        F.col("doc").alias(id_col),
        F.col(strata_col),
        shard_id(F.col("doc"), n_shards).cast("int").alias("shard"),
        redact_pii(F.col(text_col)).alias(text_col))
