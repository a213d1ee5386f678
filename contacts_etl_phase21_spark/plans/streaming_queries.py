"""Streaming-shaped queries (batch twins of streaming/events.py plans).

The driver's oracle harness is batch-only, so these run the shared
transformations in batch mode; tests/test_streaming.py drives the same
transforms through readStream/writeStream with availableNow triggers to
prove stream-mode parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.plans.registry import (
    cents_oracle, e6_oracle, query, scale_cents, scale_e6,
)
from contacts_etl_phase21_spark.streaming.events import (
    sessionized_counts_batch, sliding_window_counts_batch,
    windowed_counts_batch,
)
from contacts_etl_phase21_spark.streaming.stateful import first_event_batch


@query(
    "st_tumbling_window_counts",
    survey="streaming-ext",
    doc="Tumbling 1h window counts + value sums per event_type — the "
        "watermarked Structured Streaming aggregation's batch twin "
        "(shared transform). Partial aggregation map-side, one shuffle "
        "on (window, event_type).",
    oracle=cents_oracle("""
        SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """, "sum_value"),
)
def st_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scale_cents(windowed_counts_batch(spark, sf_dir, "1 hour"),
                       "sum_value")


@query(
    "st_session_window_counts",
    survey="streaming-ext",
    doc="Per-user session windows (5 min gap) via session_window — "
        "Spark's built-in stateful sessionization; the oracle is the "
        "classic gaps-and-islands SQL (lag + running sum).",
    oracle=cents_oracle("""
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 5 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM sessions
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """, "sum_value"),
)
def st_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scale_cents(sessionized_counts_batch(spark, sf_dir, "5 minutes"),
                       "sum_value")


@query(
    "st_sliding_window_counts",
    survey="streaming-ext",
    doc="Sliding 1h windows every 30min per event_type — overlapping "
        "window membership expanded map-side (Expand), then one "
        "shuffle; the oracle unions the two half-hour-aligned window "
        "starts each event belongs to.",
    oracle=cents_oracle("""
        WITH m AS (
            SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800)
                        AS TIMESTAMP) AS w0, event_type, value FROM events
            UNION ALL
            SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800 - 1800)
                        AS TIMESTAMP) AS w0, event_type, value FROM events
        )
        SELECT w0 AS window_start, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM m
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """, "sum_value"),
)
def st_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scale_cents(
        sliding_window_counts_batch(spark, sf_dir, "1 hour", "30 minutes"),
        "sum_value")


@query(
    "st_incremental_er_assign",
    survey="streaming-ext,E1-E5",
    doc="Incremental streaming entity resolution: arriving contact "
        "records are assigned to clusters statefully per block_key "
        "(applyInPandasWithState; one GroupState per block holding "
        "members+clusters, scored with the SAME pure merge_core pair "
        "semantics as batch). First-wins assignment; on direct-link "
        "merge topologies it equals the batch fixpoint exactly, and "
        "reconcile_assignments (er_ingest.py) is the periodic batch "
        "compaction that heals bridge-induced divergence back to the "
        "fixpoint — both pinned in tests/test_streaming.py. The two "
        "sources are staged as separate lexicographically-ordered "
        "micro-batches (linkedin first — its rids are smaller), so the "
        "first-wins arrival order is pinned and the converged "
        "assignment is exactly the batch fixpoint: every k%3==0 gmail "
        "record joins its linkedin email-twin's cluster (cluster_id = "
        "the linkedin rid = custkey); everything else is a singleton. "
        "The oracle recomputes that closed form (rid namespacing: "
        "linkedin = 0*2^60 + k, gmail = 1*2^60 + k; block_key = folded "
        "surname).",
    oracle="""
        SELECT block_key, rid, cluster_id FROM (
            SELECT 'surname' || CAST(c_custkey % 500 AS VARCHAR)
                       AS block_key,
                   CAST(c_custkey AS BIGINT) AS rid,
                   CAST(c_custkey AS BIGINT) AS cluster_id
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT 'surname' || CAST(c_custkey % 500 AS VARCHAR),
                   1152921504606846976 + c_custkey,
                   CASE WHEN c_custkey % 3 = 0 THEN c_custkey
                        ELSE 1152921504606846976 + c_custkey END
            FROM customer)
        ORDER BY rid
    """,
)
def st_incremental_er_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid as _uuid

    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.operators.entity_resolution import (
        prepare_for_matching,
    )
    from contacts_etl_phase21_spark.plans.coverage_queries import (
        synthetic_contact_records,
    )
    from contacts_etl_phase21_spark.streaming.er_ingest import (
        drain_to_table, incremental_er_assignments,
        stream_records_from_dir,
    )

    records = synthetic_contact_records(spark, sf_dir)
    staged = tempfile.mkdtemp(prefix="er_ingest_q_")
    try:
        # arrival order pinned: linkedin (smaller rids) in batch 1,
        # gmail in batch 2 — first-wins then equals the batch fixpoint
        records.filter(F.col("source") == "linkedin").coalesce(1) \
            .write.mode("overwrite").parquet(f"{staged}/a_linkedin")
        records.filter(F.col("source") == "gmail").coalesce(1) \
            .write.mode("overwrite").parquet(f"{staged}/b_gmail")
        stream = stream_records_from_dir(spark, records.schema, staged,
                                         files_per_trigger=1)
        assigned = drain_to_table(
            incremental_er_assignments(prepare_for_matching(stream)),
            f"er_assign_{_uuid.uuid4().hex[:8]}")
    finally:
        # the memory sink holds the rows on the driver; the staged
        # parquet is fully consumed once the drain returns
        shutil.rmtree(staged, ignore_errors=True)
    return assigned.orderBy("rid")


@query(
    "st_stateful_first_event",
    survey="streaming-ext",
    doc="First event per (user_id, event_type) — batch twin of the "
        "applyInPandasWithState custom stateful dedup stream "
        "(streaming/stateful.py; stream-vs-batch parity pinned in "
        "tests/test_streaming.py). Batch shape: one window shuffle, "
        "row_number argmin by (ts, event_id).",
    oracle="""
        SELECT user_id, event_type,
               event_id AS first_event_id, value AS first_value
        FROM (
            SELECT user_id, event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events)
        WHERE rn = 1
        ORDER BY user_id, event_type
    """,
)
def st_stateful_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    return first_event_batch(spark, sf_dir)


@query(
    "st_stream_near_dup_flags",
    survey="streaming-ext,LLM-dedup(stream)",
    doc="Streaming near-dup ingestion (streaming/dedup_ingest.py): "
        "arriving documents (odd doc_ids) probe a static MinHash-LSH "
        "index of the existing corpus (even doc_ids) via a "
        "stream-static equi-join on band buckets — stateless on the "
        "stream side (row-local signatures, no stream shuffle), "
        "verified with exact Jaccard. This is the batch twin of the "
        "shared transform; tests/test_streaming.py drives the same "
        "plan through readStream/availableNow and pins parity, plus "
        "the row-local-vs-aggregate signature equivalence. Oracle = "
        "exact bipartite Jaccard. The LSH candidate stage is "
        "probabilistic: P(miss) = (1-j^4)^16 < 1e-3 at j = 0.8 (same "
        "bound as dd_minhash_lsh_verified, not exactly 1), so the "
        "oracle equivalence is probabilistic for pairs near the "
        "threshold — no miss occurs on the driver tables.",
    oracle=e6_oracle("""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s
            FROM toks
        )
        SELECT a.doc_id, b.doc_id AS dup_of,
               ROUND(len(list_intersect(a.s, b.s)) * 1.0
                     / len(list_distinct(list_concat(a.s, b.s))), 6)
                   AS jaccard
        FROM sh a JOIN sh b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        WHERE ROUND(len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.8
        ORDER BY a.doc_id, dup_of
    """, "jaccard"),
)
def st_stream_near_dup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.streaming.dedup_ingest import (
        near_dup_flags_batch,
    )

    return scale_e6(near_dup_flags_batch(spark, sf_dir), "jaccard")


@query(
    "st_stream_ann_topk",
    survey="streaming-ext,LLM-similarity-search(serving)",
    doc="Streaming ANN serving (streaming/ann_serving.py): arriving "
        "query vectors (odd vec_ids < 40) probe a static IVF-PQ-"
        "encoded corpus (even vec_ids) via a stream-static equi-join "
        "on the coarse cell — the stream side is stateless row-local "
        "projection (probe assignment, e6 ADC tables), per-query "
        "top-k runs in applyInPandasWithState with immediate state "
        "removal (one key per in-flight query). This is the batch "
        "twin of the shared transform; tests/test_streaming.py drives "
        "the same plan through readStream/availableNow and pins "
        "stream-vs-batch parity. The oracle reproduces the whole "
        "IVFADC chain in SQL on the same corpus/query split "
        "(first-n quantizers — see ann_ivfpq_topk).",
    oracle=None,  # replaced below — needs the generator from llm_ops
)
def st_stream_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.streaming.ann_serving import (
        stream_ann_topk,
    )

    from contacts_etl_phase21_spark.operators.similarity_search import (
        ivfpq_relational_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    arriving = emb.filter((F.col("vec_id") % 2 == 1)
                          & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("query_id"), "embedding")
    # batch twin: no persist needed (one-shot plan); the streaming
    # path (tests/test_streaming.py) goes through ivfpq_serving_index,
    # which persists + materializes the static side per its contract
    cent_rows, codebooks, enc = ivfpq_relational_index(corpus)
    out = stream_ann_topk(arriving, cent_rows, codebooks, enc,
                          k=10, n_probe=2)
    return scale_e6(out, "pq_cosine").orderBy("query_id", "rank")


def _wire_stream_ann_oracle() -> None:
    """Attach the generated IVFADC oracle for the serving split —
    done post-registration because the generator lives in llm_ops
    (imported lazily to avoid a plans-module import cycle)."""
    from dataclasses import replace

    from contacts_etl_phase21_spark.plans import llm_ops
    from contacts_etl_phase21_spark.plans.registry import QUERIES

    sql = e6_oracle(llm_ops._ivfpq_oracle(
        corpus_pred="vec_id % 2 = 0",
        query_pred="vec_id % 2 = 1 AND vec_id < 40"), "pq_cosine")
    QUERIES["st_stream_ann_topk"] = replace(
        QUERIES["st_stream_ann_topk"], oracle=sql)


_wire_stream_ann_oracle()


@query(
    "st_stream_asof_enrich",
    survey="streaming-ext,J-ext(asof-serving)",
    doc="Streaming point-in-time enrichment (streaming/asof_enrich.py):"
        " arriving purchase events pick up the same user's view "
        "snapshot valid AT THEIR TIMESTAMP via a STATELESS stream-"
        "static range join — the snapshot side compiles once into "
        "disjoint validity intervals (greatest-tie at equal ts, like "
        "asof_join), so each event matches at most one row and no "
        "state store exists at all (tests assert zero stateOperators; "
        "contrast st_stream_ann_topk's per-query state). This is the "
        "batch twin of the shared transform; the oracle is the as-of "
        "reference SQL (equivalent because intervals tile the "
        "timeline up to the events horizon).",
    oracle=e6_oracle("""
        WITH l AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
            FROM events WHERE event_type = 'view'
        ),
        cand AS (
            SELECT l.event_id, r.event_id AS view_event_id,
                   r.ts_us AS view_ts_us, r.value AS view_value,
                   ROW_NUMBER() OVER (PARTITION BY l.event_id
                       ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
            FROM l JOIN r ON l.user_id = r.user_id
                         AND r.ts_us <= l.ts_us
        )
        SELECT l.event_id, l.user_id, l.ts_us,
               c.view_event_id, c.view_ts_us,
               ROUND(c.view_value, 6) AS view_value
        FROM l LEFT JOIN cand c ON c.event_id = l.event_id AND c.rn = 1
        ORDER BY l.event_id
    """, "view_value"),
)
def st_stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators.asof import (
        validity_intervals,
    )
    from contacts_etl_phase21_spark.streaming.asof_enrich import (
        stream_asof_enrich,
    )

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts", "value")
    horizon = ev.agg(F.max(F.unix_micros("ts"))).first()[0]
    # batch twin: no persist needed (one-shot plan); the streaming
    # path (tests/test_streaming.py) goes through asof_enrichment_index
    idx = validity_intervals(views, "user_id", "ts", ["value"],
                             "event_id", horizon_end_us=horizon)
    out = stream_asof_enrich(purchases, idx, "user_id", "ts")
    return scale_e6(
        out.select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("snap_event_id").alias("view_event_id"),
            F.unix_micros("snap_valid_from").alias("view_ts_us"),
            F.round("snap_value", 6).alias("view_value"))
        .orderBy("event_id"),
        "view_value")


@query(
    "st_curate_ingest",
    survey="streaming-ext,LLM-curation(ingest)",
    doc="Streaming ingest curation (streaming/curate_ingest.py): "
        "every arriving doc passes quality filter -> raw-content "
        "fingerprint -> ROW-LOCAL 8-gram decontamination (eval set as "
        "a broadcast variable in mapInPandas — the batch operator's "
        "explode+join+groupBy is stateful mid-stream) -> exact-"
        "fingerprint dedup (the one stateful op; state = distinct "
        "fingerprints) -> PII scrub -> md5 shard. Near-dup dedup "
        "stays in the batch compactor (curate_corpus), the production "
        "split. Batch twin of the shared transform; the oracle "
        "recomputes quality, clamped string n-gram overlap, keep-min-"
        "id fingerprint dedup and md5 shards in SQL. Scrubbed text is "
        "test-verified, not hash-carried.",
    oracle="""
        WITH s AS (
            SELECT doc_id, lang, text,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(regexp_extract_all(lower(text),
                       '\\b(the|a|of|and|to)\\b')) AS n_stop,
                   length(replace(trim(text), ' ', '')) AS n_nonspace
            FROM documents WHERE doc_id % 10 <> 0
        ),
        qual AS (
            SELECT doc_id, lang, text FROM s WHERE
              (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END)
            + (CASE WHEN ROUND(n_nonspace * 1.0 / n_tokens, 4)
                         BETWEEN 2.0 AND 12.0 THEN 30 ELSE 0 END)
            + (CASE WHEN ROUND(n_stop * 1.0 / n_tokens, 4) > 0
                    THEN 20 ELSE 0 END)
            + (CASE WHEN ROUND(n_punct * 1.0 / n_chars, 4) <= 0.2
                    THEN 10 ELSE 0 END) >= 90
        ),
        wq AS (
            SELECT doc_id, lang, text,
                   string_split(trim(text), ' ') AS w
            FROM qual
        ),
        gq AS (
            SELECT doc_id,
                   list_distinct([array_to_string(
                       w[i:least(i + 7, len(w))], ' ')
                       for i in range(1, greatest(len(w) - 7, 1) + 1)])
                       AS grams
            FROM wq
        ),
        ev AS (
            SELECT DISTINCT unnest(
                list_distinct([array_to_string(
                    w[i:least(i + 7, len(w))], ' ')
                    for i in range(1, greatest(len(w) - 7, 1) + 1)])) AS gg
            FROM (SELECT string_split(trim(text), ' ') AS w
                  FROM documents WHERE doc_id % 10 = 0)
        ),
        contaminated AS (
            SELECT DISTINCT g.doc_id
            FROM (SELECT doc_id, unnest(grams) AS gg FROM gq) g
            JOIN ev USING (gg)
        ),
        clean AS (
            SELECT doc_id, lang, text FROM wq
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ),
        fp AS (
            SELECT doc_id, lang,
                   md5(array_to_string(list_sort(list_distinct(
                       regexp_split_to_array(trim(lower(text)), '\\s+'))),
                       ' ')) AS f
            FROM clean
        ),
        kept AS (SELECT f, MIN(doc_id) AS doc_id FROM fp GROUP BY f)
        SELECT k.doc_id, p.lang,
               CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT % 8 AS INT) AS shard
        FROM kept k JOIN fp p USING (doc_id)
        ORDER BY k.doc_id
    """,
)
def st_curate_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators.decontamination import (
        broadcast_eval_ngrams,
    )
    from contacts_etl_phase21_spark.streaming.curate_ingest import (
        stream_curate_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    arriving = docs.filter(F.col("doc_id") % 10 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    eval_bc = broadcast_eval_ngrams(eval_docs, "doc_id", "text", n=8)
    out = stream_curate_ingest(arriving, eval_bc)
    return out.select("doc_id", "lang", "shard").orderBy("doc_id")


@query(
    "st_source_cap_ingest",
    survey="streaming-ext,LLM-sample(source-cap-online)",
    doc="Streaming per-source quota admission (r06 s4, streaming/"
        "quota_ingest.py): arriving docs are admitted until their "
        "source's quota (10) is spent — first-cap-BY-ARRIVAL, the "
        "only meaningful online quota. State is ONE LONG per source "
        "(admitted count), independent of corpus size and stream "
        "lifetime — the fourth state regime (no eviction needed: a "
        "quota is a property of the ingest, not a window). The "
        "registered run stages the documents in id order across two "
        "micro-batch files and drains the REAL stream; arrival order "
        "= id order makes the admission equal the batch twin, so the "
        "oracle is the plain first-cap-by-id QUALIFY. Stream-vs-batch "
        "parity and cross-batch enforcement are additionally pinned "
        "in tests/test_streaming.py.",
    oracle="""
        SELECT source, doc_id, CAST(r AS INT) AS adm_rank FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY doc_id) AS r
            FROM documents)
        WHERE r <= 10
        ORDER BY source, doc_id
    """,
)
def st_source_cap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid as _uuid

    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.streaming.er_ingest import (
        drain_to_table, stream_records_from_dir,
    )
    from contacts_etl_phase21_spark.streaming.quota_ingest import (
        stream_source_cap,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    staged = tempfile.mkdtemp(prefix="source_cap_q_")
    try:
        half = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
        docs.filter(F.col("doc_id") <= half).coalesce(1) \
            .write.mode("overwrite").parquet(f"{staged}/a_first")
        docs.filter(F.col("doc_id") > half).coalesce(1) \
            .write.mode("overwrite").parquet(f"{staged}/b_second")
        stream = stream_records_from_dir(spark, docs.schema, staged,
                                         files_per_trigger=1)
        admitted = drain_to_table(
            stream_source_cap(stream, cap=10),
            f"source_cap_{_uuid.uuid4().hex[:8]}")
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return admitted.orderBy("source", "doc_id")


@query(
    "st_snapshot_delta_ingest",
    survey="streaming-ext,LLM-dedup(snapshot-delta-online)",
    doc="Streaming snapshot-delta classification (r06 s4, streaming/"
        "delta_ingest.py): every ARRIVING doc is classified against "
        "the previous snapshot's static fingerprint index (added / "
        "changed / unchanged) via a stream-static LEFT equi-join on "
        "id — STATELESS (zero state stores, the asof_enrich regime; "
        "pinned in tests). 'removed' is unobservable online by "
        "design — a doc that stops arriving never produces an "
        "arrival — so the batch snapshot_delta full-outer join stays "
        "the periodic compactor that finds removals (the cheap-"
        "online / complete-offline split, third instance). The "
        "registered run drains a real two-micro-batch stream; the "
        "oracle is the batch diff minus its removed rows.",
    oracle="""
        WITH o AS (
            SELECT doc_id, md5(COALESCE(text, '')) AS old_fp
            FROM documents WHERE doc_id % 10 < 8
        ),
        n AS (
            SELECT doc_id,
                   md5(COALESCE(CASE WHEN doc_id % 7 = 0
                                     THEN upper(text)
                                     ELSE text END, '')) AS new_fp
            FROM documents WHERE doc_id % 10 >= 2
        )
        SELECT n.doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN o.old_fp = n.new_fp THEN 'unchanged'
                    ELSE 'changed' END AS status,
               o.old_fp, n.new_fp
        FROM n LEFT JOIN o ON o.doc_id = n.doc_id
        ORDER BY n.doc_id
    """,
)
def st_snapshot_delta_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid as _uuid

    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.streaming.delta_ingest import (
        old_fingerprint_index, stream_snapshot_delta,
    )
    from contacts_etl_phase21_spark.streaming.er_ingest import (
        drain_to_table, stream_records_from_dir,
    )

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 >= 2).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.upper(F.col("text")))
        .otherwise(F.col("text")).alias("text"))
    idx = old_fingerprint_index(old, "doc_id", "text")
    staged = tempfile.mkdtemp(prefix="snap_delta_q_")
    try:
        half = new.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
        new.filter(F.col("doc_id") <= half).coalesce(1) \
            .write.mode("overwrite").parquet(f"{staged}/a_first")
        new.filter(F.col("doc_id") > half).coalesce(1) \
            .write.mode("overwrite").parquet(f"{staged}/b_second")
        stream = stream_records_from_dir(spark, new.schema, staged,
                                         files_per_trigger=1)
        classified = drain_to_table(
            stream_snapshot_delta(stream, idx, "doc_id", "text"),
            f"snap_delta_{_uuid.uuid4().hex[:8]}")
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        idx.unpersist()
    return classified.orderBy("doc_id")
