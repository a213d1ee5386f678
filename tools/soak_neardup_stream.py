"""24/7 soak for the watermarked near-dup stream (BASELINE.md, r09).

The state eviction is unit-pinned (a pair's state row is removed once
the watermark passes); this probe shows the property that matters for
a 24/7 deployment: under SUSTAINED constant-rate ingest the state
store PLATEAUS at ingest-rate × delay instead of growing with stream
lifetime. 60 micro-batches (one per staged file, lexicographic order),
event time advancing 1 minute per batch, watermark delay 10 minutes →
the plateau must appear after ~11 batches and hold to the end.

Each batch carries 20 docs duplicating corpus text (unique arriving
ids per batch → every flagged pair key is new) and 20 unique filler
docs, so flags from the watermarked stream must EQUAL the batch
twin's flags over the whole staging (no pair recurs across windows —
equality inside the delay window, the pinned contract).

Usage: python tools/soak_neardup_stream.py [n_batches]
Emits one JSON line: per-batch state rows/bytes + plateau summary.
"""

from __future__ import annotations

import json
import os
import sys
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402


def main() -> int:
    import tempfile

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.session import get_spark
    from contacts_etl_phase21_spark.streaming.dedup_ingest import (
        lsh_corpus_index, stream_near_dup_flags,
        stream_near_dup_flags_watermarked,
    )

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    spark = get_spark("contacts-etl-phase21-neardup-soak")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0).limit(50)
    idx = lsh_corpus_index(corpus, "doc_id", "text")
    texts = [r["text"] for r in corpus.select("text").collect()
             if r["text"] and len(r["text"].split()) >= 5][:20]

    with tempfile.TemporaryDirectory() as tmp:
        staged = f"{tmp}/arrive"
        for b in range(n_batches):
            # strictly advancing event time: minute b from 08:00
            hh, mm = 8 + b // 60, b % 60
            ts = f"2024-01-01 {hh:02d}:{mm:02d}:00"
            rows = [(100_000 + b * 1000 + i, texts[i % len(texts)], ts)
                    for i in range(20)]
            rows += [(100_000 + b * 1000 + 500 + i,
                      " ".join(f"flr{b}x{i}w{t}" for t in range(30)), ts)
                     for i in range(20)]
            spark.createDataFrame(
                rows, "doc_id long, text string, ts_s string") \
                .select("doc_id", "text",
                        F.to_timestamp("ts_s").alias("ts")) \
                .coalesce(1).write.parquet(f"{staged}/b_{b:04d}")

        schema = "doc_id long, text string, ts timestamp"
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .option("recursiveFileLookup", "true")
                  .parquet(staged))
        out = stream_near_dup_flags_watermarked(stream, idx, ts_col="ts",
                                                delay="10 minutes")
        name = f"soak_{uuid.uuid4().hex[:8]}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(1800)

        batches = []
        for p in q.recentProgress:
            if not p["stateOperators"]:
                continue
            so = p["stateOperators"][0]
            batches.append({
                "batch": p["batchId"],
                "state_rows": so["numRowsTotal"],
                "state_bytes": so["memoryUsedBytes"],
                "removed": so["numRowsRemoved"],
                "updated": so["numRowsUpdated"],
            })
        got = {(r["doc_id"], r["dup_of"], r["jaccard"]) for r in
               spark.sql(f"SELECT * FROM {name}").collect()}

        arriving = spark.read.option("recursiveFileLookup", "true") \
            .parquet(staged)
        want = {(r["doc_id"], r["dup_of"], r["jaccard"]) for r in
                stream_near_dup_flags(arriving.drop("ts"), idx,
                                      collapse_exact=False).collect()}
        flags_equal = got == want

    tail = [b["state_rows"] for b in batches[len(batches) // 2:]]
    head_max = max(b["state_rows"] for b in batches)
    report = {
        "metric": "neardup_soak_state_plateau",
        "n_batches": n_batches,
        "flags": len(got),
        "flags_equal_batch_twin": flags_equal,
        "state_rows_max": head_max,
        "state_rows_tail_min": min(tail) if tail else None,
        "state_rows_tail_max": max(tail) if tail else None,
        "load_1m": round(os.getloadavg()[0], 2),
        "batches": batches,
    }
    print(json.dumps(report), flush=True)
    idx.unpersist()
    spark.stop()
    return 0 if flags_equal else 1


if __name__ == "__main__":
    sys.exit(main())
