"""Stored-LSH-index probe bench (BASELINE.md protocol, r08).

Two claims about the 100 TB nightly-ingest shape, measured:

1. STORED index beats recompute: `lsh_corpus_index` is written ONCE
   (band-partitioned, bucket-sorted parquet — write_lsh_corpus_index)
   and each nightly batch probe LOADS it instead of re-running the
   full shingle + 64-min-aggregate + banding corpus pass. This bench
   times (a) the one-time build+write, (b) a batch probe against the
   freshly-built in-memory index, (c) the same probe against the
   STORED index in a fresh logical "session" (nothing cached) — (c)
   must cost batch-side work + a parquet scan, independent of corpus
   re-computation.

2. Nightly-ratio cross-corpus dedup (index ≫ batch): dd_cross at
   index=N, batch=N/100 with broadcast_new on vs off — at this ratio
   the batch side is broadcast-small, the index pass dominates, and
   the broadcast plan should win (the r07 10⁷ probe used a 200k batch
   whose ~80 MB broadcast muddied the comparison).

Corpus: bench_corpus.synthetic_docs (deterministic, planted near-dups
at i % 50 == 1). Tonight's batch = doc_id % 100 == 1 (1% of corpus,
each a 49/50-token near-copy of doc i-1 in the index side).

Usage: python tools/bench_lsh_index.py [N] [--skip-cross]
       (default N = 1e6; probe batch = N/100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402

from contacts_etl_phase21_spark.operators.dedup import (  # noqa: E402
    cross_corpus_near_dups, release_cached,
)
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402
from contacts_etl_phase21_spark.streaming.dedup_ingest import (  # noqa: E402
    load_lsh_corpus_index, lsh_corpus_index, stream_near_dup_flags,
)
from contacts_etl_phase21_spark.streaming.dedup_ingest import (  # noqa: E402
    write_lsh_corpus_index,
)
from tools.bench_corpus import synthetic_docs  # noqa: E402


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    skip_cross = "--skip-cross" in sys.argv
    spark = get_spark("contacts-etl-phase21-lsh-index-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synthetic_docs(spark, n) \
        .repartition(spark.sparkContext.defaultParallelism).persist()
    docs.count()
    batch = docs.filter(F.col("doc_id") % 100 == 1)
    corpus = docs.filter(F.col("doc_id") % 100 != 1)
    out: dict = {"metric": "lsh_stored_index_sec", "index_docs": n,
                 "batch_docs": batch.count()}

    path = tempfile.mkdtemp(prefix="lsh_index_") + "/index"
    try:
        # one-time: build + write the artifact
        t0 = time.perf_counter()
        fresh = lsh_corpus_index(corpus, "doc_id", "text")
        write_lsh_corpus_index(fresh, path, n_files_per_band=32)
        out["build_write_sec"] = round(time.perf_counter() - t0, 1)

        # probe vs the in-memory fresh index (cached — the lower bound)
        t0 = time.perf_counter()
        n_fresh = stream_near_dup_flags(batch, fresh).count()
        out["probe_fresh_cached_sec"] = round(time.perf_counter() - t0, 1)
        fresh.unpersist()

        # probe vs the STORED index — the nightly shape: no corpus
        # recompute, just a parquet scan of the artifact
        t0 = time.perf_counter()
        stored = load_lsh_corpus_index(spark, path)
        n_stored = stream_near_dup_flags(batch, stored).count()
        out["probe_stored_sec"] = round(time.perf_counter() - t0, 1)

        # recompute-from-text baseline the artifact replaces
        t0 = time.perf_counter()
        rebuilt = lsh_corpus_index(corpus, "doc_id", "text")
        n_rebuilt = stream_near_dup_flags(batch, rebuilt).count()
        out["probe_recompute_sec"] = round(time.perf_counter() - t0, 1)
        rebuilt.unpersist()

        assert n_fresh == n_stored == n_rebuilt, (n_fresh, n_stored,
                                                  n_rebuilt)
        out["flags"] = n_stored
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)

    if not skip_cross:
        for bcast in (True, False):
            t0 = time.perf_counter()
            cross = cross_corpus_near_dups(batch, corpus, "doc_id",
                                           "text", broadcast_new=bcast)
            n_cross = cross.count()
            dt = round(time.perf_counter() - t0, 1)
            release_cached(cross)
            out[f"cross_broadcast_{str(bcast).lower()}_sec"] = dt
            out["cross_pairs"] = n_cross
            print(f"# cross broadcast_new={bcast}: {dt}s "
                  f"{n_cross} pairs", file=sys.stderr, flush=True)

    docs.unpersist()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
