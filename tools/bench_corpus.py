"""Corpus-operator scale bench (LLM-pipeline ops at 10^5-10^7 docs).

The driver testdata caps `documents` at 5k rows (sf0.1) — three orders
below where corpus-op plan shapes start to matter. This protocol
generates N synthetic documents DECLARATIVELY (pure column expressions
over a range — no driver-side rows, no RNG) with planted near-dup
pairs, and times the headline corpus operators end to end:

- dd_exact:   order-insensitive fingerprint groups (hash groupBy)
- dd_lsh:     MinHash+LSH verified near-dup pairs (the 100 TB path)
- dd_keep:    end-to-end keep-first dedup (LSH pairs + components)
- ta_scan:    language-id + quality + token counts in one projection
- decontam:   broadcast 8-gram overlap vs a 1% eval slice
- ann_lsh:    sign-LSH top-10 over N synthetic 64-dim embeddings

Corpus construction: doc i has 50 tokens, token j = "w<h>" where
h = xxhash64(i, j) % vocab (vocab 50k) — deterministic,
properly mixed (a LINEAR formula here makes every pair of docs whose
starts differ by one step share 47/48 shingles — the whole corpus
becomes one near-dup chain), re-runnable at any partitioning. Planted
structure: i % 97 == 3 docs are EXACT copies of doc i-3;
i % 50 == 1 docs copy doc i-1 except the last token (49/50 tokens
shared -> Jaccard ~0.9 near-dups). Train docs at i ≡ 1 (mod 100) are
near-copies of eval docs (i-1 ≡ 0 mod 100), so decontamination has a
planted ~1% contaminated slice.

Usage:  python tools/bench_corpus.py [N ...]   (default: 1e5 1e6)
Prints one JSON line per N:
  {"metric": "corpus_ops_sec", "docs": N, "stages": {...},
   "value": total, "unit": "sec"}
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from contacts_etl_phase21_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
DOC_TOKENS = 50
DIM = 64


def synthetic_docs(spark: SparkSession, n: int) -> DataFrame:
    """(doc_id, text, lang) — declarative generator, no driver rows."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # exact dup: i % 97 == 3 copies doc i-3 wholesale; near-dup:
    # i % 50 == 1 copies doc i-1 except the last token
    src = F.when(F.col("doc_id") % 97 == 3, F.col("doc_id") - 3) \
        .when(F.col("doc_id") % 50 == 1, F.col("doc_id") - 1) \
        .otherwise(F.col("doc_id"))
    tok = (
        lambda i, j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(i, j), F.lit(VOCAB)).cast("string")))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
        lambda j: F.when(
            (F.col("doc_id") % 50 == 1) & (F.col("doc_id") % 97 != 3)
            & (j == DOC_TOKENS - 1),
            tok(F.col("doc_id"), j)).otherwise(tok(src, j)))
    return base.select(
        "doc_id",
        F.array_join(toks, " ").alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("es"),
                             F.lit("fr"), F.lit("zh")),
                     (F.col("doc_id") % 5 + 1).cast("int")).alias("lang"))


def synthetic_embeddings(spark: SparkSession, n: int) -> DataFrame:
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    comp = lambda j: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(104729))
        .cast("double") / 104729.0 - 0.5)
    return base.select(
        "vec_id",
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda j: comp(j).cast("float")).alias("embedding"))


def _unit(tag: str, a, b) -> F.Column:
    """Deterministic pseudo-uniform in (0, 1) from (tag, a, b) — the
    same stateless xxhash64 pattern as the doc generator; +0.5 keeps
    the value strictly inside (0,1) so log/cos below stay finite."""
    return ((F.pmod(F.xxhash64(F.lit(tag), a, b), F.lit(104729))
             .cast("double") + 0.5) / 104729.0)


def _gauss(tag: str, a, b) -> F.Column:
    """Standard normal via Box-Muller on two hash-uniforms — still
    pure column algebra: no RNG state, reproducible at any
    partitioning (re-runs select the SAME corpus)."""
    u1 = _unit(tag + "1", a, b)
    u2 = _unit(tag + "2", a, b)
    import math

    return (F.sqrt(-2.0 * F.log(u1))
            * F.cos(F.lit(2.0 * math.pi) * u2))


def clustered_embeddings(spark: SparkSession, n: int,
                         n_clusters: int = 32,
                         sigma: float = 0.35) -> DataFrame:
    """Deterministic mixture-of-Gaussians embeddings (r05 judge brief
    #2): vector i belongs to cluster c = xxhash64(i) % n_clusters and
    equals center_c + sigma · z_i, with center components and noise
    both standard-normal via Box-Muller on integer hashes — fully
    hash-seeded, no RNG state (same pattern as synthetic_docs).

    Geometry: |center|² ≈ DIM, |noise|² ≈ DIM·σ², so expected
    within-cluster cosine ≈ 1/(1+σ²) (~0.89 at σ=0.35) against ~0
    across clusters — the shape real embedding corpora have and the
    isotropic driver/bench vectors deliberately lack (sign-LSH's
    worst case, BASELINE.md round-5). ANN recall numbers on THIS
    corpus are the ones that transfer to production embedding
    stores."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    c = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_clusters))
    comp = lambda j: (  # noqa: E731
        _gauss("ctr", c, j) + F.lit(sigma) * _gauss("nz", F.col("vec_id"), j))
    return base.select(
        "vec_id",
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda j: comp(j).cast("float")).alias("embedding"),
        c.cast("int").alias("label"))


def run_once(spark: SparkSession, n: int) -> dict:
    from contacts_etl_phase21_spark.operators import dedup as dd
    from contacts_etl_phase21_spark.operators import similarity_search as ann
    from contacts_etl_phase21_spark.operators import text_analysis as ta
    from contacts_etl_phase21_spark.operators.decontamination import (
        contamination_flags,
    )

    stages: dict[str, float] = {}
    t_all = time.perf_counter()

    docs = synthetic_docs(spark, n) \
        .repartition(spark.sparkContext.defaultParallelism).persist()
    docs.count()
    stages["generate"] = round(time.perf_counter() - t_all, 1)

    t0 = time.perf_counter()
    n_exact = dd.exact_duplicates(
        docs, "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(
            F.split(F.trim(F.col("text")), r"\s+"))), " "))).count()
    stages["dd_exact"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    n_lsh = dd.minhash_lsh_pairs(docs, "doc_id", "text").count()
    stages["dd_lsh"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    n_kept = dd.dedup_keep_first(docs, "doc_id", "text") \
        .filter(F.col("kept") == 1).count()
    stages["dd_keep"] = round(time.perf_counter() - t0, 1)

    # r10 s2: cross-document line dedup — 50-token docs relined into
    # 5 lines of 10; planted exact copies (i % 97 == 3) collapse all
    # five lines, near-dups (i % 50 == 1) collapse 4 of 5. The agg
    # reads cleaned_text so the rebuild assembly actually executes
    # instead of being column-pruned away.
    t0 = time.perf_counter()
    wtok = F.split(F.trim(F.col("text")), " ")
    relined = docs.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(DOC_TOKENS // 10 - 1)),
                        lambda i: F.array_join(
                            F.slice(wtok, i * 10 + 1, 10), " ")),
            "\n").alias("text"))
    lrow = dd.dedup_lines_keep_first(relined, "doc_id", "text").agg(
        F.count(F.lit(1)), F.sum("kept_lines"),
        F.sum(F.length("cleaned_text"))).collect()[0]
    stages["dd_lines"] = round(time.perf_counter() - t0, 1)

    # r10 s2: leakage-safe split — the dd_keep component spine plus
    # scan-side md5 bucket arithmetic; the delta vs dd_keep IS the
    # split's own cost
    t0 = time.perf_counter()
    from contacts_etl_phase21_spark.operators.sampling import (
        leakage_safe_split,
    )
    split_counts = {
        r["split"]: r["count"]
        for r in leakage_safe_split(docs, "doc_id", "text")
        .groupBy("split").count().collect()}
    stages["sp_split"] = round(time.perf_counter() - t0, 1)

    # r07 s2: cross-corpus near-dedup — the 2% near-dup copies
    # (i % 50 == 1) are "tonight's batch", their originals sit in the
    # index; expected ≥1 verified pair per new doc, index probed via
    # the broadcast new side (plus any exact-copy planted overlap).
    t0 = time.perf_counter()
    newb = docs.filter(F.col("doc_id") % 50 == 1)
    idx = docs.filter(F.col("doc_id") % 50 != 1)
    cross = dd.cross_corpus_near_dups(newb, idx, "doc_id", "text")
    n_cross = cross.count()
    n_cross_direct = cross.filter(
        F.col("index_id") == F.col("new_id") - 1).count()
    dd.release_cached(cross)
    stages["dd_cross"] = round(time.perf_counter() - t0, 1)

    # r07 s2: token-budget selection of the top-10%-by-length prefix —
    # two-pass prefix sum blocked on the bucketized sort key
    t0 = time.perf_counter()
    from contacts_etl_phase21_spark.operators.sampling import (
        token_budget_select,
    )
    n_budget = token_budget_select(
        docs.withColumn("n_chars", F.length("text")),
        "doc_id", "n_chars",
        ta.whitespace_token_count(F.col("text")),
        budget=n * DOC_TOKENS // 10, rank_span=8).count()
    stages["sp_budget"] = round(time.perf_counter() - t0, 1)

    # r07 s2: the Gopher gate family — one scan-side projection
    t0 = time.perf_counter()
    gp = ta.gopher_signals(F.col("text"))
    n_gopher = docs.select(gp["pass_gopher"].alias("p")) \
        .agg(F.sum("p")).collect()[0][0]
    stages["ta_gopher"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    scan = docs.select(
        "doc_id",
        ta.predict_language(F.col("text")).alias("predicted"),
        ta.quality_score(F.col("text")).alias("quality"),
        ta.whitespace_token_count(F.col("text")).alias("n_tokens"))
    scan_row = scan.agg(F.count(F.lit(1)), F.sum("quality"),
                        F.sum("n_tokens")).collect()[0]
    stages["ta_scan"] = round(time.perf_counter() - t0, 1)

    # DSIR importance weighting end-to-end at N docs: gram explode
    # (~2*DOC_TOKENS rows/doc) -> 4096-bucket count -> broadcast ratio
    # join-back -> per-doc score groupBy -> TakeOrdered top-1%
    t0 = time.perf_counter()
    from contacts_etl_phase21_spark.operators.importance import (
        dsir_select, importance_weights,
    )
    w = importance_weights(
        docs.withColumn("__t", F.col("lang") == "en"),
        "doc_id", "text", "__t")
    n_sel = dsir_select(w, "doc_id", max(1, n // 100)).count()
    stages["sp_dsir"] = round(time.perf_counter() - t0, 1)

    # r07 (judge task #7): same DSIR pipeline on the xxhash64
    # production tier — the per-gram md5 IS the md5 path's dominant
    # cost, so this stage's delta measures exactly that hash swap
    t0 = time.perf_counter()
    w_xx = importance_weights(
        docs.withColumn("__t", F.col("lang") == "en"),
        "doc_id", "text", "__t", hash_fn="xxhash64")
    n_sel_xx = dsir_select(w_xx, "doc_id", max(1, n // 100)).count()
    assert n_sel_xx == n_sel
    stages["sp_dsir_xx"] = round(time.perf_counter() - t0, 1)

    # sliding-window chunking: pure scan-side generator, ~2 rows/doc
    # at DOC_TOKENS=50 with size=32/stride=24
    t0 = time.perf_counter()
    from contacts_etl_phase21_spark.operators.sampling import chunk_overlap
    n_chunks = chunk_overlap(docs, "doc_id", "text",
                             size=32, stride=24).count()
    stages["sp_chunk"] = round(time.perf_counter() - t0, 1)

    # composed export: chunk (lang carried scan-side) -> two-pass
    # prefix-sum pack into 1024-token per-language budgets -> md5
    # shard — the sp_training_export shape at N docs
    t0 = time.perf_counter()
    from contacts_etl_phase21_spark.operators.sampling import (
        pack_sequences, shard_id,
    )
    ch = chunk_overlap(docs, "doc_id", "text", size=32, stride=24,
                       keep_cols=["lang"]) \
        .withColumn("uid", F.col("doc_id") * 1024 + F.col("chunk_id"))
    exported = pack_sequences(ch, "lang", "uid",
                              F.col("n_chunk_toks"), budget=1024) \
        .withColumn("shard", shard_id(F.col("uid"), 64))
    exp_row = exported.agg(
        F.count(F.lit(1)), F.max("pack_id"),
        F.countDistinct("shard")).collect()[0]
    stages["sp_export"] = round(time.perf_counter() - t0, 1)

    # sequence assembly: text rides the pack block-window via
    # carry_cols, one bounded (lang, pack) groupBy builds seq rows
    t0 = time.perf_counter()
    from contacts_etl_phase21_spark.operators.sampling import (
        materialize_packs,
    )
    seqs = materialize_packs(ch, "lang", "uid", "n_chunk_toks",
                             "chunk_text", budget=1024)
    seq_row = seqs.agg(F.count(F.lit(1)),
                       F.max("sum_tokens")).collect()[0]
    stages["sp_pack_rows"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ev = docs.filter(F.col("doc_id") % 100 == 0)
    train = docs.filter(F.col("doc_id") % 100 != 0)
    n_cont = contamination_flags(train, ev, "doc_id", "text", n=8) \
        .filter(F.col("contaminated") == 1).count()
    stages["decontam"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    emb = synthetic_embeddings(spark, n) \
        .repartition(spark.sparkContext.defaultParallelism).persist()
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding")
    n_ann = ann.lsh_topk(emb, queries, k=10, dim=DIM, bits=8).count()
    stages["ann_lsh"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    n_blas = ann.brute_force_topk_blas(emb, queries, k=10).count()
    stages["ann_brute_blas"] = round(time.perf_counter() - t0, 1)

    # the 100 TB layout end-to-end at N vectors: local-sample PQ/coarse
    # training, one-pass numpy encode (cell + residual codes + norm),
    # broadcast ADC scoring over probed cells, exact rerank of top-100
    t0 = time.perf_counter()
    n_ivfpq = ann.ivf_pq_topk(
        emb, queries, k=10, n_cells=32, n_probe=4, m=16, n_codes=64,
        coarse_quantizer="kmeans_local", pq_quantizer="kmeans_local",
        train_permille=max(1, min(1000, 50_000_000 // n)),
        rerank=100).count()
    stages["ann_ivfpq"] = round(time.perf_counter() - t0, 1)
    emb.unpersist()

    docs.unpersist()
    total = round(time.perf_counter() - t_all, 1)
    return {
        "metric": "corpus_ops_sec", "docs": n, "stages": stages,
        "counts": {"exact_groups": n_exact, "lsh_pairs": n_lsh,
                   "kept": n_kept,
                   "line_docs": int(lrow[0]),
                   "kept_lines": int(lrow[1]),
                   "kept_line_chars": int(lrow[2]),
                   "split_counts": split_counts,
                   "cross_pairs": n_cross,
                   "cross_direct_pairs": n_cross_direct,
                   "budget_selected": n_budget,
                   "gopher_pass": int(n_gopher or 0),
                   "dsir_selected": n_sel,
                   "chunks": n_chunks,
                   "exported_chunks": exp_row[0],
                   "max_pack_id": exp_row[1],
                   "export_shards": exp_row[2],
                   "seq_rows": seq_row[0],
                   "max_seq_tokens": seq_row[1],
                   "contaminated": n_cont,
                   "ann_rows": n_ann, "ann_blas_rows": n_blas,
                   "ann_ivfpq_rows": n_ivfpq,
                   "scanned": scan_row[0]},
        "value": total, "unit": "sec",
    }


def main() -> None:
    ns = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("corpus-ops-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(run_once(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
