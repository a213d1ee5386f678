"""Benchmark decontamination — flag training documents that share
token n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (n-gram overlap decontamination
as popularized by GPT-3/PaLM data cards): any train document containing
an n-gram that also appears in an eval document is flagged (and
typically dropped or span-redacted) so benchmark numbers aren't inflated
by memorized test data.

Scale shape (the whole point): the EVAL side is tiny (benchmarks are
thousands of documents; the corpus is 100 TB). Eval n-grams are
deduplicated and BROADCAST; the corpus-side join is then a broadcast
hash join evaluated inside the corpus scan — the corpus is never
shuffled. Per-doc hit counts partial-aggregate map-side; the only
shuffle is |flagged-ish docs| × 1 row.

N-grams are hashed numerically (token-hash windows, same trick as
dedup.with_hashed_shingles): no n-gram strings are materialized on the
corpus side. Counts equal string-n-gram counts modulo 64-bit collisions
(odds ≪ 1e-6 at corpus scale), the same documented equivalence the
MinHash tier uses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

from contacts_etl_phase21_spark.operators.dedup import with_hashed_shingles


def eval_ngram_set(eval_df: DataFrame, id_col: str, text_col: str,
                   n: int = 8) -> DataFrame:
    """Distinct hashed token n-grams of the eval set → (g: long).

    Small by construction (|eval docs| × doc length); the caller
    broadcasts it against the corpus.

    The shingle frame is persisted (r12): without the barrier,
    Catalyst's InferFiltersFromGenerate derives `size(sh_h) > 0` from
    the explode and pushes it below the widen exchange — the ENTIRE
    tokenize+hash chain then re-evaluates per row as a Filter
    predicate inside the 1-task scan stage (profiled: 1.8s
    single-threaded on the eval side of st_curate_ingest), and again
    in the projection. The persist computes the chain once, post-
    widen, in parallel; the inferred filter stays above the cache.
    Caller releases via release_cached (handles carried)."""
    from contacts_etl_phase21_spark.operators.dedup import _carry_cached

    sh = with_hashed_shingles(eval_df, id_col, text_col, n).persist()
    return _carry_cached(
        sh.select(F.explode("sh_h").alias("g")).distinct(), [sh])


def contamination_flags(train: DataFrame, eval_df: DataFrame,
                        id_col: str, text_col: str,
                        n: int = 8) -> DataFrame:
    """One row per train doc: (doc_id, n_hits, contaminated).

    n_hits = number of the doc's DISTINCT n-grams that appear anywhere
    in the eval set; contaminated = 1 iff n_hits > 0. Downstream:
    `.filter("contaminated = 0")` is the decontaminated corpus (or
    feed n_hits into a span-redaction pass).

    Docs shorter than n tokens contribute one clamped window (all their
    tokens) — matching dedup.with_hashed_shingles semantics.
    """
    ev = broadcast(eval_ngram_set(eval_df, id_col, text_col, n))
    # Materialize (doc, sh_h) BEFORE the explode: fused into one span,
    # Generate re-evaluates its inlined generator expression per
    # OUTPUT row, so the whole interpreted window-hash chain would run
    # ~|n-grams-per-doc| times per document — measured 169s vs 4s at
    # 10^6 docs. Same bounded-persist rationale as the MinHash tier
    # (one LRU cache entry per distinct input plan).
    tr = with_hashed_shingles(train, id_col, text_col, n).persist()
    hits = (tr.select("doc", F.explode("sh_h").alias("g"))
            .join(ev, "g")
            .groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    # hits holds CONTAMINATED docs only — in a decontamination setting
    # a small fraction of the corpus — so the flag join-back is also a
    # broadcast: the corpus is never shuffled anywhere in this
    # operator. (If contamination were somehow corpus-scale, drop the
    # hint and this becomes one shuffle on id.)
    return (train.select(F.col(id_col).alias("doc"))
            .join(broadcast(hits), "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.when(F.coalesce("n_hits", F.lit(0)) > 0, 1)
                    .otherwise(0).cast("int").alias("contaminated")))


def contamination_by_eval(train: DataFrame, eval_df: DataFrame,
                          id_col: str, text_col: str,
                          n: int = 8) -> DataFrame:
    """The INVERSE report of contamination_flags: one row per EVAL doc
    — (eval_id, n_train_docs, n_shared_grams) — "which benchmark items
    are how badly leaked into the corpus", the eval-integrity view a
    benchmark owner needs (flags tell you what to drop; this tells you
    which eval numbers to distrust).

    Scale shape mirrors contamination_flags: the (eval_id, gram) frame
    is tiny and BROADCAST, so the corpus-side gram join runs inside
    the scan; only the |hit pairs| rows (corpus-scale only if the
    corpus is mostly leaked) reach the per-eval aggregate, and the
    join back to all eval docs (for honest zero rows) broadcasts too.
    The corpus is never shuffled. Caller releases the shingle cache
    via dedup.release_cached (the r07 lifecycle contract).
    """
    from contacts_etl_phase21_spark.operators.dedup import _carry_cached

    # eval shingles persisted (r12): same InferFiltersFromGenerate
    # barrier as eval_ngram_set — without it the tokenize+hash chain
    # re-evaluates as a pushed-down size() filter in the 1-task scan
    ev_sh = with_hashed_shingles(eval_df, id_col, text_col, n).persist()
    ev = broadcast(
        ev_sh
        .select(F.col("doc").alias("eval_id"), F.explode("sh_h").alias("g")))
    tr = with_hashed_shingles(train, id_col, text_col, n).persist()
    hit_pairs = (tr.select(F.col("doc").alias("train_id"),
                           F.explode("sh_h").alias("g"))
                 .join(ev, "g"))
    rep = hit_pairs.groupBy("eval_id").agg(
        F.countDistinct("train_id").alias("n_train_docs"),
        F.countDistinct("g").alias("n_shared_grams"))
    out = (eval_df.select(F.col(id_col).alias("eval_id"))
           .join(broadcast(rep), "eval_id", "left")
           .select("eval_id",
                   F.coalesce("n_train_docs", F.lit(0)).cast("bigint")
                   .alias("n_train_docs"),
                   F.coalesce("n_shared_grams", F.lit(0)).cast("bigint")
                   .alias("n_shared_grams")))
    return _carry_cached(out, [tr, ev_sh])


def broadcast_eval_ngrams(eval_df: DataFrame, id_col: str,
                          text_col: str, n: int = 8):
    """The eval n-gram hash set as a Spark BROADCAST VARIABLE — the
    stream-safe form of eval_ngram_set: a streaming decontamination
    stage must be row-local (the batch operator's explode → join →
    groupBy(doc) is a stateful aggregation under streaming semantics),
    so the bounded set ships once per executor and membership checks
    run inside mapInPandas. Arrow-collected (toPandas, not py4j —
    the r06 collect-cost lesson)."""
    from contacts_etl_phase21_spark.operators.dedup import release_cached

    ev = eval_ngram_set(eval_df, id_col, text_col, n)
    vals = frozenset(int(v) for v in ev.toPandas()["g"])
    release_cached(ev)  # consumed eagerly — free the shingle cache now
    return eval_df.sparkSession.sparkContext.broadcast(vals)


def with_rowlocal_contamination(docs_with_sh: DataFrame, eval_bc
                                ) -> DataFrame:
    """Append (n_hits, contaminated) to a frame carrying `sh_h`
    (hashed shingles, dedup.with_hashed_shingles) ROW-LOCALLY via
    mapInPandas + the broadcast gram set — stateless, so it is legal
    mid-stream. Value-identical to contamination_flags: n_hits counts
    the doc's DISTINCT n-grams present in the eval set (sh_h already
    holds distinct hashes)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(list(docs_with_sh.schema.fields)
                        + [StructField("n_hits", IntegerType()),
                           StructField("contaminated", IntegerType())])

    def fn(batches):
        ev = eval_bc.value
        for pdf in batches:
            hits = pdf["sh_h"].map(
                lambda arr: sum(1 for g in arr if g in ev))
            pdf["n_hits"] = hits.astype("int32")
            pdf["contaminated"] = (hits > 0).astype("int32")
            yield pdf

    return docs_with_sh.mapInPandas(fn, schema)
