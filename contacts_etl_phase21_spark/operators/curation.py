"""End-to-end corpus curation — the composed pipeline a training-data
run actually executes, as ONE declarative DataFrame program:

    quality filter → benchmark decontamination → near-dup keep-first
    dedup → stratified downsampling → shard assignment

Each stage is an existing operator (text_analysis.quality_score,
decontamination.contamination_flags, dedup.dedup_keep_first,
sampling.stratified_sample / assign_shards); this module fixes their
composition ORDER — which matters: dedup runs on the quality-filtered,
decontaminated survivors (so a high-quality duplicate of a dropped doc
still dedups against other survivors only), and sampling runs LAST so
the kept fraction is measured on clean, unique documents.

Scale shape is inherited from the parts: the quality filter and the
sampling hash evaluate in the scan projection; decontamination is a
broadcast probe; the only corpus-scale shuffles are the LSH band join
and the components loop, both equi-joins on synthetic keys. Stages
never materialize intermediate corpora — Catalyst fuses the scan-side
filters into one pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.operators.decontamination import (
    contamination_flags,
)
from contacts_etl_phase21_spark.operators.dedup import dedup_keep_first
from contacts_etl_phase21_spark.operators.sampling import (
    assign_shards, stratified_sample,
)
from contacts_etl_phase21_spark.operators.text_analysis import quality_score


def curate_corpus(docs: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  strata_col: str = "lang",
                  min_quality: int = 90,
                  ngram: int = 8,
                  rates_permille: dict[str, int] | None = None,
                  default_permille: int = 1000,
                  n_shards: int = 8) -> DataFrame:
    """One row per SURVIVING document: (doc_id, lang, shard).

    Drop order: quality < min_quality → shares an `ngram`-gram with
    eval_docs → near-duplicate of a lower-id survivor → outside the
    per-stratum sample rate. Survivors get an md5 training shard.

    qual and clean are persisted (r11, guide §5): each is referenced
    from BOTH sides of its consuming join (clean = qual ⋈ flags(qual);
    kept = clean ⋈ dedup(clean)), and Spark does not share common
    subtrees across join sides — unpersisted, the quality-regex scan
    evaluated 4× and the decontamination explode+join 2× (measured
    16.7s → see OPTIMIZATION_r11.md). MEMORY_AND_DISK default spills
    gracefully at scale; the caller owns release via
    dedup.release_cached (the pair builders' lifecycle contract —
    handles carried on the result)."""
    from contacts_etl_phase21_spark.operators.dedup import _carry_cached

    qual = docs.filter(
        quality_score(F.col(text_col)) >= min_quality).persist()
    clean = (qual
             .join(contamination_flags(qual, eval_docs, id_col, text_col,
                                       n=ngram)
                   .filter(F.col("contaminated") == 0)
                   .select(id_col), id_col)).persist()
    # r12: materialize clean EAGERLY (one count fills the qual AND
    # clean caches in a single pass) BEFORE the dedup spine builds on
    # it. The spine's widen() must probe partitioning on a join-shaped
    # input with df.rdd, and under AQE that probe EXECUTES the
    # decontamination subtree just to learn the partition count —
    # profiled as ~3-6s of single-threaded javaToPython stages whose
    # results are thrown away. Probing a cache-backed frame is free,
    # and every downstream consumer reads the same materialization the
    # count paid for (still inside this one query invocation —
    # recomputed from parquet every run, nothing crosses runs).
    clean.count()
    dk = dedup_keep_first(clean, id_col, text_col)
    kept = (clean
            .join(dk.filter(F.col("kept") == 1)
                  .select(id_col), id_col))
    sampled = stratified_sample(
        kept.select(id_col, strata_col), id_col, strata_col,
        rates_permille or {}, default_permille=default_permille)
    out = assign_shards(sampled, id_col, n_shards).orderBy(id_col)
    return _carry_cached(
        out, [qual, clean,
              *getattr(dk, "_cached_intermediates", ())])
