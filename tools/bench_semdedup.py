"""SemDeDup production-cell-count probe (r07, judge r06 task #5).

The registered dd_semantic_near_dups runs at a TOY n_cells=8 (its job
is oracle parity); the docstring prescribes cells ∝ corpus with
per-cell co-location but round 6 shipped no measurement. This probe
runs the production BLAS tier (dedup.semantic_near_duplicates_blas:
broadcast-kernel GEMM cell assignment + per-cell blocked-matmul upper
triangle) at 10⁶ clustered vectors with ~10³ kmeans cells and answers
the three questions that matter at 100 TB:

1. Does the Σ|cell|² bound hold wall-clock? (pair work ≈ n²/cells when
   kmeans balances — 10¹²/1024 ≈ 10⁹ scored pairs, all inside BLAS)
2. What recall does the within-cell restriction give up on PLANTED
   twins (cosine ≈ 0.99 pairs the corpus provably contains), and how
   much does n_assign=2 multi-probe buy back? A twin that straddles a
   cell boundary is SemDeDup's known miss mode (Abbas et al. 2023).
3. At a scale where the exact all-pairs tier is still computable
   (10⁵), what is recall vs ALL true pairs, not just planted ones?

Geometry: clustered_embeddings with sigma=1.0 — at sigma 0.35 (the ANN
probes' setting) within-cluster background cosine sits at
1/(1+σ²) ≈ 0.89 ± 0.06, so NO threshold separates twins (0.99) from
the n²/clusters background and the output explodes; at sigma 1.0 the
background drops to 0.5 ± 0.11 and a 0.95 threshold keeps output
~planted-sized. Twins: vec n+i = vec i + 0.2·z (hash-Gauss noise,
cosine ≈ 0.99) for i % (n//1000) == 7 → 1000 planted pairs at any n.

Usage: python tools/bench_semdedup.py [N ...]    (default: 1e5 1e6)
One JSON line per N.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from contacts_etl_phase21_spark.operators import dedup as dd  # noqa: E402
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402
from tools.bench_corpus import DIM, _gauss, clustered_embeddings  # noqa: E402

SIGMA = 1.0
TWIN_EPS = 0.2
THRESHOLD = 0.95


def corpus_with_twins(spark: SparkSession, n: int) -> DataFrame:
    """n clustered base vectors + 1000 planted twins (ids n+i)."""
    base = clustered_embeddings(spark, n, n_clusters=32, sigma=SIGMA) \
        .select("vec_id", "embedding")
    step = max(1, n // 1000)
    twins = (base.filter(F.col("vec_id") % step == 7)
             .select((F.col("vec_id") + n).alias("vec_id"),
                     F.transform(
                         F.col("embedding"),
                         lambda x, j: (x + F.lit(TWIN_EPS)
                                       * _gauss("tw", F.col("vec_id"), j))
                         .cast("float")).alias("embedding")))
    return base.unionByName(twins)


def planted_pairs(n: int) -> set[tuple[int, int]]:
    step = max(1, n // 1000)
    return {(i, n + i) for i in range(7, n, step) if i % step == 7}


def run_once(spark: SparkSession, n: int, n_cells: int,
             with_exact: bool) -> dict:
    out: dict = {"metric": "semdedup_probe", "n": n, "n_cells": n_cells,
                 "sigma": SIGMA, "threshold": THRESHOLD, "unit": "sec"}
    t0 = time.perf_counter()
    emb = corpus_with_twins(spark, n) \
        .repartition(spark.sparkContext.defaultParallelism).persist()
    n_total = emb.count()
    out["generate_sec"] = round(time.perf_counter() - t0, 1)
    assert n_total == n + len(planted_pairs(n))
    planted = planted_pairs(n)

    train_pm = max(1, min(1000, math.ceil(20_000_000 / n)))
    stages = {}
    for tag, n_assign in (("probe1", 1), ("probe2", 2)):
        t0 = time.perf_counter()
        pairs = {(r["vec_a"], r["vec_b"])
                 for r in dd.semantic_near_duplicates_blas(
                     emb, threshold=THRESHOLD, n_cells=n_cells,
                     n_assign=n_assign,
                     train_permille=train_pm).collect()}
        stages[tag] = {
            "sec": round(time.perf_counter() - t0, 1),
            "pairs_found": len(pairs),
            "planted_recall": round(
                len(pairs & planted) / len(planted), 4),
        }
        out[f"pairs_{tag}"] = pairs
    out["stages"] = stages
    out["train_permille"] = train_pm

    if with_exact:
        t0 = time.perf_counter()
        exact = {(r["vec_a"], r["vec_b"])
                 for r in dd.embedding_cosine_pairs(
                     emb, threshold=THRESHOLD,
                     n_chunks=max(8, n // 8_000)).collect()}
        stages["exact"] = {
            "sec": round(time.perf_counter() - t0, 1),
            "pairs_found": len(exact),
            "planted_recall": round(
                len(exact & planted) / len(planted), 4),
        }
        for tag in ("probe1", "probe2"):
            stages[tag]["recall_vs_exact"] = round(
                len(out[f"pairs_{tag}"] & exact) / len(exact), 4)
    for tag in ("probe1", "probe2"):
        del out[f"pairs_{tag}"]

    # r11 (judge r10 #8c): the greedy-MIS decision sweep's measured
    # ROUND COUNT on a real eps threshold over corpus data — the
    # documented bound is O(log n) w.h.p. on hash-distributed ids;
    # this records the real dependency depth next to it. Graph =
    # within-cell k=16 self-KNN (n_probe=1, the registered semdedup
    # graph shape) at the same cells.
    if os.environ.get("GREEDY") == "1":
        from contacts_etl_phase21_spark.operators import (
            similarity_search as ann,
        )

        t0 = time.perf_counter()
        graph = ann.knn_graph_ivf_blas(
            emb, 16, n_cells, 1, quantizer="kmeans_local",
            train_permille=train_pm).persist()
        graph.count()
        g_sec = round(time.perf_counter() - t0, 1)
        gstats: dict = {}
        t0 = time.perf_counter()
        dec = dd.semdedup_prune_greedy(
            graph, THRESHOLD, vertices=emb.select("vec_id"),
            max_iter=100, stats=gstats)
        kept = dec.filter("keep").count()
        out["greedy"] = {
            "graph_build_sec": g_sec,
            "sweep_sec": round(time.perf_counter() - t0, 1),
            "rounds": gstats["rounds"],
            "kept": kept,
        }
        graph.unpersist()
    emb.unpersist()
    return out


def main() -> None:
    ns = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        # cells ∝ corpus: ~n/1000 members per cell target, capped for
        # the small exact-comparable run
        n_cells = max(128, n // 1000)
        print(json.dumps(run_once(spark, n, n_cells,
                                  with_exact=(n <= 200_000))),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
