"""Interleaved A/B for the r11 factored-cosine change (guide §1):
OLD form (inline 3-fold cosine_col per pair) vs NEW form (per-row
norms + cosine_from_norms) alternating in ONE session, noop sink,
so ambient drift cancels. The OLD builders below reproduce the
pre-change plans verbatim (cosine_col inline, no keep_norm).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql.functions import broadcast  # noqa: E402

from contacts_etl_phase21_spark.io import load, widen  # noqa: E402
from contacts_etl_phase21_spark.operators import (  # noqa: E402
    similarity_search as ann,
)
from contacts_etl_phase21_spark.operators.similarity_search import (  # noqa: E402
    _centroid_literal, _collect_first_centroids, cosine_col,
)
from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402
from contacts_etl_phase21_spark.plans.registry import scale_e6  # noqa: E402
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def old_assign_cells(df, cent_rows, n, vec_col):
    """Pre-r11 assign_cells: inline cosine_col per (row, centroid)."""
    cents = _centroid_literal(cent_rows)

    def _ns(c):
        cs = cosine_col(F.col(vec_col), c["c_vec"])
        return F.coalesce(-cs, F.lit(float("inf")))

    ranked = F.slice(
        F.sort_array(F.transform(
            cents, lambda c: F.struct(_ns(c).alias("ns"),
                                      c["cell"].alias("cell")))), 1, n)
    return df.withColumn(
        "cell", F.explode(F.transform(ranked, lambda s: s["cell"])))


def old_knn_graph(spark):
    emb = load(spark, SF, "embeddings")
    q = broadcast(emb.select(F.col("vec_id").alias("query_id"),
                             F.col("embedding").alias("q_vec")))
    scored = widen(emb.select("vec_id", "embedding")).crossJoin(q) \
        .filter(F.col("vec_id") != F.col("query_id")) \
        .select("query_id", "vec_id",
                F.round(cosine_col(F.col("embedding"), F.col("q_vec")), 6)
                .alias("cosine")).filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 5)
           .select("query_id", "rank", "vec_id", "cosine")
           .withColumn("rank", F.col("rank").cast("int")))
    return scale_e6(out, "cosine")


def old_knn_graph_blocked(spark):
    emb = load(spark, SF, "embeddings")
    cent_rows = _collect_first_centroids(emb, 8, "vec_id", "embedding")
    members = old_assign_cells(widen(emb.select("vec_id", "embedding")),
                               cent_rows, 1, "embedding")
    probes = old_assign_cells(
        widen(emb.select(F.col("vec_id").alias("query_id"),
                         F.col("embedding").alias("q_vec"))),
        cent_rows, 8, "q_vec")
    scored = members.join(probes, "cell") \
        .filter(F.col("vec_id") != F.col("query_id")) \
        .select("query_id", "vec_id",
                F.round(cosine_col(F.col("embedding"), F.col("q_vec")), 6)
                .alias("cosine")).filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 5)
           .select("query_id", "rank", "vec_id", "cosine")
           .withColumn("rank", F.col("rank").cast("int")))
    return scale_e6(out, "cosine")


def old_hard_negatives(spark):
    emb = load(spark, SF, "embeddings")
    cent_rows = _collect_first_centroids(emb, 8, "vec_id", "embedding")
    members = old_assign_cells(
        widen(emb.select("vec_id", "embedding", "label")),
        cent_rows, 1, "embedding")
    probes = old_assign_cells(
        widen(emb.select(F.col("vec_id").alias("query_id"),
                         F.col("embedding").alias("q_vec"),
                         F.col("label").alias("q_label"))),
        cent_rows, 8, "q_vec")
    scored = members.join(probes, "cell") \
        .filter((F.col("vec_id") != F.col("query_id"))
                & (F.col("label") != F.col("q_label"))) \
        .select("query_id", "vec_id", "label",
                F.round(cosine_col(F.col("embedding"), F.col("q_vec")), 6)
                .alias("cosine")).filter(F.col("cosine").isNotNull()) \
        .filter(F.col("cosine") < 0.98)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    out = (scored.withColumn("rank",
                             F.row_number().over(w).cast("int"))
           .filter(F.col("rank") <= 5)
           .select("query_id", "rank", "vec_id", "label", "cosine"))
    return scale_e6(out, "cosine")


def old_ivf_topk(spark):
    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    cent_rows = _collect_first_centroids(emb, 16, "vec_id", "embedding")
    c = old_assign_cells(widen(emb.select("vec_id", "embedding")),
                         cent_rows, 1, "embedding")
    q = broadcast(
        old_assign_cells(queries.select("query_id", F.col("embedding")),
                         cent_rows, 4, "embedding")
        .select("query_id", F.col("embedding").alias("q_vec"), "cell"))
    scored = c.join(q, "cell").select(
        "query_id", "vec_id",
        F.round(cosine_col(F.col("embedding"), F.col("q_vec")), 6)
        .alias("cosine")).filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 10)
           .select("query_id", "rank", "vec_id", "cosine"))
    return scale_e6(out, "cosine")


PAIRS = [
    ("ann_knn_graph", old_knn_graph),
    ("ann_knn_graph_blocked", old_knn_graph_blocked),
    ("ann_hard_negatives", old_hard_negatives),
    ("ann_ivf_topk", old_ivf_topk),
]


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-cosine-factor")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[str, list[float]]] = {}
    for name, old_fn in PAIRS:
        results[name] = {"old": [], "new": []}
        # warm-up both forms once
        for tag, mk in (("old", lambda: old_fn(spark)),
                        ("new", lambda: QUERIES[name].fn(spark, SF))):
            mk().write.format("noop").mode("overwrite").save()
        for r in range(rounds):
            for tag, mk in (("old", lambda: old_fn(spark)),
                            ("new", lambda: QUERIES[name].fn(spark, SF))):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{tag} r{r}")
                t0 = time.perf_counter()
                mk().write.format("noop").mode("overwrite").save()
                results[name][tag].append(
                    round(time.perf_counter() - t0, 3))
        o, n = results[name]["old"], results[name]["new"]
        print(f"{name}: old median={statistics.median(o):.3f} {o} | "
              f"new median={statistics.median(n):.3f} {n}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
