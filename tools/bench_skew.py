"""Hot-block skew bench for the ER pair join (BASELINE.md protocol).

Builds an N-record corpus where ONE surname block holds n_hot records
— the adversarial shape for blocked pair generation: the block is
INPUT-small (n_hot rows through the shuffle) but OUTPUT-quadratic
(n_hot^2/2 pairs), so AQE's skew-join splitting (which acts on
shuffle-input partition size) cannot spread it; one reducer task
generates and gates every hot pair. Measures the full
pairs -> gates -> edges path three ways:

    plain         candidate_pairs (AQE left to its own devices)
    salted_all    candidate_pairs_salted(n_salt) — whole corpus salted
    salted_hot    hot_block_keys -> hot-keys-only salting (100 TB shape)

and records wall-clock + edge counts (sets must agree; the full
equivalence is pinned in tests/test_scale_patterns.py) + whether the
executed plan shows AQE skew splits.

Usage: python tools/bench_skew.py [N] [n_hot] [n_salt]
       (defaults: 1e6 5000 8)
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

from contacts_etl_phase21_spark.operators.entity_resolution import (  # noqa: E402
    accepted_edges_fast, candidate_pairs, candidate_pairs_salted,
    hot_block_keys, prepare_for_matching,
)
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402


def skewed_records(spark: SparkSession, n_records: int,
                   n_hot: int) -> DataFrame:
    """First n_hot records share surname 'Hotname'; the rest get unique
    surnames (singleton blocks). First names are scrambled-distinct
    (x7919 mod 997) like bench_pipeline's generator, so same-name
    near-miss pairs don't dominate gating. Every 37th hot record lands
    in one of 11 shared-email groups -> real merge edges inside the
    hot block."""
    base = spark.range(n_records)
    hot = F.col("id") < n_hot
    first = F.concat(F.lit("First"),
                     ((F.col("id") * 7919 + 13) % 997).cast("string"))
    last = F.when(hot, F.lit("Hotname")) \
        .otherwise(F.concat(F.lit("Unique"), F.col("id").cast("string")))
    email = F.when(hot & (F.col("id") % 37 == 0),
                   F.concat(F.lit("dup"), (F.col("id") % 11).cast("string"),
                            F.lit("@hot.example"))) \
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string"),
                            F.lit("@x.example")))
    return base.select(
        F.lit("gmail").alias("source"),
        F.col("id").cast("string").alias("source_row_id"),
        F.lit(None).cast("string").alias("source_timestamp"),
        F.concat(first, F.lit(" "), last).alias("full_name"),
        F.lit("").alias("prefix"), first.alias("first_name"),
        F.lit("").alias("middle_name"), last.alias("last_name"),
        F.lit("").alias("maiden_name"), F.lit("").alias("suffix"),
        F.lit("").alias("suffix_professional"), F.lit("").alias("nickname"),
        F.lit("").alias("company"), F.lit("").alias("title"),
        F.lit("").alias("department"), F.lit("").alias("linkedin_url"),
        F.lit("").alias("notes"),
        F.array(F.struct(email.alias("value"),
                         F.lit("home").alias("label"))).alias("emails"),
        F.array().cast(
            "array<struct<value:string,label:string,extension:string>>")
        .alias("phones"),
        F.array().cast(
            "array<struct<po_box:string,extended:string,street:string,"
            "city:string,state:string,postal_code:string,country:string,"
            "label:string>>").alias("addresses"),
    )


def _run(label: str, pairs_df: DataFrame) -> dict:
    t0 = time.perf_counter()
    edges = accepted_edges_fast(pairs_df)
    n_edges = edges.count()
    dt = time.perf_counter() - t0
    plan = edges._jdf.queryExecution().executedPlan().toString()
    return {"path": label, "sec": round(dt, 1), "edges": n_edges,
            "aqe_skew_split": "skew=true" in plan}


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    n_hot = int(float(sys.argv[2])) if len(sys.argv) > 2 else 5_000
    n_salt = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("contacts-etl-phase21-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    prepared = prepare_for_matching(
        skewed_records(spark, n, n_hot)).persist()
    prepared.count()

    t0 = time.perf_counter()
    hot = hot_block_keys(prepared, min_block_size=1000)
    detect_sec = round(time.perf_counter() - t0, 1)

    results = [
        _run("plain", candidate_pairs(prepared)),
        _run("salted_all", candidate_pairs_salted(prepared, n_salt)),
        _run("salted_hot", candidate_pairs_salted(prepared, n_salt,
                                                  hot_keys=hot)),
    ]
    edge_counts = {r["edges"] for r in results}
    print(json.dumps({
        "metric": "er_hot_block_skew_sec",
        "records": n, "hot_block": n_hot, "n_salt": n_salt,
        "hot_keys_detected": len(hot), "detect_sec": detect_sec,
        "paths": results,
        "edge_counts_agree": len(edge_counts) == 1,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
