"""ER pipeline scale bench (BASELINE.md protocol item 2).

Generates N synthetic CONTACT_SCHEMA records driver-side from
spark.range (no testdata dependency, any N), then times the
consolidate stages separately:

    normalize  (N1-N5 cascade)
    cluster    (E1-E5: prepare -> blocked pairs -> score -> gates -> CC)
    merge      (E6-E9 survivorship)
    lineage    (E10 join-back)

Block-key cardinality scales linearly with the corpus (surname pool =
records/33) so mean block size stays constant as N grows — the shape
real surname distributions have. That keeps the pair count linear in N
(the documented O(Sum |block|^2) law: constant pools would grow pairs
quadratically — measured 441s vs 82s at 200k in round 1).

Usage: python tools/bench_pipeline.py [N ...]   (default: 1e5 1e6)
Prints one JSON line per N:
  {"metric": "er_pipeline_sec", "records": N, "contacts": M,
   "stages": {...}, "value": total, "unit": "sec"}
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# The 10^7 protocol caches the prepared frame; the 8g test default
# GC-thrashes there (GCLocker retry warnings, ~3x wall-clock). Use a
# scale-appropriate heap unless the caller overrides.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from contacts_etl_phase21_spark.operators.entity_resolution import (  # noqa: E402
    build_lineage, cluster_records, merge_clusters, prepare_for_matching,
)
from contacts_etl_phase21_spark.operators.normalize import (  # noqa: E402
    normalize_records,
)
from contacts_etl_phase21_spark.pipeline.config import (  # noqa: E402
    PipelineConfig,
)
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402


def synthetic_records(spark: SparkSession, n_records: int) -> DataFrame:
    """Deterministic records: 3 gmail + 1 linkedin per 4 records; the
    linkedin row duplicates gmail row 3k's email and must merge with it.
    Surname pool scales with N -> constant block sizes."""
    n_customers = max(1, (n_records * 3) // 4)
    first_pool = 997
    last_pool = max(11, n_customers // 25)
    base = spark.range(n_customers).select(F.col("id").alias("k"))

    # first name keyed on k DIV last_pool: members of one surname block
    # (k ≡ c mod last_pool) then carry DISTINCT first names, so the only
    # intended merges are the email-sharing linkedin+gmail pairs and the
    # expected contact count is exactly n_customers. The index is
    # scrambled (×7919 mod 997, coprime -> still distinct per block):
    # consecutive indices would make ~40% of in-block pairs lev<=1
    # near-misses ("First604" vs "First605"), which real given-name
    # distributions do not remotely exhibit.
    first = F.concat(F.lit("First"),
                     (((F.col("k") / last_pool).cast("long") * 7919 + 13)
                      % first_pool).cast("string"))
    last = F.concat(F.lit("Surname"), (F.col("k") % last_pool).cast("string"))
    email = F.lower(F.concat(first, F.lit("."), last, F.lit("."),
                             F.col("k").cast("string"),
                             F.lit("@example.com")))

    def record(source: str) -> DataFrame:
        return base.select(
            F.lit(source).alias("source"),
            F.col("k").cast("string").alias("source_row_id"),
            F.lit(None).cast("string").alias("source_timestamp"),
            F.concat(first, F.lit(" "), last).alias("full_name"),
            F.lit("").alias("prefix"), first.alias("first_name"),
            F.lit("").alias("middle_name"), last.alias("last_name"),
            F.lit("").alias("maiden_name"), F.lit("").alias("suffix"),
            F.lit("").alias("suffix_professional"),
            F.lit("").alias("nickname"),
            F.concat(F.lit("Company"),
                     (F.col("k") % 50).cast("string")).alias("company"),
            F.lit("").alias("title"), F.lit("").alias("department"),
            (F.when(F.lit(source == "linkedin"),
                    F.concat(F.lit("https://linkedin.com/in/"), email))
             .otherwise(F.lit(""))).alias("linkedin_url"),
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

    gmail = record("gmail")
    linkedin = record("linkedin").filter(F.col("k") % 3 == 0)
    return gmail.unionByName(linkedin).drop("k")


def run_once(spark: SparkSession, n_records: int) -> dict:
    cfg = PipelineConfig()
    stages: dict[str, float] = {}
    t_all = time.perf_counter()

    records = synthetic_records(spark, n_records)

    t0 = time.perf_counter()
    normalized = normalize_records(records, cfg.normalization).cache()
    n_norm = normalized.count()
    stages["normalize"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    clustered = cluster_records(
        prepare_for_matching(normalized), cfg.dedupe).cache()
    clustered.count()
    stages["cluster"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    contacts = merge_clusters(clustered, cfg.dedupe).cache()
    n_contacts = contacts.count()
    stages["merge"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    n_lineage = build_lineage(clustered, contacts, records).count()
    stages["lineage"] = round(time.perf_counter() - t0, 1)

    total = round(time.perf_counter() - t_all, 1)
    for df in (normalized, clustered, contacts):
        df.unpersist()
    return {"metric": "er_pipeline_sec", "records": n_norm,
            "contacts": n_contacts, "lineage_rows": n_lineage,
            "stages": stages, "value": total, "unit": "sec"}


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("contacts-etl-phase21-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_once(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
