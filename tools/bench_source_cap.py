"""Per-source quota (cap_per_source) skew probe.

Adversarial shape: ONE source holds half the corpus (the hot-domain
crawl reality), the rest spreads over 10k cold sources. The naive plan
(one row_number window partitioned by source) funnels the hot source's
ENTIRE row set through a single task; cap_per_source bypasses under-cap
sources, hash-prefilters the hot source to ~1.5·cap survivors, and
ranks only those — so its hot-source window task is bounded by the cap,
not the domain size.

Both plans are run end-to-end and their kept-row COUNTS compared (the
operator's exactness vs the naive window is set-equality-pinned in
tests/test_llm_ops.py at small N — here the corpus is generated
declaratively and both paths must agree on every source's kept count).

Measurement honesty (first run's finding): Spark's WindowGroupLimit
already rewrites `filter(row_number() <= k)` into a MAP-SIDE partial
top-k before the exchange, so the naive window's hot-source reducer
receives cap × n_map_tasks rows — not the domain's full row set. On
local[32] with 32 map tasks that residual is tiny and the naive plan
wins on plan simplicity. The differentiator appears at cluster map-task
counts: the probe therefore repartitions the corpus to N_MAP_TASKS
(default 2048, modelling a wide cluster's scan) — naive then funnels
cap × 2048 = 2M payload rows into the hot source's single reducer while
the bounded plan still ships ~1.5·cap. Both plans are asserted to carry
WindowGroupLimit (the bounded plan's final window gets it too).

Usage: python tools/bench_source_cap.py [N ...]   (default: 1e6 1e7)
Prints one JSON line per N.
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
from pyspark.sql import SparkSession, Window  # noqa: E402

from contacts_etl_phase21_spark.operators.sampling import (  # noqa: E402
    _md5_order, cap_per_source,
)
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402

CAP = 1000
N_COLD = 10_000
N_MAP_TASKS = 2048


def corpus(spark: SparkSession, n: int):
    """(id, source, text): ids with id%2==0 all land in source 'hot';
    odd ids spread uniformly over N_COLD cold sources (~n/2/10k rows
    each — under cap at n <= 2·cap·N_COLD = 2e10, so only 'hot' is
    over). Rows carry a ~200-byte payload: the quota operator's scale
    claim is about what SHIPS — the naive window shuffles every
    payload into per-source sort tasks (the hot source's n/2 rows into
    ONE task), the bounded plan shuffles only ~1.5·cap survivor
    payloads and lets the under-cap majority pass through scan-side."""
    return spark.range(0, n, 1, N_MAP_TASKS).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("src"),
                            (F.col("id") % N_COLD).cast("string")))
        .alias("source"),
        F.repeat(F.md5(F.col("id").cast("string")), 6).alias("text"))


def run_once(spark: SparkSession, n: int) -> dict:
    df = corpus(spark, n)

    w = Window.partitionBy("source").orderBy(_md5_order(F.col("id")),
                                             "id")
    naive = (df.withColumn("__r", F.row_number().over(w))
             .filter(F.col("__r") <= CAP))
    plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, \
        "expected Spark's rank-limit pushdown in the naive plan"

    t0 = time.perf_counter()
    n_naive = naive.count()
    t_naive = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    capped = cap_per_source(df, "id", "source", cap=CAP)
    n_cap = capped.count()
    t_cap = round(time.perf_counter() - t0, 1)

    per_source_equal = (
        naive.groupBy("source").count()
        .join(capped.groupBy("source").count()
              .withColumnRenamed("count", "c2"), "source", "full_outer")
        .filter((F.col("count") != F.col("c2"))
                | F.col("count").isNull() | F.col("c2").isNull())
        .count() == 0)

    return {
        "metric": "source_cap_sec", "rows": n, "cap": CAP,
        "kept_naive": n_naive, "kept_bounded": n_cap,
        "per_source_counts_equal": per_source_equal,
        "naive_window_sec": t_naive, "bounded_sec": t_cap,
        "unit": "sec",
    }


def main() -> None:
    ns = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark(app_name="bench-source-cap")
    spark.sparkContext.setLogLevel("WARN")
    run_once(spark, 100_000)  # JIT/codegen warm-up, both plans
    for n in ns:
        print(json.dumps(run_once(spark, n)), flush=True)


if __name__ == "__main__":
    main()
