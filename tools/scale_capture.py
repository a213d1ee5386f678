"""One-off bigger-SF scaling capture (r12, judge r11 #9).

The three flat headline rows (j3_broadcast_dim_join, ann_brute_topk,
dd_minhash_lsh_verified) are fixed-cost-bound at sf0.1, so wall-clock
cannot show whether their structure parallelizes. This tool derives an
~sf0.3 dataset from the read-only sf0.1 tables (3 id-offset copies,
join-key-consistent; document text gets a per-copy suffix token so the
near-dup structure doesn't collapse to exact duplicates) under /tmp,
then times the requested queries with the noop sink at the current
$SPARK_GRAFT_CPUS. Run twice (32 and 8 cores) and compare: a query
whose sf0.3 wall shrinks with cores has parallel structure even though
its sf0.1 wall is overhead-bound.

MEASUREMENT ONLY: the derived data has no DuckDB oracle and is never
written anywhere the bench or driver reads.

Usage: python tools/scale_capture.py [--out FILE] [--runs N] [q ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from contacts_etl_phase21_spark.io import TABLES  # noqa: E402
from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf03_derived"
COPIES = 3
OFF = 100_000_000  # far above every sf0.1 key

# id columns that must shift together so intra-copy joins still match
_SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}


def build(spark) -> None:
    import pyspark.sql.functions as F

    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        shifts = _SHIFT.get(t)
        if not shifts:  # tiny dimensions: copy as-is
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for k in range(COPIES):
            d = df
            for c in shifts:
                d = d.withColumn(c, F.col(c) + F.lit(k * OFF))
            if t == "documents" and k > 0:
                # keep near-dup structure: a distinct suffix token per
                # copy so copies don't exact-collapse with copy 0
                d = d.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" cp{k}tok")))
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"# built {t}", file=sys.stderr)


def main() -> int:
    args = sys.argv[1:]
    out, runs, names = "/tmp/scale_capture.json", 3, []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    names = names or ["j3_broadcast_dim_join", "ann_brute_topk",
                      "dd_minhash_lsh_verified"]
    spark = get_spark("scale-capture")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    cpus = spark.sparkContext.defaultParallelism
    res: dict = {"cpus": cpus, "copies": COPIES, "runs": runs}
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf0.3x", DST)):
        for name in names:
            QUERIES[name].fn(spark, sf_dir).limit(1).collect()  # warm
            secs = []
            for r in range(runs):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(
                    f"scale:{name}@{sf_label} run{r}")
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                secs.append(round(time.perf_counter() - t0, 3))
            res[f"{name}@{sf_label}"] = {
                "runs": secs, "median": round(statistics.median(secs), 3)}
            print(f"# {name}@{sf_label}: {secs}", file=sys.stderr)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
