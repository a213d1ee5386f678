"""Time one registry query in isolation (guide §1.4).

Usage: python tools/time_query.py NAME [NAME ...] [--mode noop|count]
       [--runs N] [--sf DIR] [--explain]

- noop mode: df.write.format("noop") — computes every column of every
  row, the methodology-correct measure for projection-shaped queries
  where count() would prune the computed columns.
- count mode: the bench.py historical action (kept for comparability).
Prints per-run seconds + min/median; labels jobs for the UI.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    mode, runs, sf_dir, explain = "noop", 3, "/root/testdata/sf0.1", False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--mode":
            mode = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--explain":
            explain = True; i += 1
        else:
            names.append(a); i += 1

    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + parquet footers once, as bench.py does
    QUERIES[names[0]].fn(spark, sf_dir).limit(1).collect()
    for name in names:
        secs = []
        for r in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}[{mode}] run{r}")
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            secs.append(round(time.perf_counter() - t0, 3))
        print(f"{name} [{mode}]: runs={secs} min={min(secs)} "
              f"median={statistics.median(secs)}")
        if explain:
            print(QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution()
                  .explainString(
                      spark._jvm.org.apache.spark.sql.execution.ExplainMode
                      .fromString("formatted")))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
