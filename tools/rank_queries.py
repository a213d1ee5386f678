"""Rank every registry query by isolated noop-sink cost (guide §1.4).

Usage: python tools/rank_queries.py [--sf DIR] [--runs N] [--out FILE]

Times each of the 147 registry queries with df.write.format("noop")
(computes every column of every row), one warm-up action first, then
N timed runs; writes a JSON {name: {"runs": [...], "median": s}} and
prints a descending-median table. Used to pick the non-headline
optimization targets for the round.
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

from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir, runs, out = "/root/testdata/sf0.1", 2, "/tmp/rank_queries.json"
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--out":
            out = args[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    spark = get_spark("rank-queries")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in sorted(QUERIES):
        secs = []
        try:
            for r in range(runs + 1):  # run 0 = warm-up, not recorded
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"rank:{name} run{r}")
                t0 = time.perf_counter()
                df = QUERIES[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                if r > 0:
                    secs.append(dt)
        except Exception as e:  # noqa: BLE001 — record and keep ranking
            results[name] = {"error": str(e)[:300]}
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)
            continue
        results[name] = {"runs": secs,
                         "median": round(statistics.median(secs), 3)}
        print(f"{name}: median={results[name]['median']} runs={secs}",
              flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print("\n=== descending by median ===")
    ranked = sorted((v["median"], k) for k, v in results.items()
                    if "median" in v)[::-1]
    for m, k in ranked:
        print(f"{m:8.3f}  {k}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
