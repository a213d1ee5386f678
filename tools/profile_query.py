"""Stage-level profile of one registry query via the event log.

Usage: python tools/profile_query.py NAME [--mode noop|count] [--sf DIR]
       [--runs N]

Runs the query with spark.eventLog enabled, then parses the event log:
per-stage wall-clock (submission→completion), task count, executor-run
vs fetch-wait vs GC time, shuffle bytes — the guide §7.1 breakdown
without the UI. Cold run and N-1 warm runs are profiled separately.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

EV_DIR = "/tmp/spark-events"


def main() -> int:
    args = sys.argv[1:]
    mode, sf_dir, runs = "count", "/root/testdata/sf0.1", 2
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--mode":
            mode = args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(a); i += 1
    os.makedirs(EV_DIR, exist_ok=True)

    from pyspark.sql import SparkSession

    from contacts_etl_phase21_spark.plans import QUERIES
    from contacts_etl_phase21_spark.session import default_parallelism

    cores = default_parallelism()
    spark = (SparkSession.builder.appName("profile-query")
             .master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", EV_DIR)
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    for name in names:
        for r in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            print(f"### {name} run{r}: "
                  f"{time.perf_counter() - t0:.3f}s wall")
    spark.stop()

    # parse the event log
    path = os.path.join(EV_DIR, app_id)
    stages = {}
    jobs = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                accums = {a["Name"]: a.get("Value")
                          for a in si.get("Accumulables", [])}
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "wall_ms": (comp - sub) if sub and comp else None,
                    "tasks": si["Number of Tasks"],
                    "run_ms": accums.get("internal.metrics.executorRunTime"),
                    "cpu_ms": (accums.get(
                        "internal.metrics.executorCpuTime", 0) or 0) // 1e6,
                    "gc_ms": accums.get("internal.metrics.jvmGCTime"),
                    "sh_read": accums.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0),
                    "sh_write": accums.get(
                        "internal.metrics.shuffle.write.bytesWritten", 0),
                    "desc": "",
                }
            elif e == "SparkListenerJobStart":
                jobs.append({
                    "job": ev["Job ID"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "t0": ev.get("Submission Time"),
                })
            elif e == "SparkListenerJobEnd":
                for j in jobs:
                    if j["job"] == ev["Job ID"]:
                        j["wall_ms"] = ev.get("Completion Time", 0) - j["t0"]
    for j in jobs:
        print(f"job {j['job']:3d} wall={j.get('wall_ms', '?'):>7} ms "
              f"desc={j['desc'][:50]}")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s:
                continue
            print(f"   stage {sid:3d} wall={s['wall_ms']!s:>7} "
                  f"tasks={s['tasks']:3d} run={s['run_ms']!s:>7} "
                  f"cpu={int(s['cpu_ms'] or 0):>6} gc={s['gc_ms']!s:>5} "
                  f"shW={s['sh_write']} {s['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
