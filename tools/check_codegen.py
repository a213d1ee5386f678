"""Registry-wide whole-stage-codegen compile audit.

Runs every registered query in ONE fresh plain session and reports,
per query, how many generated classes failed to compile (janino "Code
grows beyond 64 KB" and friends). A failure is not a correctness bug —
Spark de-fuses the stage and falls back to per-operator codegen, which
CAN split methods — but it silently costs the fusion win, and at
corpus scale the de-fused stage is the hot loop, so the repo's
standing rule (round 4, re-verified round 6) is ZERO compile failures
across the registry.

Mechanics: the JVM logs compile failures to stderr and exposes no
error counter (CodegenMetrics has time/size histograms only), so the
tool re-executes itself with stderr captured, writes a per-query
marker line to the SHARED stderr fd before each query, and attributes
"Failed to compile" lines to the section they fall in. The codegen
cache dedups identical generated classes, so a failure is counted at
its first occurrence — which is what the audit wants.

Root-cause note for future failures (round-6 session-4 finding): one
oversized EXPRESSION (not an oversized operator chain) is enough —
whole-stage codegen feeds expressions from Java locals, so
splitExpressions cannot hoist pieces into helper methods the way
row-based UnsafeProjection codegen can. Fixes that worked: set-overlap
join keys + pre-UDF bound booleans (round 4, ER pair gate),
broadcast-variable kernels for literal-table expressions (round 6,
ann_pq_topk).

Usage: python tools/check_codegen.py [sf_dir]   (default sf0.01)
Exit code 1 if any query triggered a compile failure.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_MARK = "===CGAUDIT-QUERY "


def child(sf_dir: str) -> int:
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("check-codegen").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from contacts_etl_phase21_spark.plans import QUERIES

    for name, q in QUERIES.items():
        # JVM log lines and this marker land on the same stderr fd,
        # in order (both flushed per line)
        sys.stderr.write(f"{_MARK}{name}===\n")
        sys.stderr.flush()
        try:
            q.fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"QUERY-ERROR {name}: {exc}", flush=True)
    print("CGAUDIT-DONE", flush=True)
    return 0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if os.environ.get("_CG_CHILD") == "1":
        return child(sf_dir)

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), sf_dir],
        env={**os.environ, "_CG_CHILD": "1"},
        stderr=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        cwd=_REPO)
    if "CGAUDIT-DONE" not in proc.stdout:
        print(proc.stdout)
        print(proc.stderr[-4000:])
        print("child run did not complete")
        return 1

    counts: dict[str, int] = {}
    current = "<session-setup>"
    n_queries = 0
    for line in proc.stderr.splitlines():
        if line.startswith(_MARK):
            current = line[len(_MARK):].rstrip("=")
            n_queries += 1
        elif "Failed to compile the generated Java code" in line:
            counts[current] = counts.get(current, 0) + 1
    for line in proc.stdout.splitlines():
        if line.startswith("QUERY-ERROR"):
            print(line)
    for name, n in counts.items():
        print(f"{name}: {n} compile failure(s)")
    print(f"{n_queries - len(counts)}/{n_queries} queries codegen-clean; "
          f"failures: {counts or 'none'}")
    return 1 if counts else 0


if __name__ == "__main__":
    raise SystemExit(main())
