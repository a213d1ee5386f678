"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query on sf0.001; queries()/oracle_sql()
expose the full operator inventory (SURVEY.md §2 + LLM-pipeline ops)
with DuckDB oracle twins. Implementations live in
contacts_etl_phase21_spark/plans/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable when the driver execs this file from /root/repo.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from contacts_etl_phase21_spark.plans import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
