"""Registry of declared queries with their DuckDB oracle twins.

Each entry maps one (or a family of) SURVEY.md §2 operators onto the
driver's synthetic tables. The Spark side must be the idiomatic
DataFrame expression of the operator; the oracle is plain ANSI SQL that
DuckDB runs on the same parquet — the driver hash-compares the two at
sf0.01 (see /root/repo/__spark_entry__.py).

Column-name parity rule: every computed column is aliased identically in
both the Spark plan and the oracle SQL.

Scalar-output rule: query result columns must be scalar-typed (no
array/map/struct cells). The driver canonicalizes results via a pandas
sort over all columns, which cannot hash list cells — an array column
errors the row even when the values are correct (r03's
mm_ppm_resize_real). Project array elements to scalar columns
(p0..pN) or concat_ws them instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    survey: str  # SURVEY.md §2 operator ids this query exercises
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def query(name: str, *, oracle: str | None, survey: str, doc: str = "",
          tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, survey=survey,
                              doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco
