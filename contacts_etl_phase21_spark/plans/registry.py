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

No-raw-doubles rule (round 5): hash-checked outputs must not carry raw
DOUBLE columns whose decimal rendering is hasher-sensitive (r04's
ta_corpus_stats hashed red on a value-identical ROUND(avg, 4) double).
Computed ratios/scores are emitted as scaled BIGINTs via scale_e6 /
e6_oracle below; both engines compute identical IEEE doubles for
round(x, 6), so cast(round(x * 1e6) as bigint) is engine-exact.
Raw parquet passthrough columns (e.g. o_totalprice) are exempt: the
bits come from the same file on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def scale_e6(df: DataFrame, *cols: str) -> DataFrame:
    """Replace rounded double ratio columns with scaled BIGINTs (c_e6).

    Implements the no-raw-doubles registry rule. For a column already
    rounded to <= 6 decimals with |c| < 2^22, c * 1e6 lands within an
    ulp of an integer on both engines (IEEE multiply is deterministic),
    so round-to-0-decimals then cast is exact and engine-portable.
    """
    for c in cols:
        df = df.withColumn(
            f"{c}_e6", F.round(F.col(c) * 1000000, 0).cast("long")).drop(c)
    return df


def e6_oracle(sql: str, *cols: str) -> str:
    """DuckDB twin of scale_e6: wrap an oracle SQL so its double ratio
    columns become scaled BIGINTs named c_e6 (driver compares columns
    by sorted name, so position changes are fine)."""
    excl = ", ".join(cols)
    scaled = ", ".join(
        f"CAST(ROUND({c} * 1000000, 0) AS BIGINT) AS {c}_e6" for c in cols)
    return f"SELECT * EXCLUDE ({excl}), {scaled} FROM (\n{sql}\n) __e6"
