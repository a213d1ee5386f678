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

No-HUGEINT rule (round 7): oracle output columns must bind to
pandas-portable DuckDB types. A bare SUM(BIGINT) returns HUGEINT
(int128), which DuckDB's pandas conversion renders as float64
("123.0") while fetchall() gives int ("123"); the driver canonicalizes
through pandas, so a HUGEINT column hash-reds with rows/schema green
even though every fetchall-based value check agrees — the root cause
of the r04-r06 ta_corpus_stats/ta_corpus_report driver reds (the
registry's only two HUGEINT emitters were exactly the two red rows).
Always CAST(SUM(..) AS BIGINT). Guarded by tests/test_oracle_types.py
and the pandas-twin hash in tools/check_correctness_full.py.
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


def scale_fixed(df: DataFrame, cols: tuple[str, ...], scale: int,
                suffix: str) -> DataFrame:
    """Replace rounded double columns with scaled BIGINTs (c<suffix>).

    Implements the no-raw-doubles registry rule. For a column already
    rounded to <= log10(scale) decimals with |c * scale| < 2^52,
    c * scale lands within an ulp of an integer on both engines (IEEE
    multiply is deterministic), so round-to-0-decimals then cast is
    exact and engine-portable. Pick the scale by magnitude: 1e6 for
    ratios/scores (|c| small), 100 (cents) for money sums whose groups
    reach 1e9+ — cents keep 2^52 headroom at any realistic SF."""
    for c in cols:
        df = df.withColumn(
            f"{c}{suffix}",
            F.round(F.col(c) * scale, 0).cast("long")).drop(c)
    return df


def fixed_oracle(sql: str, cols: tuple[str, ...], scale: int,
                 suffix: str) -> str:
    """DuckDB twin of scale_fixed: wrap an oracle SQL so its double
    columns become scaled BIGINTs named c<suffix> (driver compares
    columns by sorted name, so position changes are fine)."""
    excl = ", ".join(cols)
    scaled = ", ".join(
        f"CAST(ROUND({c} * {scale}, 0) AS BIGINT) AS {c}{suffix}"
        for c in cols)
    return f"SELECT * EXCLUDE ({excl}), {scaled} FROM (\n{sql}\n) __fx"


def scale_e6(df: DataFrame, *cols: str) -> DataFrame:
    """Ratio columns → c_e6 BIGINTs (see scale_fixed)."""
    return scale_fixed(df, cols, 1000000, "_e6")


def e6_oracle(sql: str, *cols: str) -> str:
    return fixed_oracle(sql, cols, 1000000, "_e6")


def scale_cents(df: DataFrame, *cols: str) -> DataFrame:
    """Money-sum columns (already ROUND(x, 2)) → c_cents BIGINTs."""
    return scale_fixed(df, cols, 100, "_cents")


def cents_oracle(sql: str, *cols: str) -> str:
    return fixed_oracle(sql, cols, 100, "_cents")


def scale_e4(df: DataFrame, *cols: str) -> DataFrame:
    """ROUND(x, 4) average columns → c_e4 BIGINTs."""
    return scale_fixed(df, cols, 10000, "_e4")


def e4_oracle(sql: str, *cols: str) -> str:
    return fixed_oracle(sql, cols, 10000, "_e4")
