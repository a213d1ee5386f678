"""Distributed range (interval) join — points matched to the intervals
containing them. The second classic operator Spark's optimizer lacks a
fast path for: `p.ts BETWEEN i.start AND i.end` alone plans as a
BroadcastNestedLoopJoin / CartesianProduct (every point against every
interval), which is quadratic and unshippable at corpus scale.

Plan: bucketize time. Each interval EXPLODES into the coarse buckets
it covers (sequence(floor(start/span), floor(end/span))); each point
lands in exactly ONE bucket — so the bucket equi-join enumerates every
candidate (point, interval) pair exactly once, no post-join dedup —
and the exact BETWEEN predicate filters inside the join's projection.
Work is |points| + Σ(interval_len/span + 1) exploded rows, shuffled on
(key, bucket): pick `bucket_span_us` near the TYPICAL interval length
so the explode factor stays ~2 (the registered query uses span ==
interval length). DuckDB/Trino implement their range-join
optimizations the same way internally (IEJoin-family / bucketed
candidate pruning); Spark just needs it declared.

Degenerate inputs: intervals with end < start match nothing and are
dropped BEFORE the explode — Spark's sequence(a, b) with b < a counts
DOWN instead of erroring (the same trap ta_bpe_pair_counts documents),
which would silently re-introduce them as matches. NULL keys stay
joinable (eqNullSafe) to mirror Window.partitionBy grouping semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join(points: DataFrame, intervals: DataFrame, key_col: str,
               ts_col: str, start_col: str, end_col: str,
               bucket_span_us: int = 600_000_000,
               prefix: str = "i_", how: str = "inner") -> DataFrame:
    """Interval-containment join: one output row per (point, covering
    interval); how="left" keeps uncovered points with NULL interval
    columns (legal even with a streaming `points` side — stream-static
    left-outer is stateless). Point columns keep their names; interval
    columns arrive `prefix`ed. Timestamps compare as epoch
    microseconds (unix_micros / DuckDB epoch_us)."""
    p = (points.withColumn("__ts_us", F.unix_micros(F.col(ts_col)))
         .withColumn("__bkt", F.floor(F.col("__ts_us") / bucket_span_us)))
    icols = [c for c in intervals.columns]
    i = (intervals
         .select(*[F.col(c).alias(f"{prefix}{c}") for c in icols])
         .withColumn("__s_us", F.unix_micros(F.col(f"{prefix}{start_col}")))
         .withColumn("__e_us", F.unix_micros(F.col(f"{prefix}{end_col}")))
         .filter(F.col("__e_us") >= F.col("__s_us"))
         .withColumn("__bkt", F.explode(F.sequence(
             F.floor(F.col("__s_us") / bucket_span_us),
             F.floor(F.col("__e_us") / bucket_span_us)))))
    cond = (p[key_col].eqNullSafe(i[f"{prefix}{key_col}"])
            & (p["__bkt"] == i["__bkt"])
            & (p["__ts_us"] >= i["__s_us"])
            & (p["__ts_us"] <= i["__e_us"]))
    return p.join(i, cond, how).select(
        *[p[c] for c in points.columns],
        *[i[f"{prefix}{c}"] for c in icols])
