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


def interval_overlap_join(left: DataFrame, right: DataFrame, key_col: str,
                          l_start: str, l_end: str, r_start: str,
                          r_end: str, bucket_span_us: int = 600_000_000,
                          prefix: str = "r_") -> DataFrame:
    """Interval-OVERLAP join: one output row per (left interval, right
    interval) pair that overlaps — `l.start <= r.end AND r.start <=
    l.end` on the same key. The third member of the temporal-join
    family (as-of = latest-before, range = point-in-interval, overlap
    = interval-intersects-interval); a bare theta join plans as a
    nested-loop cartesian.

    Same bucketization as range_join, with one extra idea: BOTH sides
    explode into the coarse buckets they cover, so an overlapping pair
    would surface once per SHARED bucket — instead each pair is
    claimed by exactly ONE canonical bucket, the bucket containing the
    overlap's start (greatest of the two starts), which both sides
    cover by definition. No post-join distinct, no duplicate
    candidates surviving. Work is Σ(len/span + 1) exploded rows per
    side, shuffled on (key, bucket); pick bucket_span_us near the
    typical interval length so the explode factor stays ~2.

    Inner semantics only: an outer variant over exploded sides would
    fabricate one NULL row per uncovered (row, bucket) — compose
    left-outer reports as aggregate + join-back (the j8/j10 pattern).
    Inputs with end < start are dropped BEFORE the explode (Spark's
    sequence() counts DOWN when stop < start — the recorded trap).
    Left columns keep their names; right columns arrive prefixed.
    """
    lcols = list(left.columns)
    rcols = list(right.columns)
    lf = (left
          .withColumn("__ls", F.unix_micros(F.col(l_start)))
          .withColumn("__le", F.unix_micros(F.col(l_end)))
          .filter(F.col("__le") >= F.col("__ls"))
          .withColumn("__bkt", F.explode(F.sequence(
              F.floor(F.col("__ls") / bucket_span_us),
              F.floor(F.col("__le") / bucket_span_us)))))
    rf = (right
          .select(*[F.col(c).alias(f"{prefix}{c}") for c in rcols])
          .withColumn("__rs", F.unix_micros(F.col(f"{prefix}{r_start}")))
          .withColumn("__re", F.unix_micros(F.col(f"{prefix}{r_end}")))
          .filter(F.col("__re") >= F.col("__rs"))
          .withColumn("__bkt", F.explode(F.sequence(
              F.floor(F.col("__rs") / bucket_span_us),
              F.floor(F.col("__re") / bucket_span_us)))))
    cond = (lf[key_col].eqNullSafe(rf[f"{prefix}{key_col}"])
            & (lf["__bkt"] == rf["__bkt"])
            & (lf["__ls"] <= rf["__re"]) & (rf["__rs"] <= lf["__le"])
            & (lf["__bkt"] == F.floor(
                F.greatest(lf["__ls"], rf["__rs"]) / bucket_span_us)))
    return lf.join(rf, cond).select(
        *[lf[c] for c in lcols],
        *[rf[f"{prefix}{c}"] for c in rcols])
