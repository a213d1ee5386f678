"""Distributed as-of (point-in-time) join — the time-series enrichment
operator Spark's DataFrame API lacks (pandas has merge_asof; DuckDB
has ASOF JOIN; feature stores call it the point-in-time-correct join
because it prevents label leakage: a training row at time t may only
see features from rows with ts <= t).

Semantics (backward, inclusive): for each LEFT row, attach the RIGHT
row of the same key with the greatest (ts, tie) such that
right.ts <= left.ts, optionally within `tolerance` microseconds.
Ties at equal ts break by the greatest tie column (e.g. event_id), so
the match is a total function of the inputs — oracle-checkable.

Scale shape — NOT the naive theta-join (l ⋈ r ON key AND r.ts<=l.ts
then max: quadratic per key), and NOT one window per key (a hot key —
a bot user with 10^9 events — would funnel through one task, the
pack_sequences lesson). TWO-PASS union + carry-forward over bounded
(key, time-bucket) partitions:

  pass 1  union(left, right) windowed per (key, bucket): running
          last_value(right-struct, ignorenulls) ordered by
          (ts, side, tie) with rights-before-lefts at equal ts —
          the within-bucket match. Partition size is bounded by the
          bucket span x the key's event rate, never the key's full
          history.
  pass 2  per-(key, bucket) max(right-struct) — a MAP-SIDE-COMBINED
          agg whose output is |keys x buckets| rows — then the
          cross-bucket carry (last non-null over PRECEDING buckets)
          via a window over that small frame, equi-joined back on
          (key, bucket) (null-safe: NULL keys form their own group,
          matching Window.partitionBy semantics).
  match = coalesce(within-bucket, carry-in): any same-bucket right at
          ts <= left.ts dominates every earlier-bucket right, so the
          coalesce is exactly argmax_{r.ts <= l.ts} (r.ts, r.tie).

One shuffle for the union window, one agg + join co-partitioned on the
same key — the same partition discipline as pack_sequences' prefix
sum. Equivalence with the naive theta-join plan is test-pinned.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, value_cols: list[str], tie_col: str,
              bucket_span_us: int = 3_600_000_000,
              tolerance_us: int | None = None,
              suffix: str = "_r",
              direction: str = "backward") -> DataFrame:
    """As-of join, inclusive, pandas merge_asof directions: "backward"
    (default) matches the GREATEST (ts, tie) right with r.ts <= l.ts;
    "forward" the SMALLEST (ts, tie) right with r.ts >= l.ts. Returns
    every LEFT row with `<ts_col><suffix>`, `<tie_col><suffix>` and
    `<v><suffix>` per value col — all NULL when nothing matches (or
    nothing within `tolerance_us`). Timestamps are compared as epoch
    MICROSECONDS (unix_micros), the engine-portable integer DuckDB's
    epoch_us mirrors. Forward is the same two-pass plan mirrored:
    first-over-following windows, min-struct per bucket, carry from
    FOLLOWING buckets."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    fwd = direction == "forward"
    lcols = left.columns
    rstruct = F.struct(
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col(tie_col).alias("__tie"),
        *[F.col(v).alias(v) for v in value_cols]).alias("__r")

    l = left.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.select(rstruct).schema["__r"].dataType)
        .alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols])
    # a NULL-ts right can never satisfy r.ts <= l.ts (SQL: NULL, i.e.
    # no match) — drop it BEFORE the union, or it would land in the
    # NULL bucket and get carried onto NULL-ts lefts there
    r = right.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.lit(0).alias("__side"),
        rstruct,
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols])

    u = l.unionByName(r).withColumn(
        "__bkt", F.floor(F.col("__ts_us") / bucket_span_us))

    # pass 1: within-(key, bucket) carry; at equal ts the RIGHT rows
    # sit on the match side of the frame (before lefts for backward —
    # side 0 < 1 — after lefts for forward via desc(side)), equal-ts
    # rights ordered by tie so the frame edge is the extreme tie.
    side_ord = F.desc("__side") if fwd else F.col("__side")
    w1 = (Window.partitionBy("__k", "__bkt")
          .orderBy("__ts_us", side_ord, F.col("__r.__tie")))
    if fwd:
        w1 = w1.rowsBetween(0, Window.unboundedFollowing)
        u = u.withColumn("__in_bkt",
                         F.first("__r", ignorenulls=True).over(w1))
    else:
        w1 = w1.rowsBetween(Window.unboundedPreceding, 0)
        u = u.withColumn("__in_bkt",
                         F.last("__r", ignorenulls=True).over(w1))

    # pass 2: extreme right per (key, bucket) — struct max/min is
    # lexicographic, i.e. greatest/smallest (ts, tie) — then carry
    # across PRECEDING (backward) / FOLLOWING (forward) buckets per
    # key over the small agg frame.
    extreme = F.min("__r") if fwd else F.max("__r")
    w2 = Window.partitionBy("__k").orderBy("__bkt")
    if fwd:
        w2 = w2.rowsBetween(1, Window.unboundedFollowing)
        carry_expr = F.first("__last_r", ignorenulls=True).over(w2)
    else:
        w2 = w2.rowsBetween(Window.unboundedPreceding, -1)
        carry_expr = F.last("__last_r", ignorenulls=True).over(w2)
    carry = (u.groupBy("__k", "__bkt").agg(extreme.alias("__last_r"))
             .withColumn("__carry_in", carry_expr)
             .select(F.col("__k").alias("__ck"),
                     F.col("__bkt").alias("__cb"), "__carry_in"))

    j = u.join(carry, F.col("__k").eqNullSafe(F.col("__ck"))
               & F.col("__bkt").eqNullSafe(F.col("__cb")))
    # NULL-ts lefts never match (SQL NULL comparison); without this
    # guard the forward carry would hand them the first REAL bucket's
    # rights (the NULL bucket sorts first, so every real bucket is in
    # its FOLLOWING frame).
    matched: Column = F.when(
        F.col("__ts_us").isNotNull(),
        F.coalesce(F.col("__in_bkt"), F.col("__carry_in")))
    if tolerance_us is not None:
        gap = (matched["__ts_us"] - F.col("__ts_us") if fwd
               else F.col("__ts_us") - matched["__ts_us"])
        matched = F.when(gap <= tolerance_us, matched)
    return (j.filter(F.col("__side") == 1)
            .select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                    F.timestamp_micros(matched["__ts_us"])
                    .alias(f"{ts_col}{suffix}"),
                    matched["__tie"].alias(f"{tie_col}{suffix}"),
                    *[matched[v].alias(f"{v}{suffix}")
                      for v in value_cols]))


def asof_join_naive(left: DataFrame, right: DataFrame, key_col: str,
                    ts_col: str, value_cols: list[str], tie_col: str,
                    tolerance_us: int | None = None,
                    suffix: str = "_r",
                    direction: str = "backward") -> DataFrame:
    """The quadratic-per-key reference plan (theta-join + row_number)
    — the correctness mirror for asof_join's two-pass carry, and the
    shape the DuckDB oracle uses. Test/oracle tier only: Σ|key-group|²
    candidate rows is exactly what the two-pass plan avoids."""
    lcols = left.columns
    l = left.select(
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col(key_col).alias("__k"),
        F.monotonically_increasing_id().alias("__lid"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols])
    r = right.select(
        F.col(key_col).alias("__rk"),
        F.unix_micros(F.col(ts_col)).alias("__rts"),
        F.col(tie_col).alias("__rtie"),
        *[F.col(v).alias(f"__rv_{v}") for v in value_cols])
    fwd = direction == "forward"
    cond = F.col("__k").eqNullSafe(F.col("__rk")) \
        & ((F.col("__rts") >= F.col("__ts_us")) if fwd
           else (F.col("__rts") <= F.col("__ts_us")))
    if tolerance_us is not None:
        gap = (F.col("__rts") - F.col("__ts_us") if fwd
               else F.col("__ts_us") - F.col("__rts"))
        cond = cond & (gap <= tolerance_us)
    w = (Window.partitionBy("__lid").orderBy("__rts", "__rtie") if fwd
         else Window.partitionBy("__lid").orderBy(
             F.desc("__rts"), F.desc("__rtie")))
    return (l.join(r, cond, "left")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                    F.timestamp_micros(F.col("__rts"))
                    .alias(f"{ts_col}{suffix}"),
                    F.col("__rtie").alias(f"{tie_col}{suffix}"),
                    *[F.col(f"__rv_{v}").alias(f"{v}{suffix}")
                      for v in value_cols]))


def validity_intervals(right: DataFrame, key_col: str, ts_col: str,
                       value_cols: list[str], tie_col: str,
                       horizon_end_us: int) -> DataFrame:
    """Convert per-key snapshots into DISJOINT validity intervals:
    each snapshot is valid from its own ts (inclusive) until 1us
    before the key's next snapshot, the last until `horizon_end_us`.
    A point-in-time lookup then becomes interval CONTAINMENT — the
    static half of streaming as-of enrichment: with intervals disjoint
    and exhaustive past a key's first snapshot, every probe matches at
    most ONE row, so the stream side needs no per-row aggregation (a
    stateless stream-static range join serves it).

    Equal-ts duplicates inherit asof_join's tie order for free: the
    lead window orders by (ts, tie), so every non-greatest duplicate
    gets valid_to = ts - 1 < valid_from — an empty interval
    range_join's reversed-interval guard drops — and the greatest tie
    owns the slot.

    The lead window partitions by KEY alone, unlike asof_join's
    bucketed two-pass: acceptable because the snapshot/dimension side
    of an enrichment is orders smaller than the event stream (the fat
    side never enters a window here); a snapshot table with hot-key
    history deep enough to matter should go through asof_join instead.
    """
    w = Window.partitionBy(key_col).orderBy("__from_us",
                                            F.col(tie_col))
    return (right
            .filter(F.col(ts_col).isNotNull())  # same rule as asof_join
            .withColumn("__from_us", F.unix_micros(F.col(ts_col)))
            .withColumn(
                "__to_us",
                F.coalesce(F.lead("__from_us").over(w) - 1,
                           F.lit(horizon_end_us)))
            .select(key_col, tie_col, *value_cols,
                    F.timestamp_micros(F.col("__from_us"))
                    .alias("valid_from"),
                    F.timestamp_micros(F.col("__to_us"))
                    .alias("valid_to")))
