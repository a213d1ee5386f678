"""As-of / range join scale protocol (10^5-10^7 events).

The driver testdata caps `events` at ~10^4 rows — too small to show
why the two-pass bucketed plans exist. This protocol generates N
synthetic events DECLARATIVELY (pure column expressions over a range —
no driver rows, no RNG; the bench_corpus.py pattern) and times:

- asof2p:   operators/asof.asof_join (union + bounded-(key,bucket)
            carry) — the shippable plan
- asofnv:   operators/asof.asof_join_naive (theta-join + row_number) —
            the quadratic-per-key reference, timed only while
            Σ|L_k||R_k| stays tractable
- range:    operators/range_join.range_join (bucket-exploded
            equi-join) vs the bare BETWEEN theta join at the smallest N

plus a SKEW case: one bot user holding ~20% of all events, where the
per-key naive candidate count (~0.1*N)^2 is unrunnable but the
two-pass plan's window partitions stay bounded by (key, hour-bucket).

At 10^5 the two plans' outputs are checked EQUAL (exceptAll both
ways), so the timings compare like for like.

Usage:  python tools/bench_asof.py [N ...]    (default: 1e5 1e6)
Prints one JSON line per N:
  {"metric": "asof_range_sec", "events": N, "stages": {...},
   "value": total_two_pass_paths, "unit": "sec"}
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from contacts_etl_phase21_spark.operators.asof import (  # noqa: E402
    asof_join, asof_join_naive,
)
from contacts_etl_phase21_spark.operators.range_join import (  # noqa: E402
    range_join,
)
from contacts_etl_phase21_spark.session import get_spark  # noqa: E402

START_US = 1_704_067_200_000_000  # 2024-01-01
SPAN_US = 30 * 24 * 3_600_000_000  # events spread over 30 days
HOUR_US = 3_600_000_000


def synthetic_events(spark: SparkSession, n: int, n_users: int,
                     skew: bool = False) -> DataFrame:
    """(event_id, user_id, ts, value, side) with side 0/1 ~ right/left.
    skew=True routes every 5th event to user 0 (a ~20% bot key)."""
    base = spark.range(n).select(F.col("id").alias("event_id"))
    uid = F.pmod(F.xxhash64("event_id"), F.lit(n_users))
    if skew:
        uid = F.when(F.col("event_id") % 5 == 0, F.lit(0)).otherwise(uid)
    ts_us = F.lit(START_US) + F.pmod(
        F.xxhash64("event_id", F.lit("ts")), F.lit(SPAN_US))
    return base.select(
        "event_id",
        uid.alias("user_id"),
        F.timestamp_micros(ts_us).alias("ts"),
        (F.pmod(F.xxhash64("event_id", F.lit("v")), F.lit(10_000))
         / 100.0).alias("value"),
        (F.col("event_id") % 2).alias("side"))


def _split(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    left = ev.filter(F.col("side") == 1) \
        .select("event_id", "user_id", "ts")
    right = ev.filter(F.col("side") == 0) \
        .select("event_id", "user_id", "ts", "value")
    return left, right


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def run(spark: SparkSession, n: int) -> dict:
    n_users = max(100, n // 100)  # ~100 events/user in the even case
    ev = synthetic_events(spark, n, n_users).persist()
    ev.count()
    left, right = _split(ev)
    stages: dict[str, float] = {}

    two_pass = asof_join(left, right, "user_id", "ts", ["value"],
                         "event_id", bucket_span_us=HOUR_US)
    stages["asof2p"] = _timed(two_pass.count)
    if n <= 100_000:
        naive = asof_join_naive(left, right, "user_id", "ts", ["value"],
                                "event_id")
        stages["asofnv"] = _timed(naive.count)
        assert two_pass.exceptAll(naive).count() == 0
        assert naive.exceptAll(two_pass).count() == 0
        stages["asof_equal"] = 1.0

    intervals = right.select(
        F.col("event_id").alias("iid"), "user_id",
        F.col("ts").alias("w_start"),
        F.timestamp_micros(F.unix_micros("ts") + 600_000_000)
        .alias("w_end"))
    rj = range_join(left, intervals, "user_id", "ts", "w_start", "w_end",
                    bucket_span_us=600_000_000)
    stages["range"] = _timed(rj.count)
    if n <= 100_000:
        theta = left.join(
            intervals.withColumnRenamed("user_id", "i_user_id"),
            (F.col("user_id") == F.col("i_user_id"))
            & F.col("ts").between(F.col("w_start"), F.col("w_end")))
        stages["range_theta"] = _timed(theta.count)
        assert rj.count() == theta.count()
    ev.unpersist()

    # skew: one bot user with ~20% of events; two-pass only (the naive
    # candidate set at that key is (0.1N)^2)
    evs = synthetic_events(spark, n, n_users, skew=True).persist()
    evs.count()
    ls, rs = _split(evs)
    stages["asof2p_skew"] = _timed(
        asof_join(ls, rs, "user_id", "ts", ["value"], "event_id",
                  bucket_span_us=HOUR_US).count)
    evs.unpersist()

    total = round(stages["asof2p"] + stages["range"]
                  + stages["asof2p_skew"], 2)
    return {"metric": "asof_range_sec", "events": n, "stages": stages,
            "value": total, "unit": "sec"}


def main() -> int:
    ns = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark(app_name="bench-asof")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(run(spark, n)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
