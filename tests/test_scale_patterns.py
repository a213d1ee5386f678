"""Scale-pattern evidence: salting equivalence and bucketed co-located
joins — the two shuffle-management techniques the 100 TB design leans
on beyond AQE."""

from __future__ import annotations

import pyspark.sql.functions as F

from contacts_etl_phase21_spark.operators.entity_resolution import (
    candidate_pairs, candidate_pairs_salted, prepare_for_matching,
)
from contacts_etl_phase21_spark.plans.coverage_queries import (
    synthetic_contact_records,
)


def test_salted_pairs_equal_unsalted(spark, sf_small):
    prepared = prepare_for_matching(
        synthetic_contact_records(spark, sf_small))
    plain = {(r["l_rid"], r["r_rid"])
             for r in candidate_pairs(prepared)
             .select("l_rid", "r_rid").collect()}
    salted = {(r["l_rid"], r["r_rid"])
              for r in candidate_pairs_salted(prepared, n_salt=4)
              .select("l_rid", "r_rid").collect()}
    assert plain == salted
    assert len(plain) > 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the join key join WITHOUT any
    Exchange (shuffle) in the physical plan — write-time co-location,
    the bucketing win that makes repeated big-table equi-joins cheap
    at scale."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.mode("overwrite")
         .option("path", str(tmp_path / name))
         .bucketBy(4, "k").sortBy("k").saveAsTable(name))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the plan must co-locate
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
