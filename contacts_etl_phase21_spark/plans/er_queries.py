"""Entity-resolution operator family (E1-E5) over the synthetic tables.

The contact-semantics versions live in operators/entity_resolution.py
and are pinned by tests/test_pipeline_contracts.py; these queries
exercise the same distributed shapes — blocking, blocked pair
generation, edge filtering, connected components — on the driver's
deterministic customer table so the DuckDB oracle can hash-check them.

Scale notes: blocking keys here are (nation, segment) attributes; the
pair join is the same blocked self-join as J1 (AQE skew-handled); the
connected-components oracle is a recursive CTE, while the Spark side
runs the iterative min-label propagation operator — same result set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from contacts_etl_phase21_spark.io import load
from contacts_etl_phase21_spark.operators.entity_resolution import (
    connected_components,
)
from contacts_etl_phase21_spark.plans.registry import query

# --------------------------------------------------------------------------
# E1: blocking-key assignment + block statistics
# --------------------------------------------------------------------------


@query(
    "e1_blocking_stats",
    survey="E1",
    doc="Blocking-key bucketing (combine_contacts.py:1116-1129 shape): "
        "assign each record a block key, count bucket sizes and the "
        "quadratic pair cost per bucket. One map-side-combined groupBy.",
    oracle="""
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS block_size,
               COUNT(*) * (COUNT(*) - 1) / 2 AS pair_cost
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
        ORDER BY c_nationkey, c_mktsegment
    """,
)
def e1_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("block_size"),
             (F.count("*") * (F.count("*") - 1) / 2).alias("pair_cost"))
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# E2+E4: blocked candidate pairs with a decision filter
# --------------------------------------------------------------------------


@query(
    "e2_blocked_pairs_decided",
    survey="E2,E3,E4",
    doc="Blocked self-join (l.id < r.id residual) + evidence filter — the "
        "candidate-generation/decision shape of _cluster_indices "
        "(combine_contacts.py:1149-1222). Both sides shuffle once on the "
        "block key; the score predicate is pure column algebra.",
    oracle="""
        SELECT l.c_custkey AS l_key, r.c_custkey AS r_key,
               ROUND(ABS(l.c_acctbal - r.c_acctbal), 2) AS balance_gap
        FROM customer l JOIN customer r
          ON l.c_nationkey = r.c_nationkey
         AND l.c_mktsegment = r.c_mktsegment
         AND l.c_custkey < r.c_custkey
        WHERE l.c_mktsegment = 'BUILDING'
          AND ABS(l.c_acctbal - r.c_acctbal) < 50
        ORDER BY l_key, r_key
    """,
)
def e2_blocked_pairs_decided(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer") \
        .filter(F.col("c_mktsegment") == "BUILDING")
    left = customer.select(F.col("c_custkey").alias("l_key"),
                           F.col("c_nationkey").alias("l_nat"),
                           F.col("c_mktsegment").alias("l_seg"),
                           F.col("c_acctbal").alias("l_bal"))
    right = customer.select(F.col("c_custkey").alias("r_key"),
                            F.col("c_nationkey").alias("r_nat"),
                            F.col("c_mktsegment").alias("r_seg"),
                            F.col("c_acctbal").alias("r_bal"))
    return (
        left.join(right, (F.col("l_nat") == F.col("r_nat"))
                  & (F.col("l_seg") == F.col("r_seg"))
                  & (F.col("l_key") < F.col("r_key")))
        .filter(F.abs(F.col("l_bal") - F.col("r_bal")) < 50)
        .select("l_key", "r_key",
                F.round(F.abs(F.col("l_bal") - F.col("r_bal")), 2)
                .alias("balance_gap"))
        .orderBy("l_key", "r_key")
    )


# --------------------------------------------------------------------------
# E5: connected components (iterative min-label propagation vs
#     recursive-CTE oracle)
# --------------------------------------------------------------------------


@query(
    "e5_connected_components",
    survey="E5",
    doc="Union-find equivalent (combine_contacts.py:1135-1147) as "
        "distributed min-label propagation. Deterministic graph: star "
        "edges to the min custkey of each (nation, segment) group plus "
        "bridge edges to the min of each (segment, balance-millennium) "
        "group — components span nations transitively. The DuckDB twin "
        "is a recursive CTE over the same symmetric edge set.",
    oracle="""
        WITH RECURSIVE
        e1 AS (SELECT c_custkey AS src,
                      MIN(c_custkey) OVER (PARTITION BY c_nationkey,
                                           c_mktsegment) AS dst
               FROM customer),
        e2 AS (SELECT c_custkey AS src,
                      MIN(c_custkey) OVER (PARTITION BY c_mktsegment,
                                           FLOOR(c_acctbal / 1000)) AS dst
               FROM customer),
        edges AS (SELECT src, dst FROM e1 WHERE src <> dst
                  UNION SELECT src, dst FROM e2 WHERE src <> dst),
        sym AS (SELECT src, dst FROM edges
                UNION SELECT dst, src FROM edges),
        reach(id, root) AS (
            SELECT c_custkey, c_custkey FROM customer
            UNION
            SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.id),
        comp AS (SELECT id, MIN(root) AS component FROM reach GROUP BY id)
        SELECT component, COUNT(*) AS members
        FROM comp GROUP BY component ORDER BY component
    """,
)
def e5_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    w_nat = F.min("c_custkey").over(
        Window.partitionBy("c_nationkey", "c_mktsegment"))
    w_bal = F.min("c_custkey").over(
        Window.partitionBy("c_mktsegment", F.floor(F.col("c_acctbal") / 1000)))
    e1 = customer.select(F.col("c_custkey").alias("src"),
                         w_nat.alias("dst")).filter("src <> dst")
    e2 = customer.select(F.col("c_custkey").alias("src"),
                         w_bal.alias("dst")).filter("src <> dst")
    edges = e1.union(e2).distinct()
    vertices = customer.select(F.col("c_custkey").alias("id"))
    cc = connected_components(vertices, edges)
    return (cc.groupBy("component").agg(F.count("*").alias("members"))
            .orderBy("component"))


# --------------------------------------------------------------------------
# A2: dataset-level presence summary (validate_quality.py:223-233 shape)
# --------------------------------------------------------------------------


@query(
    "a2_presence_summary",
    survey="A2",
    doc="Single-row dataset summary: counts + presence percentages + "
        "average — one map-side-combined aggregation, no shuffle beyond "
        "the final 1-row combine.",
    oracle="""
        SELECT COUNT(*) AS total_rows,
               ROUND(100.0 * AVG(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END), 2)
                   AS positive_balance_pct,
               ROUND(AVG(c_acctbal), 2) AS avg_balance
        FROM customer
    """,
)
def a2_presence_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return customer.agg(
        F.count("*").alias("total_rows"),
        F.round(100.0 * F.avg((F.col("c_acctbal") > 0).cast("int")), 2)
        .alias("positive_balance_pct"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_balance"))
