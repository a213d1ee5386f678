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
from contacts_etl_phase21_spark.plans.registry import e6_oracle, query, scale_e6

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
               CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS pair_cost
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
        ORDER BY c_nationkey, c_mktsegment
    """,
)
def e1_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    # pair_cost is a whole number — emitted as BIGINT per the registry's
    # no-raw-doubles rule (both engines' `/` would otherwise yield DOUBLE).
    return (
        customer.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("block_size"),
             (F.count("*") * (F.count("*") - 1) / 2).cast("long")
             .alias("pair_cost"))
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
               CAST(ROUND(ABS(l.c_acctbal - r.c_acctbal) * 100, 0) AS BIGINT)
                   AS balance_gap_cents
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
                F.round(F.abs(F.col("l_bal") - F.col("r_bal")) * 100, 0)
                .cast("long").alias("balance_gap_cents"))
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
    # r11 optimization (guide §2.4): both star windows are computed ONCE
    # into a shared base frame, and the group minima they expose seed
    # the propagation (init_labels) — the first hop of label flow
    # happens inside the window pass that exists anyway, so the loop
    # converges in 3 rounds instead of 4 (one full-graph shuffle +
    # driver round trip saved; labels pinned identical in
    # tests/test_scale_patterns.py).
    # r12 (judge r11 #5): the r11 base localCheckpoint(eager=False) is
    # DROPPED — the driver measured e5 cold 0.88×, and the interleaved
    # A/B this round confirms the checkpoint's materialization write
    # costs more than the re-run of the cheap chained-window subplan
    # per consumer (numbers in OPTIMIZATION_r12.md). The seeding (the
    # structural win) is kept.
    customer = load(spark, sf_dir, "customer")
    w_nat = F.min("c_custkey").over(
        Window.partitionBy("c_nationkey", "c_mktsegment"))
    w_bal = F.min("c_custkey").over(
        Window.partitionBy("c_mktsegment", F.floor(F.col("c_acctbal") / 1000)))
    base = customer.select(F.col("c_custkey").alias("src"),
                           w_nat.alias("m1"), w_bal.alias("m2"))
    e1 = base.select("src", F.col("m1").alias("dst")).filter("src <> dst")
    e2 = base.select("src", F.col("m2").alias("dst")).filter("src <> dst")
    edges = e1.union(e2).distinct()
    vertices = base.select(F.col("src").alias("id"))
    seed = base.select(F.col("src").alias("id"),
                       F.least("src", "m1", "m2").alias("component"))
    cc = connected_components(vertices, edges, init_labels=seed)
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
    oracle=e6_oracle("""
        SELECT COUNT(*) AS total_rows,
               ROUND(100.0 * AVG(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END), 2)
                   AS positive_balance_pct,
               ROUND(AVG(c_acctbal), 2) AS avg_balance
        FROM customer
    """, "positive_balance_pct", "avg_balance"),
)
def a2_presence_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return scale_e6(
        customer.agg(
            F.count("*").alias("total_rows"),
            F.round(100.0 * F.avg((F.col("c_acctbal") > 0).cast("int")), 2)
            .alias("positive_balance_pct"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_balance")),
        "positive_balance_pct", "avg_balance")


# --------------------------------------------------------------------------
# E7: weighted first-name vote (grouped, not SQL-expressible)
# --------------------------------------------------------------------------


_DUCK_FIRST_NAME_VOTE = """
        WITH members AS (
            SELECT c_custkey % 300 AS cluster_id,
                   CASE WHEN c_custkey % 5 = 0 THEN 'linkedin'
                        ELSE 'gmail' END AS source,
                   CASE WHEN c_custkey % 2 = 0 THEN 'Bill'
                        ELSE 'William' END AS first_name
            FROM customer
        ),
        explicit_votes AS (
            SELECT cluster_id, lower(first_name) AS key,
                   MIN(first_name) AS cased,
                   SUM(CASE WHEN source = 'linkedin'
                            THEN 2.0 ELSE 1.0 END) AS score,
                   TRUE AS is_explicit
            FROM members GROUP BY cluster_id, lower(first_name)
        ),
        guess_votes AS (
            -- every member carries email local 'will.smithN' → guess
            -- 'Will' at 1.5 per record (merge_core.py:210-218)
            SELECT cluster_id, 'will' AS key, 'Will' AS cased,
                   1.5 * COUNT(*) AS score, FALSE AS is_explicit
            FROM members GROUP BY cluster_id
        ),
        votes AS (
            SELECT * FROM explicit_votes UNION ALL SELECT * FROM guess_votes
        )
        SELECT cluster_id, best_first, vote_key FROM (
            SELECT cluster_id, cased AS best_first, key AS vote_key,
                   ROW_NUMBER() OVER (PARTITION BY cluster_id
                       ORDER BY is_explicit DESC, score DESC, key) AS rn
            FROM votes
        ) WHERE rn = 1 ORDER BY cluster_id
"""


@query(
    "e7_first_name_vote",
    survey="E7",
    doc="choose_best_first_name (normalization.py:738-780): per cluster, "
        "weighted vote over explicit names and email-local guesses with "
        "fuzzy key pooling (seq_ratio >= 0.9). collect_list + mapInPandas "
        "over the pure vote core. The oracle re-expresses the vote in "
        "SQL: on this dataset the candidate keys are {bill, william, "
        "will}, whose pairwise seq_ratios (0.55/0.75/0.73) are all "
        "below the 0.9 pooling threshold, and explicit names always "
        "out-rank guesses — so weighted argmax with explicit preference "
        "is exactly equivalent; the pooling branch itself is pinned in "
        "tests/test_pipeline_contracts.py.",
    oracle=_DUCK_FIRST_NAME_VOTE,
)
def e7_first_name_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from contacts_etl_phase21_spark.functions.merge_core import (
        choose_best_first_name,
    )

    customer = load(spark, sf_dir, "customer")
    # synthetic clusters of ~5 with mixed sources and name variants
    members = customer.select(
        (F.col("c_custkey") % 300).alias("cluster_id"),
        F.when(F.col("c_custkey") % 5 == 0, "linkedin")
        .otherwise("gmail").alias("source"),
        F.when(F.col("c_custkey") % 2 == 0, "Bill")
        .otherwise("William").alias("first_name"),
        F.array(F.struct(
            F.concat(F.lit("will.smith"),
                     (F.col("c_custkey") % 7).cast("string"),
                     F.lit("@x.com")).alias("value"),
            F.lit("home").alias("label"))).alias("emails"))
    grouped = members.groupBy("cluster_id").agg(
        F.collect_list(F.struct("source", "first_name", "emails"))
        .alias("_members"))
    out_schema = StructType([
        StructField("cluster_id", LongType()),
        StructField("best_first", StringType()),
        StructField("vote_key", StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, packed in zip(pdf["cluster_id"], pdf["_members"]):
                records = [{"source": m["source"],
                            "first_name": m["first_name"],
                            "emails": [dict(e) for e in m["emails"]]}
                           for m in packed]
                name, key = choose_best_first_name(records)
                rows.append((int(cid), name, key))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return grouped.mapInPandas(run, out_schema).orderBy("cluster_id")


# --------------------------------------------------------------------------
# N2: email-collection dedupe with label upgrade (window-function oracle)
# --------------------------------------------------------------------------


@query(
    "n2_email_dedup_label_upgrade",
    survey="N2,N5",
    doc="normalize_email_collection's dedupe lattice "
        "(normalization.py:543-570): first occurrence of a value wins "
        "position, but an empty label is upgraded by the first labeled "
        "duplicate. Spark: groupBy(value) + min(seq) + min_by over "
        "labeled entries; oracle: the same as window SQL.",
    oracle="""
        SELECT owner, value,
               COALESCE(MIN(CASE WHEN label <> '' THEN label END), '')
                   AS label,
               MIN(seq) AS first_seq
        FROM (SELECT c_custkey % 100 AS owner,
                     'addr' || CAST(c_custkey % 17 AS VARCHAR) || '@x.com'
                         AS value,
                     CASE WHEN c_custkey % 3 = 0 THEN 'work'
                          WHEN c_custkey % 3 = 1 THEN '' ELSE 'home' END
                         AS label,
                     c_custkey AS seq
              FROM customer)
        GROUP BY owner, value
        ORDER BY owner, value
    """,
)
def n2_email_dedup_label_upgrade(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    entries = customer.select(
        (F.col("c_custkey") % 100).alias("owner"),
        F.concat(F.lit("addr"), (F.col("c_custkey") % 17).cast("string"),
                 F.lit("@x.com")).alias("value"),
        F.when(F.col("c_custkey") % 3 == 0, "work")
        .when(F.col("c_custkey") % 3 == 1, "").otherwise("home")
        .alias("label"),
        F.col("c_custkey").alias("seq"))
    # min() skips NULLs, so nullif turns 'no labeled duplicate' into ''
    return (entries.groupBy("owner", "value")
            .agg(F.coalesce(F.min(F.when(F.col("label") != "",
                                         F.col("label"))), F.lit(""))
                 .alias("label"),
                 F.min("seq").alias("first_seq"))
            .orderBy("owner", "value"))
