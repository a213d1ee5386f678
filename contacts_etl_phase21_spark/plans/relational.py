"""Relational core: projections/filters (P1-P6), joins (J1-J6),
aggregations (A1-A6), scoring expressions (C1-C6), sorts (O1-O3),
window-shaped survivorship (E6) — re-expressed over the synthetic
TPC-H-ish tables.

Reference citations (behavioral models) are to /root/reference/:
- P2 flatten-first-per-label: combine_contacts.py:1488-1514
- P5 duplicate-id assertion:  combine_contacts.py:1519-1525
- J1 blocked similarity join: combine_contacts.py:1116-1152
- E6 survivorship rank:       combine_contacts.py:243-277
- A3 bucket histogram:        confidence_report.py:239-262
- A4 notes concat:            tag_contacts.py:96-107
- C2 quality score:           validate_quality.py:174-190
- C3/C4 confidence score:     confidence_report.py:110-232
- C6 referral priority:       tagging.py:102-122
- O1 referral ranking:        tag_contacts.py:174-176

Scale notes are inline: which side broadcasts, where the shuffles are,
and why the plan survives 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from contacts_etl_phase21_spark.io import load, widen
from contacts_etl_phase21_spark.plans.registry import (
    cents_oracle, e4_oracle, e6_oracle, fixed_oracle, query, scale_cents,
    scale_e4, scale_e6, scale_fixed,
)

# --------------------------------------------------------------------------
# Flagship: scan → filter → join → agg → sort (TPC-H Q3 shape).
# --------------------------------------------------------------------------


@query(
    "flagship_shipping_priority",
    survey="S1,P-family,J2,A1,O1",
    doc="TPC-H Q3-shaped flagship: filtered 3-way join, grouped revenue, top-k. "
        "customer filter is pushed to the parquet scan; orders⋈lineitem shuffles "
        "on orderkey; top-10 via sort+limit (Spark TakeOrderedAndProject). "
        "revenue emitted as cents BIGINT per the no-raw-doubles rule "
        "(ordering still on the rounded double, so the top-10 cut is "
        "unchanged).",
    oracle=cents_oracle("""
        SELECT l_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """, "revenue"),
)
def flagship_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return scale_cents(
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue"),
        "revenue")


# --------------------------------------------------------------------------
# A1-shape: grouped pricing summary (TPC-H Q1) — map-side partial aggs.
# --------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    survey="A1,A2,C-family",
    doc="Q1-shaped grouped aggregation: 6 groups, partial aggregation map-side "
        "(hash agg + WholeStageCodegen) so the shuffle moves 6 rows/partition, "
        "not 100 TB. Sums emitted as cents, averages as e4 BIGINTs "
        "(no-raw-doubles rule).",
    oracle=e4_oracle(cents_oracle("""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
               ROUND(AVG(l_discount), 4)                                    AS avg_disc,
               COUNT(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """, "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"),
        "avg_qty", "avg_price", "avg_disc"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return scale_e4(
        scale_cents(out, "sum_qty", "sum_base_price", "sum_disc_price",
                    "sum_charge"),
        "avg_qty", "avg_price", "avg_disc")


# --------------------------------------------------------------------------
# P2: flatten "first item per label" pivot (combine_contacts.py:1488-1514).
# Orders play the role of labeled channel items; status = label.
# --------------------------------------------------------------------------


@query(
    "p2_first_per_label_pivot",
    survey="P2,P3",
    doc="Per customer pick the FIRST (earliest, min-key tiebreak) order date per "
        "status — the flattened home/work/other pivot shape. Spark: groupBy+pivot "
        "with min aggregate; single shuffle on the group key.",
    oracle="""
        SELECT o_custkey,
               MIN(o_orderdate) FILTER (WHERE o_orderstatus = 'O') AS first_open,
               MIN(o_orderdate) FILTER (WHERE o_orderstatus = 'F') AS first_filled,
               MIN(o_orderdate) FILTER (WHERE o_orderstatus = 'P') AS first_partial
        FROM orders
        GROUP BY o_custkey
    """,
)
def p2_first_per_label_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # Explicit pivot values → single-pass, no extra distinct-values job.
    return (
        orders.groupBy("o_custkey")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.min("o_orderdate"))
        .select(
            "o_custkey",
            F.col("O").alias("first_open"),
            F.col("F").alias("first_filled"),
            F.col("P").alias("first_partial"),
        )
    )


# --------------------------------------------------------------------------
# P3: valid-channel filter via array higher-order functions.
# --------------------------------------------------------------------------


@query(
    "p3_hof_channel_filter",
    survey="P3,C1,N5",
    doc="Collect each customer's order statuses into an array, then count "
        "'valid' entries with higher-order filter(size(filter(arr, ...))) — the "
        "channel-validity shape of validate_quality.py:21-57, kept JVM-side.",
    oracle="""
        SELECT o_custkey,
               COUNT(*)                                            AS order_total,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS BIGINT) AS open_count
        FROM orders
        GROUP BY o_custkey
    """,
)
def p3_hof_channel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.collect_list("o_orderstatus").alias("statuses"))
        .select(
            "o_custkey",
            F.size("statuses").cast("long").alias("order_total"),
            F.size(F.filter("statuses", lambda s: s != F.lit("F")))
            .cast("long").alias("open_count"),
        )
    )


# --------------------------------------------------------------------------
# P4: conditional null-out predicate (linkedin-url keep rule).
# --------------------------------------------------------------------------


@query(
    "p4_conditional_keep",
    survey="P4,F24",
    doc="when(contains).otherwise('') — the linkedin.com URL keep rule "
        "(combine_contacts.py:303-305) applied to p_type.",
    oracle="""
        SELECT p_partkey,
               CASE WHEN lower(p_type) LIKE '%promo%' THEN p_type ELSE '' END AS promo_type
        FROM part
    """,
)
def p4_conditional_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.when(F.lower(F.col("p_type")).contains("promo"), F.col("p_type"))
        .otherwise(F.lit("")).alias("promo_type"),
    )


# --------------------------------------------------------------------------
# P5/A5: duplicate-key assertion (combine_contacts.py:1519-1525).
# --------------------------------------------------------------------------


@query(
    "p5_duplicate_key_check",
    survey="P5,A5",
    doc="groupBy(key).count().filter(count>1) — the duplicate contact_id "
        "assertion as a dataframe; at scale this is a cheap partial-agg job.",
    oracle="""
        SELECT o_custkey, COUNT(*) AS order_count
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) > 1
    """,
)
def p5_duplicate_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .filter(F.col("order_count") > 1)
    )


# --------------------------------------------------------------------------
# J1/E1/E2: blocked similarity self-join — the ER candidate generator.
# --------------------------------------------------------------------------


@query(
    "j1_blocked_similarity_selfjoin",
    survey="J1,E1,E2,E3",
    doc="Self-equi-join on a blocking key with l.id<r.id residual and an edit-"
        "distance predicate — the candidate-pair generator of the dedupe core "
        "(combine_contacts.py:1116-1152). Blocking turns O(n²) into "
        "O(Σ|block|²); AQE skew-join splits hot blocks at scale.",
    oracle="""
        SELECT l.c_nationkey AS block_nation,
               l.c_mktsegment AS block_segment,
               COUNT(*) AS pair_count
        FROM customer l
        JOIN customer r
          ON l.c_nationkey = r.c_nationkey
         AND l.c_mktsegment = r.c_mktsegment
         AND l.c_custkey < r.c_custkey
        WHERE levenshtein(l.c_name, r.c_name) <= 2
        GROUP BY 1, 2
    """,
)
def j1_blocked_similarity_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: AQE broadcasts the right side, so the levenshtein pair loop
    # runs on the streamed side's scan tasks — which must not be 1.
    # r11 (guide §2.4 "remove shuffles outright" + §3.1 "check the
    # build side"): only the STREAMED side is widened — the build side
    # feeds a BroadcastExchange, so a round-robin repartition before
    # it was a wasted Exchange. The broadcast must then be PINNED to
    # the unwidened side: left free, AQE picked BuildLeft and streamed
    # the 1-task right scan, putting the whole levenshtein loop on one
    # core (measured 0.87 → 5.2s before the hint was added).
    c_raw = load(spark, sf_dir, "customer")
    c = widen(c_raw)
    left = c.select(
        F.col("c_custkey").alias("l_key"), F.col("c_name").alias("l_name"),
        F.col("c_nationkey").alias("block_nation"),
        F.col("c_mktsegment").alias("block_segment"))
    right = c_raw.select(
        F.col("c_custkey").alias("r_key"), F.col("c_name").alias("r_name"),
        F.col("c_nationkey").alias("block_nation"),
        F.col("c_mktsegment").alias("block_segment"))
    return (
        left.join(broadcast(right), ["block_nation", "block_segment"])
        .filter(F.col("l_key") < F.col("r_key"))
        # r11 (guide §1.2 step 2, per-task work): the 3-arg bounded
        # levenshtein short-circuits once the distance exceeds 2
        # (returns -1), turning the O(|a|·|b|) DP into O(k·|a|) on the
        # ~1M-pair hot loop; `>= 0` ≡ the old `<= 2` exactly.
        .filter(F.levenshtein("l_name", "r_name", 2) >= 0)
        .groupBy("block_nation", "block_segment")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


# --------------------------------------------------------------------------
# J2: left equi-join with missing-side defaults (validate_quality.py:197-219).
# --------------------------------------------------------------------------


@query(
    "j2_left_join_metrics",
    survey="J2,J5,A2",
    doc="customers left-joined to per-customer order metrics; absent side → "
        "0 defaults (the contacts⟕validation join). Aggregate before the join "
        "so the shuffle carries one row per key.",
    oracle=cents_oracle("""
        SELECT c_custkey, c_mktsegment,
               CAST(COALESCE(o.order_count, 0) AS BIGINT)  AS order_count,
               ROUND(COALESCE(o.total_spend, 0.0), 2)      AS total_spend
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS order_count, SUM(o_totalprice) AS total_spend
            FROM orders GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey
    """, "total_spend"),
)
def j2_left_join_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"),
             F.sum("o_totalprice").alias("total_spend"))
    )
    return scale_cents(
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            "c_custkey", "c_mktsegment",
            F.coalesce(F.col("order_count"), F.lit(0)).cast("long").alias("order_count"),
            F.round(F.coalesce(F.col("total_spend"), F.lit(0.0)), 2).alias("total_spend"),
        ),
        "total_spend")


# --------------------------------------------------------------------------
# J3/J4: broadcast dimension joins (the dict-lookup joins of the reference).
# --------------------------------------------------------------------------


@query(
    "j3_broadcast_dim_join",
    survey="J3,J4,J6",
    doc="Fact⋈small-dims revenue rollup (Q5 shape). nation/region are "
        "broadcast — the Spark analog of the reference's in-memory dict lookups "
        "(validate_quality.py:91-104); no shuffle for the dim sides.",
    oracle=cents_oracle("""
        SELECT r_name AS region_name, n_name AS nation_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """, "revenue"),
)
def j3_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return scale_cents(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue")),
        "revenue")


# --------------------------------------------------------------------------
# A3: bucket histogram with percentage (confidence_report.py:239-262).
# --------------------------------------------------------------------------


@query(
    "a3_bucket_histogram",
    survey="A3,C4,F25",
    doc="CASE-bucketing + count + pct-of-total — the confidence bucket summary. "
        "pct via a scalar total (tiny cross-join / window over empty frame).",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN o_totalprice >= 300000 THEN 'very_high'
                        WHEN o_totalprice >= 150000 THEN 'high'
                        WHEN o_totalprice >= 50000  THEN 'medium'
                        ELSE 'low' END AS bucket
            FROM orders
        )
        SELECT bucket, COUNT(*) AS bucket_count,
               CAST(ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER () * 10000, 0)
                    AS BIGINT) AS pct_e4
        FROM b GROUP BY bucket
    """,
)
def a3_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "very_high")
        .when(F.col("o_totalprice") >= 150000, "high")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("low")
    )
    counted = orders.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("bucket_count"))
    w = Window.partitionBy()
    return counted.select(
        "bucket", "bucket_count",
        F.round(100.0 * F.col("bucket_count")
                / F.sum("bucket_count").over(w) * 10000, 0)
        .cast("long").alias("pct_e4"),
    )


# --------------------------------------------------------------------------
# A4/J6: ordered string-agg — the notes_blob join (tag_contacts.py:85-107).
# --------------------------------------------------------------------------


@query(
    "a4_ordered_concat_notes",
    survey="A4,J6,O3",
    doc="Per user, concatenate event payloads ordered by (ts, event_id) with "
        "' | ' — the lineage→notes_blob aggregation. Spark: sort_array over "
        "collect_list(struct) keeps it a single shuffle + deterministic order.",
    oracle="""
        SELECT user_id,
               STRING_AGG(event_type, ' | ' ORDER BY ts, event_id) AS notes_blob
        FROM events
        WHERE event_type IN ('signup', 'purchase')
        GROUP BY user_id
    """,
)
def a4_ordered_concat_notes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"]),
            " | ").alias("notes_blob"))
    )


# --------------------------------------------------------------------------
# A6: explode + count (invalid-email insight notebooks).
# --------------------------------------------------------------------------


@query(
    "a6_explode_word_count",
    survey="A6,F9",
    doc="split + explode + groupBy count — the notebook split('|')+explode "
        "diagnostics, as a word count over documents.",
    oracle="""
        SELECT w AS word, COUNT(*) AS cnt
        FROM (SELECT UNNEST(string_split(trim(text), ' ')) AS w FROM documents)
        WHERE w <> ''
        GROUP BY w
    """,
)
def a6_explode_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------------------------------
# E6: survivorship argmax via window (combine_contacts.py:243-277).
# --------------------------------------------------------------------------


@query(
    "e6_survivorship_rank",
    survey="E6,O3",
    doc="'newest timestamp wins, key tiebreak' field survivorship. "
        "r11: computed as max_by over a lexicographic struct key "
        "(guide §2.3 'aggregate before you shuffle'). Honest plan "
        "note: the struct ordering key is not hash-aggregable, so "
        "this plans as a SortAggregate partial/final pair — the map "
        "side sorts by the 1-column group key, aggregates, and the "
        "shuffle carries one row per key per map partition. Spark 4's "
        "window form gets close via WindowGroupLimit pushdown (its "
        "map side sorts by the full 3-column window key and ships "
        "rank-1 candidates); measured interleaved at sf0.1 the "
        "max_by form is ~9% faster (median 0.367s vs 0.404s noop) "
        "on the narrower sort key and no final window pass. "
        "Equivalent to the row_number()=1 window (the oracle keeps "
        "that form): max of (o_orderdate, -o_orderkey) is exactly "
        "'date DESC, key ASC' rank 1.",
    oracle="""
        SELECT o_custkey, o_orderkey AS latest_orderkey,
               o_orderpriority AS latest_priority
        FROM (
            SELECT o_custkey, o_orderkey, o_orderpriority,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
)
def e6_survivorship_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pick = F.max_by(
        F.struct(F.col("o_orderkey"), F.col("o_orderpriority")),
        F.struct(F.col("o_orderdate"), (-F.col("o_orderkey")).alias("nk")))
    return (
        orders.groupBy("o_custkey")
        .agg(pick.alias("latest"))
        .select("o_custkey",
                F.col("latest.o_orderkey").alias("latest_orderkey"),
                F.col("latest.o_orderpriority").alias("latest_priority"))
    )


# --------------------------------------------------------------------------
# E9-shape: cluster-level metadata aggregates.
# --------------------------------------------------------------------------


@query(
    "e9_cluster_metadata",
    survey="E9,A1",
    doc="countDistinct + count + sorted collect_set — source_count / "
        "source_row_count / union-of-sets metadata per cluster "
        "(combine_contacts.py:1268-1275), nation playing the cluster.",
    oracle="""
        SELECT c_nationkey,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS source_count,
               COUNT(*) AS source_row_count,
               LIST_AGGREGATE(LIST_SORT(LIST(DISTINCT c_mktsegment)), 'string_agg', '|')
                   AS segments_sorted
        FROM customer
        GROUP BY c_nationkey
    """,
)
def e9_cluster_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_mktsegment").alias("source_count"),
            F.count(F.lit(1)).alias("source_row_count"),
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|")
            .alias("segments_sorted"),
        )
    )


# --------------------------------------------------------------------------
# C2: quality score (validate_quality.py:174-190 weights on synthetic stats).
# --------------------------------------------------------------------------


@query(
    "c2_quality_score",
    survey="C2,C1",
    doc="The 40/20 + 30/15 + 30 quality-score CASE lattice, computed from "
        "per-customer order stats standing in for email/phone/address counts. "
        "Pure column arithmetic → whole-stage codegen.",
    oracle="""
        WITH stats AS (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS total,
                   CAST(COUNT(o.o_orderkey) FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT) AS valid_f,
                   CAST(COUNT(o.o_orderkey) FILTER (WHERE o.o_orderpriority IN ('1-URGENT','2-HIGH')) AS BIGINT) AS valid_p,
                   CAST(COUNT(o.o_orderkey) FILTER (WHERE o.o_totalprice > 100000) AS BIGINT) AS valid_a
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        SELECT c_custkey, total, valid_f, valid_p, valid_a,
               CAST(
                 (CASE WHEN total > 0 AND valid_f = total THEN 40
                       WHEN valid_f > 0 THEN 20 ELSE 0 END) +
                 (CASE WHEN total > 0 AND valid_p = total THEN 30
                       WHEN valid_p > 0 THEN 15 ELSE 0 END) +
                 (CASE WHEN valid_a > 0 THEN 30 ELSE 0 END)
               AS INT) AS quality_score
        FROM stats
    """,
)
def c2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.3): pre-aggregate orders per o_custkey before the
    # join (map-side combine; shuffle = one row per customer) instead
    # of shipping every order row through the join and re-shuffling
    # the joined frame. No-order customers coalesce to all-zero
    # counts — identical to count() over an empty left-join group.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("__t"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("__f"),
            F.count(F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .alias("__p"),
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("__a"),
        )
    )
    stats = (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("__t"), F.lit(0)).alias("total"),
            F.coalesce(F.col("__f"), F.lit(0)).alias("valid_f"),
            F.coalesce(F.col("__p"), F.lit(0)).alias("valid_p"),
            F.coalesce(F.col("__a"), F.lit(0)).alias("valid_a"),
        )
    )
    email_pts = (
        F.when((F.col("total") > 0) & (F.col("valid_f") == F.col("total")), 40)
        .when(F.col("valid_f") > 0, 20).otherwise(0)
    )
    phone_pts = (
        F.when((F.col("total") > 0) & (F.col("valid_p") == F.col("total")), 30)
        .when(F.col("valid_p") > 0, 15).otherwise(0)
    )
    addr_pts = F.when(F.col("valid_a") > 0, 30).otherwise(0)
    return stats.select(
        "c_custkey", "total", "valid_f", "valid_p", "valid_a",
        (email_pts + phone_pts + addr_pts).cast("int").alias("quality_score"),
    )


# --------------------------------------------------------------------------
# C3/C4: confidence score + bucket (confidence_report.py:110-232).
# --------------------------------------------------------------------------


@query(
    "c3_confidence_score",
    survey="C3,C4",
    doc="Weighted additive confidence score with least/greatest clamp and the "
        "very_high/high/medium/low bucket CASE — single withColumn expression.",
    oracle="""
        WITH m AS (
            SELECT c.c_custkey,
                   c.c_acctbal,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
                   COALESCE(SUM(o.o_totalprice), 0.0) AS spend
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_acctbal
        )
        SELECT c_custkey,
               CAST(FLOOR(LEAST(100.0, GREATEST(0.0,
                    0.4 * LEAST(c_acctbal / 100.0, 100.0)
                  + LEAST(5.0 * n_orders, 20.0)
                  + (CASE WHEN n_orders >= 3 THEN 10 WHEN n_orders = 2 THEN 6 ELSE 2 END)
                  + (CASE WHEN spend > 500000 THEN 6 ELSE 0 END)
                  + (CASE WHEN c_acctbal > 0 THEN 3 ELSE -5 END)
               ))) AS INT) AS confidence_score,
               CASE WHEN CAST(FLOOR(LEAST(100.0, GREATEST(0.0,
                    0.4 * LEAST(c_acctbal / 100.0, 100.0)
                  + LEAST(5.0 * n_orders, 20.0)
                  + (CASE WHEN n_orders >= 3 THEN 10 WHEN n_orders = 2 THEN 6 ELSE 2 END)
                  + (CASE WHEN spend > 500000 THEN 6 ELSE 0 END)
                  + (CASE WHEN c_acctbal > 0 THEN 3 ELSE -5 END)
               ))) AS INT) >= 80 THEN 'very_high'
                    WHEN CAST(FLOOR(LEAST(100.0, GREATEST(0.0,
                    0.4 * LEAST(c_acctbal / 100.0, 100.0)
                  + LEAST(5.0 * n_orders, 20.0)
                  + (CASE WHEN n_orders >= 3 THEN 10 WHEN n_orders = 2 THEN 6 ELSE 2 END)
                  + (CASE WHEN spend > 500000 THEN 6 ELSE 0 END)
                  + (CASE WHEN c_acctbal > 0 THEN 3 ELSE -5 END)
               ))) AS INT) >= 60 THEN 'high'
                    WHEN CAST(FLOOR(LEAST(100.0, GREATEST(0.0,
                    0.4 * LEAST(c_acctbal / 100.0, 100.0)
                  + LEAST(5.0 * n_orders, 20.0)
                  + (CASE WHEN n_orders >= 3 THEN 10 WHEN n_orders = 2 THEN 6 ELSE 2 END)
                  + (CASE WHEN spend > 500000 THEN 6 ELSE 0 END)
                  + (CASE WHEN c_acctbal > 0 THEN 3 ELSE -5 END)
               ))) AS INT) >= 40 THEN 'medium'
                    ELSE 'low' END AS confidence_bucket
        FROM m
    """,
)
def c3_confidence_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.3 "aggregate before you shuffle"): orders are
    # pre-aggregated per o_custkey BEFORE the join (map-side partial
    # aggregation → the shuffle carries one row per customer, not one
    # per order), then joined to customer — the same shape j2 already
    # used. The old join-then-groupBy shipped every order row through
    # the join and re-shuffled the joined frame. A no-order customer
    # gets n_orders 0 / spend 0.0 via the left-join coalesce, exactly
    # the old count(o_orderkey)=0 / coalesce(sum, 0) semantics.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum("o_totalprice").alias("__spend"))
    )
    m = (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", "c_acctbal",
                F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"),
                F.coalesce(F.col("__spend"), F.lit(0.0)).alias("spend"))
    )
    raw = (
        0.4 * F.least(F.col("c_acctbal") / 100.0, F.lit(100.0))
        + F.least(5.0 * F.col("n_orders"), F.lit(20.0))
        + F.when(F.col("n_orders") >= 3, 10).when(F.col("n_orders") == 2, 6).otherwise(2)
        + F.when(F.col("spend") > 500000, 6).otherwise(0)
        + F.when(F.col("c_acctbal") > 0, 3).otherwise(-5)
    )
    score = F.floor(F.least(F.lit(100.0), F.greatest(F.lit(0.0), raw))).cast("int")
    bucket = (
        F.when(score >= 80, "very_high").when(score >= 60, "high")
        .when(score >= 40, "medium").otherwise("low")
    )
    return m.select(
        "c_custkey", score.alias("confidence_score"),
        bucket.alias("confidence_bucket"))


# --------------------------------------------------------------------------
# C5/C6/O1: tag rules + referral priority + ranking (tagging.py; tag_contacts.py).
# --------------------------------------------------------------------------


@query(
    "c5_tag_rules",
    survey="C5,F24,F23",
    doc="Keyword-regex tagging over a text blob + precedence CASE for the "
        "primary category (tagging.py:51-100), over documents.",
    oracle="""
        SELECT doc_id,
               CAST(regexp_matches(text, 'vector|stream') AS BOOLEAN)  AS tag_streaming,
               CAST(regexp_matches(text, 'join|merge') AS BOOLEAN)     AS tag_relational,
               CASE WHEN regexp_matches(text, 'vector|stream') THEN 'streaming'
                    WHEN regexp_matches(text, 'join|merge')   THEN 'relational'
                    WHEN lang <> 'en'                          THEN 'international'
                    ELSE 'uncategorized' END AS category
        FROM documents
    """,
)
def c5_tag_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    streaming = F.col("text").rlike("vector|stream")
    relational = F.col("text").rlike("join|merge")
    return docs.select(
        "doc_id",
        streaming.alias("tag_streaming"),
        relational.alias("tag_relational"),
        F.when(streaming, "streaming")
        .when(relational, "relational")
        .when(F.col("lang") != "en", "international")
        .otherwise("uncategorized").alias("category"),
    )


@query(
    "c6_referral_priority_rank",
    survey="C6,O1",
    doc="min(100, round(0.6·score + Σ tag_weights)) + full desc sort — the "
        "referral_targets ranking (tagging.py:102-122, tag_contacts.py:174-176).",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   CAST(LEAST(100, ROUND(
                        0.6 * LEAST(n_chars / 5.0, 100.0)
                      + (CASE WHEN regexp_matches(text, 'vector|stream') THEN 30 ELSE 0 END)
                      + (CASE WHEN regexp_matches(text, 'join|merge') THEN 20 ELSE 0 END)
                      + (CASE WHEN lang = 'en' THEN 10 ELSE 0 END)
                   )) AS INT) AS referral_priority_score,
                   n_chars
            FROM documents
        )
        SELECT doc_id, referral_priority_score
        FROM scored
        ORDER BY referral_priority_score DESC, n_chars DESC, doc_id ASC
        LIMIT 50
    """,
)
def c6_referral_priority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    score = F.least(
        F.lit(100),
        F.round(
            0.6 * F.least(F.col("n_chars") / 5.0, F.lit(100.0))
            + F.when(F.col("text").rlike("vector|stream"), 30).otherwise(0)
            + F.when(F.col("text").rlike("join|merge"), 20).otherwise(0)
            + F.when(F.col("lang") == "en", 10).otherwise(0)
        ).cast("int"),
    )
    return (
        docs.select("doc_id", score.alias("referral_priority_score"), "n_chars")
        .orderBy(F.desc("referral_priority_score"), F.desc("n_chars"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", "referral_priority_score")
    )
