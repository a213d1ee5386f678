"""Scalar-function queries (SURVEY.md §2.3) over the synthetic tables.

Each query exercises one function family through the engine's Column
builders (JVM tier) or pandas UDFs, with a DuckDB oracle where the
semantics are SQL-expressible. The pandas-UDF-only families
(difflib seq_ratio) run as rows-only checks plus unit tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.functions.spark_cols import (
    col_clean_email,
    col_email_domain,
    col_fold_text,
    col_phone_e164_fallback,
    col_pct,
    udf_seq_ratio,
)
from contacts_etl_phase21_spark.io import load, widen
from contacts_etl_phase21_spark.plans.registry import e6_oracle, query, scale_e6


@query(
    "f1_fold_text_key",
    survey="F1,F26",
    doc="normalize_text_key as a column expression: trim, collapse "
        "whitespace, lower (normalization.py:241-247; ASCII fast path — "
        "NFKD tier is udf_fold_text, unit-tested).",
    oracle="""
        SELECT doc_id,
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS text_key
        FROM documents
    """,
)
def f1_fold_text_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", col_fold_text(F.col("text")).alias("text_key"))


@query(
    "f6_phone_e164_ladder",
    survey="F6,F5",
    doc="The E.164 fallback ladder (normalization.py:297-327) as a pure "
        "when-chain over deterministic phone-shaped strings built from "
        "order keys — 10-digit, 11-digit-leading-1, 12+, and '+' cases.",
    oracle="""
        WITH raw AS (
            SELECT o_orderkey,
                   CASE o_orderkey % 4
                     WHEN 0 THEN printf('(%03d) 555-%04d', o_orderkey % 800, o_orderkey % 10000)
                     WHEN 1 THEN printf('1-%03d-555-%04d', o_orderkey % 800, o_orderkey % 10000)
                     WHEN 2 THEN printf('+44 20 %04d %04d', o_orderkey % 10000, (o_orderkey * 7) % 10000)
                     ELSE printf('%03d555%04d12345', o_orderkey % 800, o_orderkey % 10000)
                   END AS raw_phone
            FROM orders
        )
        SELECT o_orderkey, raw_phone,
               CASE
                 WHEN raw_phone = '' THEN ''
                 WHEN length(regexp_replace(raw_phone, '\\D', '', 'g')) = 10
                   THEN '+1' || regexp_replace(raw_phone, '\\D', '', 'g')
                 WHEN length(regexp_replace(raw_phone, '\\D', '', 'g')) = 11
                      AND regexp_replace(raw_phone, '\\D', '', 'g') LIKE '1%'
                   THEN '+' || regexp_replace(raw_phone, '\\D', '', 'g')
                 WHEN length(regexp_replace(raw_phone, '\\D', '', 'g')) BETWEEN 12 AND 15
                      AND raw_phone NOT LIKE '+%'
                   THEN '+' || regexp_replace(raw_phone, '\\D', '', 'g')
                 WHEN raw_phone LIKE '+%'
                   THEN '+' || regexp_replace(raw_phone, '\\D', '', 'g')
                 WHEN length(regexp_replace(raw_phone, '\\D', '', 'g')) > 0
                   THEN '+1' || regexp_replace(raw_phone, '\\D', '', 'g')
                 ELSE raw_phone
               END AS e164
        FROM raw
    """,
)
def f6_phone_e164_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = (
        F.when(k % 4 == 0, F.format_string("(%03d) 555-%04d", k % 800, k % 10000))
        .when(k % 4 == 1, F.format_string("1-%03d-555-%04d", k % 800, k % 10000))
        .when(k % 4 == 2, F.format_string("+44 20 %04d %04d", k % 10000, (k * 7) % 10000))
        .otherwise(F.format_string("%03d555%04d12345", k % 800, k % 10000))
    )
    return orders.select(
        "o_orderkey", raw.alias("raw_phone"),
        col_phone_e164_fallback(raw).alias("e164"))


@query(
    "f11_guess_name_from_local",
    survey="F11,F23,F4",
    doc="Email local-part name guessing (normalization.py:680-684) + "
        "domain extraction + regex-tier validation, over emails built "
        "from part names ('cold widget' → 'cold.widget@parts.example').",
    oracle="""
        WITH e AS (
            SELECT p_partkey,
                   replace(p_name, ' ', '.') || '@parts.example' AS email
            FROM part
        )
        SELECT p_partkey, email,
               split_part(email, '@', 2) AS domain,
               CASE WHEN length(string_split(split_part(email, '@', 1), '.')[1]) > 0
                    THEN upper(substr(string_split(split_part(email, '@', 1), '.')[1], 1, 1))
                         || substr(string_split(split_part(email, '@', 1), '.')[1], 2)
                    ELSE '' END AS first_guess,
               CASE WHEN length(string_split(split_part(email, '@', 1), '.')[2]) > 0
                    THEN upper(substr(string_split(split_part(email, '@', 1), '.')[2], 1, 1))
                         || substr(string_split(split_part(email, '@', 1), '.')[2], 2)
                    ELSE '' END AS last_guess
        FROM e
    """,
)
def f11_guess_name_from_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    email = F.concat(F.regexp_replace("p_name", " ", "."), F.lit("@parts.example"))
    local = F.substring_index(email, "@", 1)
    first_tok = F.element_at(F.split(local, r"\."), 1)
    last_tok = F.element_at(F.split(local, r"\."), 2)
    return part.select(
        "p_partkey", email.alias("email"),
        col_email_domain(email).alias("domain"),
        F.initcap(first_tok).alias("first_guess"),
        F.coalesce(F.initcap(last_tok), F.lit("")).alias("last_guess"),
    )


@query(
    "f16_seq_ratio_pairs",
    survey="F16,E3",
    doc="difflib SequenceMatcher ratio as an Arrow-batched pandas UDF "
        "over blocked name pairs — the merge-critical 0.88-threshold "
        "similarity (reference normalization.py:392-393). difflib has no "
        "SQL twin, so the oracle is a CERTIFICATE: both engines emit the "
        "deterministic pair geometry (lengths + Levenshtein distance — a "
        "real cross-engine check of JVM levenshtein vs DuckDB "
        "levenshtein) plus booleans the Spark side computes from the "
        "actual difflib ratio and the oracle asserts as constants: "
        "in_bounds (0 <= ratio <= min(2*min_len/(la+lb), "
        "1 - lev/(la+lb)); the upper bound holds because difflib's M "
        "matched pairs admit an edit script of la+lb-2M operations, so "
        "lev <= la+lb-2M ⟹ ratio = 2M/(la+lb) <= 1 - lev/(la+lb)) and "
        "ratio_exact (= 1.0 exactly on string-equal pairs, NULL "
        "otherwise; ratio = 1 ⟺ equality for difflib). Any difflib "
        "divergence flips a boolean / value and hash-mismatches.",
    oracle=e6_oracle("""
        WITH pairs AS (
            SELECT l.c_custkey AS l_key, r.c_custkey AS r_key,
                   l.c_name AS l_name, r.c_name AS r_name
            FROM customer l JOIN customer r
              ON l.c_custkey % 50 = r.c_custkey % 50
             AND l.c_custkey < r.c_custkey
        )
        SELECT l_key, r_key,
               CAST(length(l_name) AS INT) AS la,
               CAST(length(r_name) AS INT) AS lb,
               CAST(levenshtein(l_name, r_name) AS INT) AS lev,
               (l_name = r_name) AS is_exact,
               TRUE AS in_bounds,
               CASE WHEN l_name = r_name THEN 1.0 END AS ratio_exact
        FROM pairs
        ORDER BY l_key, r_key
    """, "ratio_exact"),
)
def f16_seq_ratio_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.5/§4.1): the streamed left side was the raw 1-task
    # scan, so the join's ~2.2M-pair output — and the difflib pandas
    # UDF over it — ran on ONE core (measured 166s noop at sf0.1).
    # widen() the streamed side and PIN the broadcast to the raw right
    # side (the j1 lesson: left free, AQE may flip build sides and
    # stream the 1-task scan). One ArrowEvalPython node before and
    # after — the UDF was never duplicated; parallelism was the gap.
    c = load(spark, sf_dir, "customer")
    left = widen(c).select(F.col("c_custkey").alias("l_key"),
                           F.col("c_name").alias("l_name"),
                           (F.col("c_custkey") % 50).alias("bucket"))
    right = c.select(F.col("c_custkey").alias("r_key"),
                     F.col("c_name").alias("r_name"),
                     (F.col("c_custkey") % 50).alias("bucket"))
    ratio = udf_seq_ratio(F.col("l_name"), F.col("r_name"))
    la = F.length("l_name")
    lb = F.length("r_name")
    lev = F.levenshtein("l_name", "r_name")
    total = (la + lb).cast("double")
    upper = F.least(F.lit(2.0) * F.least(la, lb) / total,
                    F.lit(1.0) - lev / total)
    eps = F.lit(1e-9)
    return scale_e6(
        left.join(F.broadcast(right), "bucket")
        .filter(F.col("l_key") < F.col("r_key"))
        .select("l_key", "r_key",
                la.alias("la"), lb.alias("lb"), lev.alias("lev"),
                (F.col("l_name") == F.col("r_name")).alias("is_exact"),
                ((ratio >= F.lit(0.0) - eps) & (ratio <= upper + eps))
                .alias("in_bounds"),
                F.when(F.col("l_name") == F.col("r_name"), ratio)
                .alias("ratio_exact"))
        .orderBy("l_key", "r_key"),
        "ratio_exact")


@query(
    "f17_timestamp_roundtrip",
    survey="F17",
    doc="LinkedIn-style 'd MMM yyyy' date render + tolerant re-parse "
        "(combine_contacts.py:325-336) as to_timestamp/date_format chains.",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%d %b %Y') AS rendered,
               strptime(strftime(o_orderdate, '%d %b %Y'), '%d %b %Y') AS reparsed
        FROM orders
    """,
)
def f17_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    rendered = F.date_format("o_orderdate", "dd MMM yyyy")
    return orders.select(
        "o_orderkey", rendered.alias("rendered"),
        F.to_timestamp(rendered, "dd MMM yyyy").alias("reparsed"))


@query(
    "f18_deterministic_id",
    survey="F18,E9",
    doc="Deterministic content id: sha2-256 over '|'-joined key material "
        "(Spark analog of uuid5, common.py:72-74) — stable across runs "
        "and engines.",
    oracle="""
        SELECT c_custkey,
               sha256(c_name || '|' || c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR))
                   AS contact_id
        FROM customer
    """,
)
def f18_deterministic_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    material = F.concat_ws("|", "c_name", "c_mktsegment",
                           F.col("c_nationkey").cast("string"))
    return c.select("c_custkey", F.sha2(material, 256).alias("contact_id"))


@query(
    "f25_pct_guarded",
    survey="F25,A2",
    doc="pct with zero-denominator guard (validate_quality.py:17-18) — "
        "share of 'F' orders per customer incl. customers with no orders.",
    oracle=e6_oracle("""
        SELECT c_custkey,
               CASE WHEN COUNT(o_orderkey) = 0 THEN 0.0
                    ELSE ROUND(100.0 * COUNT(o_orderkey) FILTER (WHERE o_orderstatus = 'F')
                               / COUNT(o_orderkey), 2) END AS filled_pct
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """, "filled_pct"),
)
def f25_pct_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return scale_e6(
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"),
             F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("nf"))
        .select("c_custkey",
                col_pct(F.col("nf"), F.col("n")).alias("filled_pct")),
        "filled_pct")


@query(
    "f4_clean_email_regex_tier",
    survey="F4,F9",
    doc="Regex-tier email validation (normalization.py:274-279): "
        "well-formed vs malformed constructed addresses; invalid → ''.",
    oracle="""
        WITH e AS (
            SELECT s_suppkey,
                   CASE WHEN s_suppkey % 3 = 0
                        THEN 'Contact ' || CAST(s_suppkey AS VARCHAR) || ' AT example.com'
                        ELSE 'contact' || CAST(s_suppkey AS VARCHAR) || '@Example.com '
                   END AS raw_email
            FROM supplier
        )
        SELECT s_suppkey,
               CASE WHEN regexp_matches(lower(replace(trim(raw_email), ' ', '')),
                         '^[a-z0-9._%+\\-'']+@[a-z0-9.\\-]+\\.[a-z]{2,}$')
                    THEN lower(replace(trim(raw_email), ' ', ''))
                    ELSE '' END AS email_norm
        FROM e
    """,
)
def f4_clean_email_regex_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    raw = (
        F.when(F.col("s_suppkey") % 3 == 0,
               F.concat(F.lit("Contact "), F.col("s_suppkey").cast("string"),
                        F.lit(" AT example.com")))
        .otherwise(F.concat(F.lit("contact"), F.col("s_suppkey").cast("string"),
                            F.lit("@Example.com ")))
    )
    return s.select("s_suppkey", col_clean_email(raw).alias("email_norm"))
