"""Coverage batch 2: map-lookup scalar functions (F2/F3), legacy render
(P1), per-group top-k (O2), and the flagship end-to-end contacts ER
pipeline driven from synthetic records.

The testdata has no state/country strings, so the F2/F3 queries derive
deterministic inputs from c_custkey (mod the mapping size) — the Spark
side goes string → broadcast-map lookup like production; the oracle
derives the expected code directly from the same modulus (SQL generated
from the same Python dict at registration time, so the two can only
agree if the lookup is right).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from contacts_etl_phase21_spark.functions.data import COUNTRY_ISO2, US_STATES
from contacts_etl_phase21_spark.io import load
from contacts_etl_phase21_spark.plans.registry import query

# --------------------------------------------------------------------------
# F2/F3: dict normalization as broadcast map lookup
# --------------------------------------------------------------------------

_STATES = sorted(US_STATES.items())        # [(name, code)...]
_COUNTRIES = sorted(COUNTRY_ISO2.items())


def _mod_case_sql(pairs: list[tuple[str, str]], out: str) -> str:
    whens = " ".join(f"WHEN {i} THEN '{code}'"
                     for i, (_, code) in enumerate(pairs))
    return (f"SELECT c_custkey, CASE (c_custkey % {len(pairs)}) {whens} END"
            f" AS {out} FROM customer ORDER BY c_custkey")


@query(
    "f2_state_code_lookup",
    survey="F2",
    doc="normalize_state (normalization.py:250-256) as a map-literal "
        "lookup: full state name → USPS code via a broadcast "
        "create_map — constant-folded JVM expression, no join, no "
        "shuffle. Input names derived deterministically from c_custkey.",
    oracle=_mod_case_sql(_STATES, "state_code"),
)
def f2_state_code_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    names = F.array(*[F.lit(name) for name, _ in _STATES])
    mapping = F.create_map(*[F.lit(x) for pair in _STATES for x in pair])
    state_name = F.element_at(
        names, (F.col("c_custkey") % len(_STATES)).cast("int") + 1)
    return (customer
            .select("c_custkey",
                    mapping[state_name].alias("state_code"))
            .orderBy("c_custkey"))


@query(
    "f3_country_iso2_lookup",
    survey="F3",
    doc="normalize_country_iso2 (normalization.py:259-263), same "
        "broadcast map-literal pattern over the ~60-alias country dict.",
    oracle=_mod_case_sql(_COUNTRIES, "country_code"),
)
def f3_country_iso2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    names = F.array(*[F.lit(name) for name, _ in _COUNTRIES])
    mapping = F.create_map(*[F.lit(x) for pair in _COUNTRIES for x in pair])
    alias = F.element_at(
        names, (F.col("c_custkey") % len(_COUNTRIES)).cast("int") + 1)
    return (customer
            .select("c_custkey", mapping[alias].alias("country_code"))
            .orderBy("c_custkey"))


# --------------------------------------------------------------------------
# P1: legacy "value::label|…" render
# --------------------------------------------------------------------------


@query(
    "p1_legacy_channel_render",
    survey="P1",
    doc="The consolidated-output channel serialization "
        "(combine_contacts.py:1457-1487): collect (value, label) structs "
        "per group, sort for determinism, render 'value::label|…'. One "
        "shuffle on the group key; the render is a pure projection.",
    oracle="""
        SELECT c_nationkey,
               STRING_AGG(c_custkey || '::' || c_mktsegment, '|'
                          ORDER BY c_custkey) AS emails_str
        FROM customer
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
)
def p1_legacy_channel_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("c_custkey", "c_mktsegment"))),
                lambda s: F.concat(s["c_custkey"].cast("string"),
                                   F.lit("::"), s["c_mktsegment"])),
            "|").alias("emails_str"))
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# O2: top-k per group (notebook insight views)
# --------------------------------------------------------------------------


@query(
    "o2_topk_per_group",
    survey="O2,O3",
    doc="Top-3 orders by total price per priority class: rank window + "
        "filter — the insight-notebook head-of-sorted-frame shape. "
        "Window shuffles once on the partition key; no global sort.",
    oracle="""
        SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey) AS INT)
                       AS rnk
            FROM orders)
        WHERE rnk <= 3
        ORDER BY o_orderpriority, rnk
    """,
)
def o2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority") \
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (orders
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
            .orderBy("o_orderpriority", "rnk"))


# --------------------------------------------------------------------------
# Flagship capability: the full contacts ER pipeline on synthetic records
# --------------------------------------------------------------------------

_FIRST_POOL = 97     # distinct first names
_LAST_POOL = 500     # distinct surnames → bounded block sizes


def synthetic_contact_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CONTACT_SCHEMA records derived from customer: one
    gmail record per customer; every third customer also has a linkedin
    record sharing the email → the ER core must merge those pairs."""
    customer = load(spark, sf_dir, "customer")
    first = F.concat(F.lit("First"),
                     (F.col("c_custkey") % _FIRST_POOL).cast("string"))
    last = F.concat(F.lit("Surname"),
                    (F.col("c_custkey") % _LAST_POOL).cast("string"))
    email = F.lower(F.concat(first, F.lit("."), last, F.lit("."),
                             F.col("c_custkey").cast("string"),
                             F.lit("@example.com")))

    def record(source: str, label: str) -> DataFrame:
        return customer.select(
            F.lit(source).alias("source"),
            F.col("c_custkey").cast("string").alias("source_row_id"),
            F.lit(None).cast("string").alias("source_timestamp"),
            F.concat(first, F.lit(" "), last).alias("full_name"),
            F.lit("").alias("prefix"), first.alias("first_name"),
            F.lit("").alias("middle_name"), last.alias("last_name"),
            F.lit("").alias("maiden_name"), F.lit("").alias("suffix"),
            F.lit("").alias("suffix_professional"),
            F.lit("").alias("nickname"),
            F.col("c_mktsegment").alias("company"),
            F.lit("").alias("title"), F.lit("").alias("department"),
            (F.when(F.lit(source == "linkedin"),
                    F.concat(F.lit("https://linkedin.com/in/"), email))
             .otherwise(F.lit(""))).alias("linkedin_url"),
            F.lit("").alias("notes"),
            F.array(F.struct(email.alias("value"),
                             F.lit(label).alias("label"))).alias("emails"),
            F.array().cast(
                "array<struct<value:string,label:string,extension:string>>")
            .alias("phones"),
            F.array().cast(
                "array<struct<po_box:string,extended:string,street:string,"
                "city:string,state:string,postal_code:string,country:string,"
                "label:string>>").alias("addresses"),
        )

    gmail = record("gmail", "home")
    linkedin = record("linkedin", "home").filter(
        F.col("source_row_id").cast("long") % 3 == 0)
    return gmail.unionByName(linkedin)


@query(
    "er_full_contacts_pipeline",
    survey="N1-N5,E1-E10,A1",
    doc="End-to-end flagship: synthetic contact records → normalization "
        "cascade → blocked similarity join → decision gates → connected "
        "components → survivorship merge. Every third customer has a "
        "gmail+linkedin pair sharing an email, which must merge; output "
        "is one row per resolved contact with lineage counts. Not "
        "SQL-expressible (fuzzy scoring + iterative components) → "
        "rows-only driver check here; full-pipeline output is instead "
        "held to CELL-LEVEL parity with the reference pipeline's nine "
        "CSV artifacts by tests/test_reference_parity.py "
        "(tools/parity_vs_reference.py), and merge semantics are pinned "
        "by tests/test_pipeline_contracts.py.",
    oracle=None,
)
def er_full_contacts_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.pipeline import consolidate_records

    records = synthetic_contact_records(spark, sf_dir)
    res = consolidate_records(records)
    return (res.contacts
            .select("contact_id", "full_name", "first_name", "last_name",
                    "company", "source_count", "source_row_count")
            .orderBy("contact_id"))


@query(
    "er_pipeline_resolved_closed_form",
    survey="N1-N5,E1-E10,A1",
    doc="The SAME full ER pipeline as er_full_contacts_pipeline, "
        "projected onto oracle-expressible columns. contact_id is a "
        "uuid5 (not DuckDB-computable), but on these deterministic "
        "synthetic records the resolution fixpoint has a closed form: "
        "one contact per customer; every third customer's gmail and "
        "linkedin records (shared email) merge (source_count = 2); "
        "name pools (97 firsts x 500 surnames, lcm 48500 > any test "
        "SF's customer count) guarantee no cross-customer name "
        "collision, so everything else is a singleton. The oracle "
        "recomputes that closed form from customer directly — a full "
        "value-level hash check of normalization -> blocking -> "
        "scoring -> gates -> connected components -> survivorship "
        "end-to-end (fuzzy scoring and the iterative components loop "
        "included, since any wrong merge changes the counts or drops "
        "a name row). r05: key_sha256 additionally value-checks the "
        "contact_id KEY MATERIAL — the sorted "
        "name::company::title::emails::phones::lineage string the "
        "pipeline feeds uuid5 (reference combine_contacts.py:"
        "1320-1340); uuid5 itself has no DuckDB twin, but sha256 of "
        "the exact input string does, closing the last rows-only "
        "link in the id derivation (the uuid5 transform proper stays "
        "pinned by parity tests vs reference common.py:72-74).",
    oracle="""
        WITH km AS (
            SELECT c_custkey, c_mktsegment,
                   'First' || CAST(c_custkey % 97 AS VARCHAR)
                       || ' Surname' || CAST(c_custkey % 500 AS VARCHAR)
                       AS full_name,
                   'first' || CAST(c_custkey % 97 AS VARCHAR)
                       || '.surname' || CAST(c_custkey % 500 AS VARCHAR)
                       || '.' || CAST(c_custkey AS VARCHAR)
                       || '@example.com' AS email,
                   CASE WHEN c_custkey % 3 = 0
                        THEN 'gmail:' || CAST(c_custkey AS VARCHAR)
                             || '|linkedin:' || CAST(c_custkey AS VARCHAR)
                        ELSE 'gmail:' || CAST(c_custkey AS VARCHAR)
                   END AS lineage
            FROM customer
        )
        SELECT full_name,
               'First' || CAST(c_custkey % 97 AS VARCHAR) AS first_name,
               'Surname' || CAST(c_custkey % 500 AS VARCHAR) AS last_name,
               c_mktsegment AS company,
               CAST(CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END AS INT)
                   AS source_count,
               CAST(CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END AS INT)
                   AS source_row_count,
               sha256(full_name || '::' || c_mktsegment || '::::'
                      || email || '::::' || lineage) AS key_sha256
        FROM km
        ORDER BY full_name
    """,
)
def er_pipeline_resolved_closed_form(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.pipeline import consolidate_records

    records = synthetic_contact_records(spark, sf_dir)
    res = consolidate_records(records)
    return (res.contacts
            .select("full_name", "first_name", "last_name", "company",
                    "source_count", "source_row_count",
                    F.sha2("key_material", 256).alias("key_sha256"))
            .orderBy("full_name"))


# --------------------------------------------------------------------------
# Scalar-function family over synthesized strings (F7/F10/F19/F23, A5, C1)
# --------------------------------------------------------------------------


@query(
    "f7_phone_extension_extract",
    survey="F7,F8",
    doc="Phone-extension splitting (combine_contacts.py:488-526) as "
        "regexp_extract: synthesized cells 'NNN-NNNN ext K' decompose "
        "into (value, extension) — pure codegen projection.",
    oracle="""
        SELECT c_custkey,
               TRIM(REGEXP_EXTRACT(cell, '^(.*?)(?:\\s+ext\\s+(\\d+))?$', 1))
                   AS phone_value,
               REGEXP_EXTRACT(cell, 'ext\\s+(\\d+)$', 1) AS extension
        FROM (SELECT c_custkey,
                     '(617) 555-' || LPAD(CAST(c_custkey % 10000 AS VARCHAR),
                                          4, '0')
                     || CASE WHEN c_custkey % 3 = 0
                             THEN ' ext ' || CAST(c_custkey % 89 AS VARCHAR)
                             ELSE '' END AS cell
              FROM customer)
        ORDER BY c_custkey
    """,
)
def f7_phone_extension_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    cell = F.concat(
        F.lit("(617) 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.when(F.col("c_custkey") % 3 == 0,
               F.concat(F.lit(" ext "),
                        (F.col("c_custkey") % 89).cast("string")))
        .otherwise(F.lit("")))
    return (customer.select("c_custkey", cell.alias("cell"))
            .select("c_custkey",
                    F.trim(F.regexp_extract(
                        "cell", r"^(.*?)(?:\s+ext\s+(\d+))?$", 1))
                    .alias("phone_value"),
                    F.regexp_extract("cell", r"ext\s+(\d+)$", 1)
                    .alias("extension"))
            .orderBy("c_custkey"))


@query(
    "f10_pull_emails_from_text",
    survey="F10,F9",
    doc="strip_emails_from_text_and_capture (normalization.py:668-677): "
        "regexp-find the address embedded in free text, remove it — two "
        "expressions, no UDF, no side effects.",
    oracle="""
        SELECT c_custkey,
               REGEXP_EXTRACT(blob, '([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+)', 1)
                   AS found_email,
               TRIM(REGEXP_REPLACE(blob,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '')) AS cleaned
        FROM (SELECT c_custkey,
                     c_name || ' <user' || CAST(c_custkey AS VARCHAR)
                     || '@example.com>' AS blob
              FROM customer)
        ORDER BY c_custkey
    """,
)
def f10_pull_emails_from_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    blob = F.concat(F.col("c_name"), F.lit(" <user"),
                    F.col("c_custkey").cast("string"),
                    F.lit("@example.com>"))
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    return (customer.select("c_custkey", blob.alias("blob"))
            .select("c_custkey",
                    F.regexp_extract("blob", f"({email_re})", 1)
                    .alias("found_email"),
                    F.trim(F.regexp_replace("blob", email_re, ""))
                    .alias("cleaned"))
            .orderBy("c_custkey"))


@query(
    "f19_vcard_unescape",
    survey="F19",
    doc="vCard escape-sequence decoding (combine_contacts.py:473-485) as "
        "an ordered replace chain (\\; before \\\\ matters).",
    oracle=r"""
        SELECT c_custkey,
               REPLACE(REPLACE(REPLACE(raw, '\;', ';'), '\,', ','),
                       '\\', '\') AS unescaped
        FROM (SELECT c_custkey,
                     'Acme\, Inc.\; Dept ' || CAST(c_nationkey AS VARCHAR)
                     || ' \\ HQ' AS raw
              FROM customer)
        ORDER BY c_custkey
    """,
)
def f19_vcard_unescape(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    raw = F.concat(F.lit("Acme\\, Inc.\\; Dept "),
                   F.col("c_nationkey").cast("string"), F.lit(" \\\\ HQ"))
    unescaped = F.replace(
        F.replace(F.replace(raw, F.lit("\\;"), F.lit(";")),
                  F.lit("\\,"), F.lit(",")),
        F.lit("\\\\"), F.lit("\\"))
    return (customer.select("c_custkey", unescaped.alias("unescaped"))
            .orderBy("c_custkey"))


@query(
    "f23_email_domain_histogram",
    survey="F23,A6",
    doc="Domain extraction (tagging.py:19-28) via substring_index + the "
        "explode-count diagnostic shape: domain histogram, one shuffle.",
    oracle="""
        SELECT SPLIT_PART(email, '@', 2) AS domain, COUNT(*) AS n
        FROM (SELECT LOWER(c_name) || '@corp'
                     || CAST(c_custkey % 7 AS VARCHAR) || '.com' AS email
              FROM customer)
        GROUP BY 1 ORDER BY domain
    """,
)
def f23_email_domain_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    email = F.concat(F.lower("c_name"), F.lit("@corp"),
                     (F.col("c_custkey") % 7).cast("string"), F.lit(".com"))
    return (customer.select(
                F.substring_index(email, "@", -1).alias("domain"))
            .groupBy("domain").agg(F.count("*").alias("n"))
            .orderBy("domain"))


@query(
    "a5_duplicate_key_count",
    survey="A5,P5",
    doc="The duplicate-id assertion (combine_contacts.py:1519-1525) as "
        "a groupBy-having diagnostic over an intentionally colliding "
        "key (custkey mod 700).",
    oracle="""
        SELECT dup_key, COUNT(*) AS n
        FROM (SELECT c_custkey % 700 AS dup_key FROM customer)
        GROUP BY dup_key HAVING COUNT(*) > 1
        ORDER BY dup_key
    """,
)
def a5_duplicate_key_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return (customer.select((F.col("c_custkey") % 700).alias("dup_key"))
            .groupBy("dup_key").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .orderBy("dup_key"))


@query(
    "c1_channel_validity_counts",
    survey="C1",
    doc="Channel validity counts (validate_quality.py:21-88): per row an "
        "array of (value,label) entries, valid = non-empty value and "
        "label != 'invalid' — size(filter(...)) higher-order columns.",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_custkey % 4 = 0 THEN 1 ELSE 2 END AS email_valid,
               2 AS email_total
        FROM customer
        ORDER BY c_custkey
    """,
)
def c1_channel_validity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    entries = F.array(
        F.struct(F.concat(F.lower("c_name"), F.lit("@x.com")).alias("value"),
                 F.lit("home").alias("label")),
        F.struct(F.lit("second@x.com").alias("value"),
                 F.when(F.col("c_custkey") % 4 == 0, "invalid")
                 .otherwise("work").alias("label")))
    valid = F.filter(entries, lambda e: (e["value"] != "")
                     & (F.lower(e["label"]) != "invalid"))
    return (customer.select(
                "c_custkey",
                F.size(valid).alias("email_valid"),
                F.size(entries).alias("email_total"))
            .orderBy("c_custkey"))


# --------------------------------------------------------------------------
# F12/F14/F15: name-intelligence family
# --------------------------------------------------------------------------


@query(
    "f12_initial_from_email",
    survey="F12",
    doc="reconcile_name_from_email_and_last (normalization.py:687-694): "
        "local-part 'jdoe' + surname 'doe' → first initial 'J' — "
        "endswith + substring column algebra, no UDF.",
    oracle="""
        SELECT c_custkey,
               CASE WHEN local LIKE '%' || last_low
                         AND LENGTH(local) - LENGTH(last_low) BETWEEN 1 AND 2
                    THEN UPPER(SUBSTR(local, 1, 1)) ELSE '' END AS initial
        FROM (SELECT c_custkey,
                     CASE WHEN c_custkey % 2 = 0
                          THEN 'j' || 'surname' || CAST(c_custkey % 50 AS VARCHAR)
                          ELSE 'someoneelse' END AS local,
                     'surname' || CAST(c_custkey % 50 AS VARCHAR) AS last_low
              FROM customer)
        ORDER BY c_custkey
    """,
)
def f12_initial_from_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    last_low = F.concat(F.lit("surname"),
                        (F.col("c_custkey") % 50).cast("string"))
    local = F.when(F.col("c_custkey") % 2 == 0,
                   F.concat(F.lit("j"), last_low)) \
        .otherwise(F.lit("someoneelse"))
    head_len = F.length(local) - F.length(last_low)
    initial = F.when(
        local.endswith(last_low) & (head_len >= 1) & (head_len <= 2),
        F.upper(F.substring(local, 1, 1))).otherwise(F.lit(""))
    return (customer.select("c_custkey", initial.alias("initial"))
            .orderBy("c_custkey"))


# first-wins dedupe: some variants recur across roots ('cathy', 'john')
_NICK_SEEN: dict[str, str] = {}
for _root, _variants in __import__(
        "contacts_etl_phase21_spark.functions.data",
        fromlist=["NICKNAME_ROOTS"]).NICKNAME_ROOTS.items():
    for _v in (_root, *_variants):
        _NICK_SEEN.setdefault(_v, _root)
_NICK_VARIANTS = sorted(_NICK_SEEN.items())


@query(
    "f15_nickname_root_lookup",
    survey="F15",
    doc="Nickname equivalence roots (normalization.py:697-735): curated "
        "variant → root map as a broadcast map literal; the oracle CASE "
        "is generated from the same dict, so both sides must agree on "
        "every entry.",
    oracle=(
        "SELECT c_custkey, CASE (c_custkey % {n}) {whens} END AS root "
        "FROM customer ORDER BY c_custkey").format(
            n=len(_NICK_VARIANTS),
            whens=" ".join(f"WHEN {i} THEN '{root}'"
                           for i, (_, root) in enumerate(_NICK_VARIANTS))),
)
def f15_nickname_root_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    variants = F.array(*[F.lit(v) for v, _ in _NICK_VARIANTS])
    mapping = F.create_map(*[F.lit(x) for pair in _NICK_VARIANTS
                             for x in pair])
    variant = F.element_at(
        variants, (F.col("c_custkey") % len(_NICK_VARIANTS)).cast("int") + 1)
    return (customer.select("c_custkey", mapping[variant].alias("root"))
            .orderBy("c_custkey"))


@query(
    "f14_parse_full_name",
    survey="F13,F14",
    doc="strip_suffixes_and_parse_name + parse_name_multi_last "
        "(normalization.py:404-540): the branchy token-scan parser as an "
        "Arrow pandas UDF over synthesized display names (prefix + "
        "particles + generational/professional suffixes). The display "
        "names form a closed 2x2x2 pattern grid, so the oracle states "
        "the expected parse for each pattern in closed form (golden "
        "oracle); the parser's general token logic is pinned by "
        "tests/test_functions.py.",
    oracle="""
        SELECT c_custkey,
               'Alex' AS first_name,
               CASE WHEN c_custkey % 3 = 0
                    THEN 'van der Name' || CAST(c_custkey % 100 AS VARCHAR)
                    ELSE 'Name' || CAST(c_custkey % 100 AS VARCHAR)
               END AS last_name,
               CASE WHEN c_custkey % 5 = 0 THEN 'Dr.' ELSE '' END AS prefix,
               CASE WHEN c_custkey % 4 = 0 THEN 'Jr.' ELSE '' END AS suffix,
               CASE WHEN c_custkey % 4 = 0 THEN 'PhD' ELSE '' END
                   AS suffix_professional
        FROM customer ORDER BY c_custkey
    """,
)
def f14_parse_full_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.functions.spark_cols import (
        udf_parse_full_name,
    )

    customer = load(spark, sf_dir, "customer")
    prefix = F.when(F.col("c_custkey") % 5 == 0, "Dr. ").otherwise("")
    particle = F.when(F.col("c_custkey") % 3 == 0, "van der ").otherwise("")
    suffix = F.when(F.col("c_custkey") % 4 == 0, " Jr., PhD").otherwise("")
    display = F.concat(prefix, F.lit("Alex "), particle,
                       F.lit("Name"), (F.col("c_custkey") % 100)
                       .cast("string"), suffix)
    return (customer
            .select("c_custkey", udf_parse_full_name(display).alias("p"))
            .select("c_custkey", "p.first_name", "p.last_name", "p.prefix",
                    "p.suffix", "p.suffix_professional")
            .orderBy("c_custkey"))


# --------------------------------------------------------------------------
# E8: channel-union survivorship (max_by rank + ordered re-collect)
# --------------------------------------------------------------------------


@query(
    "e8_channel_union_survivorship",
    survey="E8",
    doc="The explode → groupBy(cluster, key) → rank-argmax → sorted "
        "re-collect shape of channel survivorship "
        "(combine_contacts.py:1266-1316): per (nation, segment) pick the "
        "best customer by (acctbal, custkey) rank, then re-collect the "
        "per-nation channel list sorted by key. Two shuffles, both "
        "map-side combined.",
    oracle="""
        SELECT c_nationkey,
               STRING_AGG(c_mktsegment || '::' || CAST(best AS VARCHAR), '|'
                          ORDER BY c_mktsegment) AS channels
        FROM (SELECT c_nationkey, c_mktsegment, c_custkey AS best FROM (
                  SELECT c_nationkey, c_mktsegment, c_custkey,
                         ROW_NUMBER() OVER (
                             PARTITION BY c_nationkey, c_mktsegment
                             ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
                  FROM customer) WHERE rn = 1)
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def e8_channel_union_survivorship(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    best = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.expr("max_by(c_custkey, struct(c_acctbal, c_custkey))")
        .alias("best"))
    return (best.groupBy("c_nationkey")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("c_mktsegment", "best"))),
                    lambda s: F.concat(s["c_mktsegment"], F.lit("::"),
                                       s["best"].cast("string"))),
                "|").alias("channels"))
            .orderBy("c_nationkey"))
