"""LinkedIn connections CSV → typed contact rows.

Parity: _load_linkedin_csv (combine_contacts.py:295-336) +
read_csv_with_optional_header (normalization.py:335-351). Fully
declarative: one csv scan + one projection; the only driver-side work
is sniffing the banner-preamble offset (bounded to 100 lines, exactly
like the reference).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

LINKEDIN_HEADER = "First Name,Last Name,URL"


def sniff_header_offset(path: str, marker: str = LINKEDIN_HEADER,
                        max_lines: int = 100) -> int:
    """Line index of the header row (LinkedIn exports carry banner
    lines). Driver-side, bounded read — not a data scan."""
    with open(path, encoding="utf-8", errors="ignore") as fh:
        for i, line in enumerate(fh):
            if i >= max_lines:
                break
            if line.startswith(marker):
                return i
    return 0


def load_linkedin(spark: SparkSession, path: str) -> DataFrame:
    """Read + project the LinkedIn export into CONTACT_SCHEMA shape."""
    offset = sniff_header_offset(path)
    if offset == 0:
        df = spark.read.option("header", True).csv(path)
    else:
        # skip the banner: text scan → drop first `offset` lines (file
        # order = partition order for a single file) → parse with
        # from_csv against the sniffed header
        lines = spark.read.text(path)
        w = Window.orderBy(F.monotonically_increasing_id())
        body = (lines.withColumn("_ln", F.row_number().over(w) - 1)
                .filter(F.col("_ln") > offset)
                .select("value"))
        with open(path, encoding="utf-8", errors="ignore") as fh:
            for i, line in enumerate(fh):
                if i == offset:
                    header_cols = [c.strip() for c in line.rstrip("\n").split(",")]
                    break
        schema_ddl = ", ".join(f"`{c}` STRING" for c in header_cols)
        body = body.select(F.from_csv("value", schema_ddl).alias("r")).select("r.*")
        df = body

    url = F.coalesce(F.col("URL"), F.lit(""))
    email = F.coalesce(F.col("Email Address"), F.lit(""))
    first = F.trim(F.coalesce(F.col("First Name"), F.lit("")))
    last = F.trim(F.coalesce(F.col("Last Name"), F.lit("")))
    connected = F.trim(F.coalesce(F.col("Connected On"), F.lit("")))
    ts = F.coalesce(
        F.date_format(F.to_timestamp(connected, "d MMM yyyy"),
                      "yyyy-MM-dd'T'HH:mm:ss"),
        F.date_format(F.to_timestamp(connected, "yyyy-MM-dd"),
                      "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(""))

    w = Window.orderBy(F.monotonically_increasing_id())
    return df.select(
        F.lit("linkedin").alias("source"),
        (F.row_number().over(w) - 1).cast("string").alias("source_row_id"),
        ts.alias("source_timestamp"),
        F.trim(F.concat_ws(" ", first, last)).alias("full_name"),
        F.lit("").alias("prefix"), F.lit("").alias("first_name"),
        F.lit("").alias("middle_name"), F.lit("").alias("last_name"),
        F.lit("").alias("maiden_name"), F.lit("").alias("suffix"),
        F.lit("").alias("suffix_professional"), F.lit("").alias("nickname"),
        F.coalesce(F.col("Company"), F.lit("")).alias("company"),
        F.coalesce(F.col("Position"), F.lit("")).alias("title"),
        F.lit("").alias("department"),
        F.when(F.lower(url).contains("linkedin.com"), url)
        .otherwise(F.lit("")).alias("linkedin_url"),
        F.lit("").alias("notes"),
        F.when(F.trim(email) != "", F.array(F.struct(
            F.trim(email).alias("value"), F.lit("home").alias("label"))))
        .otherwise(F.array().cast("array<struct<value:string,label:string>>"))
        .alias("emails"),
        F.array().cast(
            "array<struct<value:string,label:string,extension:string>>")
        .alias("phones"),
        F.array().cast(
            "array<struct<po_box:string,extended:string,street:string,"
            "city:string,state:string,postal_code:string,country:string,"
            "label:string>>").alias("addresses"),
    )
