"""CLI mirroring the reference's four entry points (pyproject.toml:61-65):

    python -m contacts_etl_phase21_spark.cli consolidate \
        [--linkedin-csv F] [--gmail-csv F] [--mac-vcf F] --out-dir DIR
    python -m contacts_etl_phase21_spark.cli validate   --out-dir DIR
    python -m contacts_etl_phase21_spark.cli confidence --out-dir DIR
    python -m contacts_etl_phase21_spark.cli tag        --out-dir DIR

Stages exchange typed Parquet under DIR/parquet/ (the engine's
interchange); each stage also writes the reference's CSV artifact for
compatibility (consolidated_contacts.csv, validation_report.csv,
confidence_report.csv + confidence_summary.csv, tagged_contacts.csv +
referral_targets.csv). Unlike the reference's four processes chained
through CSV (Makefile:55), `pipeline` runs all four in one SparkSession
with no materialization between stages beyond the parquet checkpoints.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession

from contacts_etl_phase21_spark.pipeline import (
    PipelineConfig, assert_unique_contact_ids, confidence_report,
    confidence_summary, consolidate_records, load_config, notes_blob,
    referral_targets, tag_contacts, validation_report, validation_summary,
)
from contacts_etl_phase21_spark.pipeline.sinks import (
    render_legacy_contacts, render_tagged, write_csv, write_parquet,
)
from contacts_etl_phase21_spark.session import get_spark
from contacts_etl_phase21_spark.sources.union import load_sources


def _pq(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "parquet", name)


def _csv(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, name)


def run_consolidate(spark: SparkSession, args: argparse.Namespace,
                    config: PipelineConfig) -> None:
    # Stage the parsed sources as parquet FIRST and re-read: the
    # text-format parsers (Gmail column families, vCard blocks) are the
    # most expensive scan in the job, and without staging every sink
    # that transitively reads `raw` re-parses the source files.
    raw = load_sources(spark, args.linkedin_csv, args.gmail_csv, args.mac_vcf)
    write_parquet(raw, _pq(args.out_dir, "raw_records"))
    raw = spark.read.parquet(_pq(args.out_dir, "raw_records"))
    res = consolidate_records(raw, config)
    from contacts_etl_phase21_spark.operators.entity_resolution import \
        assert_unique_rids

    assert_unique_rids(res.clustered)  # cached — one cheap agg
    assert_unique_contact_ids(res.contacts)
    write_parquet(res.contacts, _pq(args.out_dir, "contacts"))
    # lineage/flattened feed both a parquet and a CSV sink — write
    # parquet once, re-read, render CSV from the columnar copy.
    write_parquet(res.lineage, _pq(args.out_dir, "lineage"))
    lineage = spark.read.parquet(_pq(args.out_dir, "lineage"))
    write_parquet(res.flattened, _pq(args.out_dir, "flattened"))
    flattened = spark.read.parquet(_pq(args.out_dir, "flattened"))
    write_csv(render_legacy_contacts(res.contacts),
              _csv(args.out_dir, "consolidated_contacts.csv"))
    write_csv(lineage, _csv(args.out_dir, "consolidated_lineage.csv"))
    write_csv(flattened, _csv(args.out_dir, "flattened_contacts.csv"))


def run_validate(spark: SparkSession, args: argparse.Namespace,
                 config: PipelineConfig) -> None:
    contacts = spark.read.parquet(_pq(args.out_dir, "contacts"))
    flattened = spark.read.parquet(_pq(args.out_dir, "flattened"))
    report = validation_report(contacts, flattened, config.quality)
    write_parquet(report, _pq(args.out_dir, "validation"))
    report = spark.read.parquet(_pq(args.out_dir, "validation"))
    write_csv(report, _csv(args.out_dir, "validation_report.csv"))
    # validate stage's second artifact (reference validate_quality.py:197-221):
    # full legacy contact rows left-joined with the per-channel counts/score.
    scored_cols = [
        "email_valid_count", "email_total", "phone_valid_count",
        "phone_total", "addr_valid_count", "addr_total", "quality_score",
        "department_missing", "home_email_present", "work_email_present",
        "home_phone_present", "work_phone_present", "home_address_present",
        "work_address_present",
    ]
    write_csv(render_legacy_contacts(contacts).join(
        report.select("contact_id", *scored_cols), "contact_id", "left"),
        _csv(args.out_dir, "contact_quality_scored.csv"))
    summary = validation_summary(report).collect()[0].asDict()
    print(summary)


def run_confidence(spark: SparkSession, args: argparse.Namespace,
                   config: PipelineConfig) -> None:
    contacts = spark.read.parquet(_pq(args.out_dir, "contacts"))
    flattened = spark.read.parquet(_pq(args.out_dir, "flattened"))
    validation = spark.read.parquet(_pq(args.out_dir, "validation"))
    scored = confidence_report(contacts, validation, flattened)
    write_parquet(scored, _pq(args.out_dir, "confidence"))
    write_csv(render_legacy_contacts(scored).join(
        scored.select("contact_id", "confidence_score", "confidence_bucket"),
        "contact_id"), _csv(args.out_dir, "confidence_report.csv"))
    write_csv(confidence_summary(scored),
              _csv(args.out_dir, "confidence_summary.csv"))


def run_tag(spark: SparkSession, args: argparse.Namespace,
            config: PipelineConfig) -> None:
    contacts = spark.read.parquet(_pq(args.out_dir, "contacts"))
    confidence = spark.read.parquet(_pq(args.out_dir, "confidence"))
    lineage = spark.read.parquet(_pq(args.out_dir, "lineage"))
    raw = spark.read.parquet(_pq(args.out_dir, "raw_records"))
    notes = notes_blob(lineage, raw)
    tagged = tag_contacts(contacts, confidence, notes, config.tagging)
    write_parquet(tagged, _pq(args.out_dir, "tagged"))
    rendered = render_tagged(tagged)
    write_csv(rendered, _csv(args.out_dir, "tagged_contacts.csv"))
    # sort AFTER the render join — a join would not preserve sort order
    write_csv(referral_targets(rendered),
              _csv(args.out_dir, "referral_targets.csv"))


STAGES = {
    "consolidate": run_consolidate,
    "validate": run_validate,
    "confidence": run_confidence,
    "tag": run_tag,
}


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="contacts-etl-spark")
    parser.add_argument("stage", choices=[*STAGES, "pipeline"])
    parser.add_argument("--linkedin-csv")
    parser.add_argument("--gmail-csv")
    parser.add_argument("--mac-vcf")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--config")
    parser.add_argument("--log-level")
    args = parser.parse_args(argv)

    config = load_config(args.config)
    # reference precedence (logging_utils.py:22-39): env var > CLI flag
    # > config.yaml logging.level > WARNING; applied to both the Python
    # root logger and the Spark JVM log level.
    import logging

    from contacts_etl_phase21_spark.pipeline.config import resolve_log_level
    level = resolve_log_level(config, args.log_level)
    logging.basicConfig(level=level)
    spark = get_spark("contacts-etl-phase21-cli")
    jvm_level = logging.getLevelName(level) if level in (
        logging.DEBUG, logging.INFO, logging.ERROR) else "WARN"
    spark.sparkContext.setLogLevel(jvm_level)
    stages = ([*STAGES] if args.stage == "pipeline" else [args.stage])
    for stage in stages:
        STAGES[stage](spark, args, config)


if __name__ == "__main__":
    main()
