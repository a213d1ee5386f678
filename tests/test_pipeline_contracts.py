"""Behavioral contract port (SURVEY.md §5): the reference's merge-
semantics tests re-expressed against the Spark pipeline.

Each test mirrors one contract from the reference's
tests/test_combine_helpers.py (cited per test); fixtures are the same
synthetic records, inputs go through createDataFrame(CONTACT_SCHEMA) and
the full consolidate DataFrame program.
"""

from __future__ import annotations

import pytest

from contacts_etl_phase21_spark.functions.merge_core import (
    DedupeConfig, choose_best_first_name, merge_ok, pair_signals,
)
from contacts_etl_phase21_spark.functions.record_norm import (
    normalize_addresses, normalize_emails, normalize_record,
)
from contacts_etl_phase21_spark.pipeline import (
    PipelineConfig, TaggingSettings, confidence_report, consolidate_records,
    flatten_contacts, notes_blob, tag_contacts, validation_report,
)
from contacts_etl_phase21_spark.schemas import CONTACT_SCHEMA

RELAXED = DedupeConfig(merge_score_threshold=0.0,
                       relaxed_merge_threshold=0.0,
                       first_name_similarity_threshold=0.0)


def rec(source="gmail", row_id="0", **kw) -> dict:
    base = {f.name: "" for f in CONTACT_SCHEMA.fields
            if f.name not in ("emails", "phones", "addresses")}
    base.update(source=source, source_row_id=row_id,
                emails=[], phones=[], addresses=[])
    for key, value in kw.items():
        base[key] = value
    return base


def addr(street="", city="", state="", postal_code="", country="",
         label="", po_box="", extended="") -> dict:
    return dict(po_box=po_box, extended=extended, street=street, city=city,
                state=state, postal_code=postal_code, country=country,
                label=label)


def run_consolidate(spark, records, cfg=None):
    df = spark.createDataFrame(records, CONTACT_SCHEMA)
    return consolidate_records(df, cfg or PipelineConfig())


# ---------------------------------------------------------------------------
# Merge-semantics contracts (test_combine_helpers.py:190-484)
# ---------------------------------------------------------------------------


def test_build_exposes_nickname(spark):
    res = run_consolidate(spark, [rec(
        first_name="John", last_name="Example", nickname="Johnny",
        emails=[{"value": "john@example.com", "label": "home"}])])
    rows = res.contacts.collect()
    assert [r["nickname"] for r in rows] == ["Johnny"]
    assert rows[0]["emails"][0]["value"] == "john@example.com"


def test_build_respects_nickname_equivalence(spark):
    records = [rec(row_id="0", first_name="Bill", last_name="Doe"),
               rec(row_id="1", first_name="William", last_name="Doe")]
    merged = run_consolidate(spark, records)
    assert merged.contacts.count() == 1

    cfg = PipelineConfig(dedupe=DedupeConfig(nickname_equivalence=False))
    split = run_consolidate(spark, records, cfg)
    assert split.contacts.count() == 2


def test_build_matches_on_explicit_nickname(spark):
    records = [rec(row_id="0", first_name="William", last_name="Example"),
               rec(row_id="1", first_name="", last_name="Example",
                   nickname="Billy")]
    res = run_consolidate(spark, records)
    assert res.contacts.count() == 1


def test_build_keeps_distinct_household_members(spark):
    shared = addr(street="123 Elm St", city="Sampleville", state="MA",
                  postal_code="02144", country="US")
    records = [
        rec(row_id="0", first_name="Alex", last_name="Resident",
            phones=[{"value": "+15550000001", "label": "home",
                     "extension": ""}], addresses=[shared]),
        rec(row_id="1", first_name="Riley", last_name="Resident",
            phones=[{"value": "+15550000002", "label": "home",
                     "extension": ""}], addresses=[shared]),
    ]
    res = run_consolidate(spark, records)
    rows = res.contacts.collect()
    assert len(rows) == 2
    assert {r["first_name"] for r in rows} == {"Alex", "Riley"}
    assert {r["source_count"] for r in rows} == {1}
    assert {r["source_row_count"] for r in rows} == {1}


def test_merge_prefers_linkedin_metadata(spark):
    records = [
        rec(source="linkedin", row_id="1", first_name="Jordan",
            last_name="Example", company="Future Corp",
            title="Principal Engineer",
            linkedin_url="https://linkedin.com/in/jordan-example"),
        rec(source="gmail", row_id="2", first_name="Jordan",
            last_name="Example", company="Old Employer", title="Developer"),
    ]
    res = run_consolidate(spark, records, PipelineConfig(dedupe=RELAXED))
    rows = res.contacts.collect()
    assert len(rows) == 1
    assert rows[0]["company"] == "Future Corp"
    assert rows[0]["title"] == "Principal Engineer"
    assert rows[0]["linkedin_url"] == "https://linkedin.com/in/jordan-example"


def test_merge_prefers_specific_email_label(spark):
    records = [
        rec(source="mac_vcf", row_id="10", first_name="Chris",
            last_name="Wright",
            emails=[{"value": "cwright@example.com", "label": "other"}]),
        rec(source="mac_vcf", row_id="11", first_name="Chris",
            last_name="Wright", company="TeamLogic IT",
            emails=[{"value": "cwright@example.com", "label": "work"}]),
    ]
    res = run_consolidate(spark, records, PipelineConfig(dedupe=RELAXED))
    rows = res.contacts.collect()
    assert len(rows) == 1
    assert [(e["value"], e["label"]) for e in rows[0]["emails"]] == [
        ("cwright@example.com", "work")]


def test_merge_assigns_other_when_email_label_missing(spark):
    res = run_consolidate(spark, [rec(
        source="mac_vcf", row_id="42", first_name="Label", last_name="Less",
        emails=[{"value": "labelless@example.com", "label": ""}])])
    rows = res.contacts.collect()
    assert [(e["value"], e["label"]) for e in rows[0]["emails"]] == [
        ("labelless@example.com", "other")]


def test_merge_prefers_newer_timestamp(spark):
    records = [
        rec(source="mac_vcf", row_id="1", first_name="Casey",
            last_name="Example", company="Old Co",
            source_timestamp="2024-01-01T00:00:00"),
        rec(source="mac_vcf", row_id="2", first_name="Casey",
            last_name="Example", company="New Co",
            source_timestamp="2024-06-01T00:00:00"),
    ]
    res = run_consolidate(spark, records, PipelineConfig(dedupe=RELAXED))
    rows = res.contacts.collect()
    assert len(rows) == 1
    assert rows[0]["company"] == "New Co"


# ---------------------------------------------------------------------------
# Collection normalization contracts (test_combine_helpers.py:487-570)
# ---------------------------------------------------------------------------


def test_normalize_email_dedup_preserves_best_label():
    out, invalid = normalize_emails([
        {"value": "primary@example.com", "label": ""},
        {"value": "Primary@Example.com", "label": "work"},
        {"value": "not-an-email", "label": "home"},
    ])
    assert invalid == ["not-an-email"]
    assert {(e["value"], e["label"]) for e in out} == {
        ("primary@example.com", "work"), ("not-an-email", "invalid")}


def test_address_dedup_keeps_label():
    out = normalize_addresses([
        addr(street="1 Main St", city="Boston", state="Massachusetts"),
        addr(street="1 Main St", city="Boston", state="MA", label="Home"),
    ])
    assert len(out) == 1
    assert out[0]["label"] == "home"
    assert out[0]["state"] == "MA"


def test_normalize_record_guesses_name_from_email():
    out = normalize_record(rec(
        full_name="", emails=[{"value": "jane.doe@example.com",
                               "label": ""}]))
    assert out["first_name"] == "Jane"
    assert out["last_name"] == "Doe"
    assert out["full_name"] == "Jane Doe"


def test_normalize_record_pulls_email_from_name():
    out = normalize_record(rec(full_name="Jane Doe jane@x.com"))
    assert out["first_name"] == "Jane"
    assert out["last_name"] == "Doe"
    assert any(e["value"] == "jane@x.com" for e in out["emails"])


# ---------------------------------------------------------------------------
# Pure-core decision gates
# ---------------------------------------------------------------------------


def test_household_pair_rejected_by_gates():
    shared = addr(street="123 Elm St", city="Sampleville", state="MA",
                  postal_code="02144")
    a = rec(row_id="0", first_name="Alex", last_name="Resident",
            addresses=[shared])
    b = rec(row_id="1", first_name="Riley", last_name="Resident",
            addresses=[shared])
    sig = pair_signals(a, b)
    assert sig.corroborators == 1  # shared address key
    assert not merge_ok(a, b, sig)


def test_shared_email_pair_accepted():
    a = rec(row_id="0", first_name="Sam", last_name="Poe",
            emails=[{"value": "sam@x.com", "label": "home"}])
    b = rec(row_id="1", first_name="Sam", last_name="Poe",
            emails=[{"value": "sam@x.com", "label": "work"}])
    sig = pair_signals(a, b)
    assert sig.emails_overlap
    assert merge_ok(a, b, sig)


def test_choose_best_first_name_vote():
    records = [
        rec(source="linkedin", first_name="William"),
        rec(source="gmail", first_name="Bill"),
        rec(source="gmail", first_name="Bill"),
    ]
    # linkedin weight 2.0 but Bill has 2 votes; William/Bill keys are not
    # seq-similar (>0.9), so no pooling — explicit tie broken by count.
    name, key = choose_best_first_name(records)
    assert key in {"william", "bill"}
    assert name in {"William", "Bill"}


# ---------------------------------------------------------------------------
# Downstream stages on a consolidated fixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def consolidated(spark):
    records = [
        rec(source="linkedin", row_id="1", first_name="Jordan",
            last_name="Example", company="Acme", title="Engineer",
            linkedin_url="https://linkedin.com/in/jordan",
            source_timestamp="2024-03-01T00:00:00",
            emails=[{"value": "jordan@acme.com", "label": "work"}]),
        rec(source="gmail", row_id="1", first_name="Jordan",
            last_name="Example", notes="met at tai chi class",
            emails=[{"value": "jordan@acme.com", "label": ""},
                    {"value": "bad-email", "label": "home"}],
            phones=[{"value": "(617) 555-0100", "label": "mobile",
                     "extension": ""}],
            addresses=[addr(street="9 Shore Rd", city="Quincy", state="MA",
                            postal_code="02169", label="home")]),
        rec(source="gmail", row_id="2", first_name="Dana",
            last_name="Solo"),
    ]
    raw = spark.createDataFrame(records, CONTACT_SCHEMA)
    res = consolidate_records(raw)
    return {"raw": raw, "res": res}


def test_consolidate_merges_on_shared_email(consolidated):
    contacts = consolidated["res"].contacts
    assert contacts.count() == 2
    jordan = contacts.filter("last_name = 'Example'").collect()[0]
    assert jordan["source_count"] == 2
    assert jordan["source_row_count"] == 2
    assert "bad-email" in jordan["invalid_emails"]
    # company survives from the only record that has one
    assert jordan["company"] == "Acme"


def test_lineage_one_row_per_source_record(consolidated):
    lineage = consolidated["res"].lineage
    assert lineage.count() == 3
    jordan_id = consolidated["res"].contacts \
        .filter("last_name = 'Example'").collect()[0]["contact_id"]
    assert lineage.filter(f"contact_id = '{jordan_id}'").count() == 2


def test_flatten_pivot_first_per_label(consolidated):
    flat = flatten_contacts(consolidated["res"].contacts)
    jordan = flat.filter("full_name like '%Example%'").collect()[0]
    assert jordan["work_email"] == "jordan@acme.com"
    assert jordan["home_address"].startswith("9 Shore Rd, Quincy, MA")


def test_validation_quality_score(consolidated):
    res = consolidated["res"]
    report = validation_report(res.contacts, res.flattened)
    jordan = report.filter("full_name like '%Example%'").collect()[0]
    # 2 emails (1 invalid) → partial 20; phone valid → full 30; addr → 30
    assert jordan["email_total"] == 2
    assert jordan["email_valid_count"] == 1
    assert jordan["quality_score"] == 20 + 30 + 30
    dana = report.filter("full_name like '%Solo%'").collect()[0]
    assert dana["quality_score"] == 0


def test_confidence_score_and_bucket(consolidated):
    res = consolidated["res"]
    report = validation_report(res.contacts, res.flattened)
    conf = confidence_report(res.contacts, report, res.flattened)
    rows = {r["last_name"]: r for r in conf.collect()}
    jordan, dana = rows["Example"], rows["Solo"]
    assert jordan["confidence_score"] > dana["confidence_score"]
    assert jordan["confidence_bucket"] in {"high", "very_high"}
    assert 0 <= dana["confidence_score"] <= 100


def test_tagging_and_referral(consolidated, spark):
    res = consolidated["res"]
    report = validation_report(res.contacts, res.flattened)
    conf = confidence_report(res.contacts, report, res.flattened)
    notes = notes_blob(res.lineage, consolidated["raw"])
    tagged = tag_contacts(
        res.contacts, conf, notes,
        TaggingSettings(prior_companies=("acme",),
                        local_cities=("quincy",)))
    jordan = tagged.filter("last_name = 'Example'").collect()[0]
    assert "martial_arts" in jordan["tags"]          # tai chi in notes
    assert "work_colleague" in jordan["tags"]        # company match
    assert "local_south_shore" in jordan["tags"]     # Quincy, MA address
    assert jordan["relationship_category"] == "personal"
    expected = min(100, round(jordan["confidence_score"] * 0.6 + 60))
    assert jordan["referral_priority_score"] == expected


# ---------------------------------------------------------------------------
# E11: post-merge MX re-validation (combine_contacts.py:548-582)
# ---------------------------------------------------------------------------


def test_mx_check_relabels_and_dedupes(spark):
    from contacts_etl_phase21_spark.operators.mx_check import apply_mx_check
    from contacts_etl_phase21_spark.schemas import CONSOLIDATED_SCHEMA

    base = {f.name: None for f in CONSOLIDATED_SCHEMA.fields}
    base.update(contact_id="c1", emails=[
        {"value": "Good@X.com", "label": "invalid"},
        {"value": "good@x.com", "label": "work"},   # valid copy wins dedupe
        {"value": "dead@x.com", "label": "home"},   # checker fails it
    ])
    df = spark.createDataFrame([base], CONSOLIDATED_SCHEMA)
    out = apply_mx_check(df, checker=lambda v: not v.startswith("dead"))
    [row] = out.collect()
    emails = [(e["value"], e["label"]) for e in row["emails"]]
    assert emails == [("good@x.com", "work"), ("dead@x.com", "invalid")]


# ---------------------------------------------------------------------------
# E5 variants: label propagation vs alternating-star equivalence
# ---------------------------------------------------------------------------


def test_connected_components_star_matches_label_prop(spark):
    import random

    from contacts_etl_phase21_spark.operators.entity_resolution import (
        connected_components, connected_components_star,
    )

    rng = random.Random(7)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    vertices = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    lp = {r["id"]: r["component"]
          for r in connected_components(vertices, edf).collect()}
    star = {r["id"]: r["component"]
            for r in connected_components_star(vertices, edf).collect()}
    assert lp == star


def test_connected_components_star_handles_long_chain(spark):
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        connected_components_star,
    )

    n = 2048  # a chain needs ~n label-propagation rounds; star needs ~log n
    vertices = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    out = connected_components_star(vertices, chain, max_iter=20).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == n


# ---------------------------------------------------------------------------
# Config surface end-to-end (reference config_loader.py:96-105, config.yaml
# normalization:) — a custom suffix list must change parse output through
# the CLI config path, and email_dns_mx_check must reach apply_mx_check.
# ---------------------------------------------------------------------------


def test_custom_professional_suffix_list_changes_parse(spark, tmp_path):
    from contacts_etl_phase21_spark import cli

    vcf = tmp_path / "mac.vcf"
    vcf.write_text("BEGIN:VCARD\nVERSION:3.0\nFN:Pat Doe Xyz\n"
                   "N:;Pat;;;\nEND:VCARD\n")
    config = tmp_path / "config.yaml"
    config.write_text(
        "normalization:\n  professional_suffixes:\n  - xyz\n")

    def consolidated(out_dir, *extra):
        cli.main(["consolidate", "--mac-vcf", str(vcf),
                  "--out-dir", str(out_dir), *extra])
        import csv
        import glob
        [part] = glob.glob(f"{out_dir}/consolidated_contacts.csv/part-*.csv")
        with open(part, newline="", encoding="utf-8") as fh:
            [row] = list(csv.DictReader(fh))
        return row

    default = consolidated(tmp_path / "out_default")
    assert default["last_name"] == "Xyz"
    assert default["suffix_professional"] == ""

    custom = consolidated(tmp_path / "out_custom", "--config", str(config))
    assert custom["last_name"] == "Doe"
    assert custom["suffix_professional"] == "Xyz"


def test_custom_generational_and_prefix_lists(tmp_path):
    from contacts_etl_phase21_spark.pipeline.config import load_config

    config = tmp_path / "config.yaml"
    config.write_text(
        "normalization:\n"
        "  keep_generational_suffixes:\n  - xiv\n"
        "  name_prefixes:\n  - captain\n")
    settings = load_config(str(config)).normalization
    out = normalize_record(rec(full_name="Captain Ann Blake XIV"), settings)
    assert out["prefix"] == "Captain"
    assert out["suffix"] == "XIV"
    assert (out["first_name"], out["last_name"]) == ("Ann", "Blake")
    # replaced, not extended: the defaults' 'jr' is no longer generational
    out2 = normalize_record(rec(full_name="Bo Vance Jr"), settings)
    assert out2["suffix"] == ""
    assert out2["last_name"] == "Jr"


def test_mx_check_through_pipeline_path(spark):
    from contacts_etl_phase21_spark.functions.record_norm import NormSettings

    cfg = PipelineConfig(normalization=NormSettings(email_dns_mx_check=True))
    records = [rec(first_name="Ada", last_name="Lake", emails=[
        {"value": "ada@dead-domain.example", "label": "home"},
        {"value": "ada@ok.example", "label": "work"}])]
    df = spark.createDataFrame(records, CONTACT_SCHEMA)
    res = consolidate_records(
        df, cfg, mx_checker=lambda v: not v.startswith("ada@dead"))
    [row] = res.contacts.collect()
    labels = {e["value"]: e["label"] for e in row["emails"]}
    assert labels["ada@dead-domain.example"] == "invalid"
    assert labels["ada@ok.example"] == "work"
    # flattened pivot sees the relabel: no home email survives
    [flat] = res.flattened.collect()
    assert flat["home_email"] == ""
    assert flat["work_email"] == "ada@ok.example"


def test_log_level_precedence(tmp_path, monkeypatch):
    """Reference logging_utils.py:22-39: env > CLI override > config
    yaml > WARNING default; logging_utils.py:10-19 name resolution:
    digit strings are numeric levels, unknown names fall back to INFO."""
    import logging

    from contacts_etl_phase21_spark.pipeline.config import (
        load_config, resolve_log_level,
    )

    config = tmp_path / "config.yaml"
    config.write_text("logging:\n  level: info\n")
    cfg = load_config(str(config))
    monkeypatch.delenv("CONTACTS_ETL_LOG_LEVEL", raising=False)
    assert resolve_log_level(PipelineConfig()) == logging.WARNING
    assert resolve_log_level(cfg) == logging.INFO
    assert resolve_log_level(cfg, "debug") == logging.DEBUG
    monkeypatch.setenv("CONTACTS_ETL_LOG_LEVEL", "error")
    assert resolve_log_level(cfg, "debug") == logging.ERROR
    monkeypatch.delenv("CONTACTS_ETL_LOG_LEVEL", raising=False)
    # digit strings pass through numerically (reference _resolve_level)
    assert resolve_log_level(cfg, "15") == 15
    # unknown names fall back to INFO, not WARNING
    assert resolve_log_level(cfg, "VERBOSE") == logging.INFO
