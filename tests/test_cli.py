"""End-to-end CLI run: three source files through all four stages; every
reference CSV artifact must materialize with coherent content."""

from __future__ import annotations

import csv
import glob

import pytest

LINKEDIN = """Notes:
"When exporting your connection data, you may be missing..."

First Name,Last Name,URL,Email Address,Company,Position,Connected On
Jordan,Example,https://linkedin.com/in/jordan-example,jordan@acme.com,Acme Corp,Principal Engineer,03 Jan 2024
Sam,Poe,https://linkedin.com/in/sam-poe,,Initech,Manager,15 Feb 2023
"""

GMAIL = ('First Name,Middle Name,Last Name,Name Prefix,Name Suffix,Nickname,'
         'Organization Name,Organization Title,Organization Department,Notes,'
         'E-mail 1 - Value,E-mail 1 - Label,Phone 1 - Value,Phone 1 - Label,'
         'Address 1 - Street,Address 1 - City,Address 1 - Region,'
         'Address 1 - Postal Code,Address 1 - Country,Address 1 - Label\n'
         'Jordan,,Example,,,,Acme Corp,,,met at tai chi class,'
         'jordan@acme.com,* Work,(617) 555-0100,Mobile,'
         '9 Shore Rd,Quincy,MA,02169,US,Home\n'
         'Dana,,Solo,,,,,,,,'
         'dana.solo@mail.com,Home,,,,,,,,\n')

VCF = """BEGIN:VCARD
VERSION:3.0
FN:Casey Wright
N:Wright;Casey;;;
EMAIL;TYPE=INTERNET;TYPE=WORK;TYPE=pref:casey.work@example.com
TEL;TYPE=CELL;TYPE=pref:+1-555-000-0003
NOTE:ballet parent from the nutcracker show
END:VCARD
"""


def _read_csv_dir(path: str) -> list[dict]:
    [part] = glob.glob(f"{path}/part-*.csv")
    with open(part, newline="", encoding="utf-8") as fh:
        return list(csv.DictReader(fh))


@pytest.fixture(scope="module")
def cli_out(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    (tmp / "linkedin.csv").write_text(LINKEDIN)
    (tmp / "gmail.csv").write_text(GMAIL)
    (tmp / "mac.vcf").write_text(VCF)
    out = tmp / "out"

    from contacts_etl_phase21_spark import cli
    cli.main(["pipeline",
              "--linkedin-csv", str(tmp / "linkedin.csv"),
              "--gmail-csv", str(tmp / "gmail.csv"),
              "--mac-vcf", str(tmp / "mac.vcf"),
              "--out-dir", str(out)])
    return out


def test_cli_consolidates_across_sources(cli_out):
    rows = _read_csv_dir(str(cli_out / "consolidated_contacts.csv"))
    by_name = {r["full_name"]: r for r in rows}
    assert len(rows) == 4  # Jordan merged across linkedin+gmail
    jordan = by_name["Jordan Example"]
    assert jordan["company"] == "Acme Corp"
    assert int(jordan["source_count"]) == 2
    # linkedin side carries a timestamp + higher priority → its label wins
    assert "jordan@acme.com::home" in jordan["emails"]
    assert "+16175550100::mobile" in jordan["phones"]


def test_cli_lineage_and_flattened(cli_out):
    lineage = _read_csv_dir(str(cli_out / "consolidated_lineage.csv"))
    assert len(lineage) == 5  # one row per source record
    flat = _read_csv_dir(str(cli_out / "flattened_contacts.csv"))
    jordan = [r for r in flat if r["full_name"] == "Jordan Example"][0]
    assert jordan["home_email"] == "jordan@acme.com"
    assert jordan["home_address"].startswith("9 Shore Rd, Quincy, MA")


def test_cli_scoring_artifacts(cli_out):
    validation = _read_csv_dir(str(cli_out / "validation_report.csv"))
    assert {r["contact_id"] for r in validation}
    confidence = _read_csv_dir(str(cli_out / "confidence_report.csv"))
    assert all(0 <= int(r["confidence_score"]) <= 100 for r in confidence)
    summary = _read_csv_dir(str(cli_out / "confidence_summary.csv"))
    assert abs(sum(float(r["pct"]) for r in summary) - 100.0) < 0.1


def test_cli_tagging_and_referral_order(cli_out):
    tagged = _read_csv_dir(str(cli_out / "tagged_contacts.csv"))
    by_name = {r["full_name"]: r for r in tagged}
    assert "martial_arts" in by_name["Jordan Example"]["tags"]
    assert "nutcracker_performance" in by_name["Casey Wright"]["tags"]
    targets = _read_csv_dir(str(cli_out / "referral_targets.csv"))
    scores = [int(r["referral_priority_score"]) for r in targets]
    assert scores == sorted(scores, reverse=True)
