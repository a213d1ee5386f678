"""Loader tests against synthetic fixture files (FIXTURES.md §1,
reference test contracts for row ids, nicknames, TYPE filtering)."""

from __future__ import annotations

import textwrap

import pytest

from contacts_etl_phase21_spark.sources.gmail import load_gmail
from contacts_etl_phase21_spark.sources.linkedin import load_linkedin
from contacts_etl_phase21_spark.sources.union import load_sources
from contacts_etl_phase21_spark.sources.vcard import load_vcards

LINKEDIN_CSV = """\
Notes:,,,
"A banner line the export tool adds",,,
First Name,Last Name,URL,Email Address,Company,Position,Connected On
John,Doe,https://linkedin.com/in/jdoe,john@example.com,Acme,Engineer,03 Jan 2024
Jane,Roe,https://other.site/jr,,Globex,Manager,04 Feb 2023
"""

GMAIL_CSV = """\
First Name,Middle Name,Last Name,Name Prefix,Name Suffix,Nickname,Organization Name,Organization Title,Organization Department,Notes,E-mail 1 - Value,E-mail 1 - Label,E-mail 2 - Value,E-mail 2 - Label,Phone 1 - Value,Phone 1 - Label,Address 1 - PO Box,Address 1 - Extended Address,Address 1 - Street,Address 1 - City,Address 1 - Region,Address 1 - Postal Code,Address 1 - Country,Address 1 - Label
Bill,,Doe,,,Billy,Initech,Developer,,Some note,bill@x.com ::: bdoe@y.com,* Work,,,(617) 555-0100 ext 12,iPhone,,,"123 Elm St
Sampleville, MA 02144",,,,,Home
"""

VCF = textwrap.dedent("""\
    BEGIN:VCARD
    VERSION:3.0
    FN:Casey Example
    N:Example;Casey;;;
    NICKNAME:Case
    ORG:Acme;Platform
    EMAIL;TYPE=INTERNET;TYPE=WORK;TYPE=pref:casey.work@example.com
    TEL;TYPE=CELL;TYPE=pref:+1-555-000-0003
    item1.X-ABLABEL:_$!<Home>!$_
    item1.EMAIL;TYPE=INTERNET:casey.home@example.com
    REV:2024-06-01T10:00:00Z
    NOTE:Prefers email intros
    END:VCARD
    BEGIN:VCARD
    VERSION:3.0
    FN:Riley Example
    N:Example;Riley;;;
    ADR;TYPE=HOME:;;123 Elm St;Sampleville;MA;02144;USA
    URL:https://www.linkedin.com/in/riley
    END:VCARD
""")


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("srcfixtures")
    li = d / "linkedin.csv"
    li.write_text(LINKEDIN_CSV)
    gm = d / "gmail.csv"
    gm.write_text(GMAIL_CSV)
    vc = d / "mac.vcf"
    vc.write_text(VCF)
    return str(li), str(gm), str(vc)


def test_linkedin_loader(spark, fixture_paths):
    li, _, _ = fixture_paths
    rows = {r["source_row_id"]: r for r in load_linkedin(spark, li).collect()}
    assert len(rows) == 2
    john = rows["0"]
    assert john["full_name"] == "John Doe"
    assert john["linkedin_url"] == "https://linkedin.com/in/jdoe"
    assert john["emails"][0]["value"] == "john@example.com"
    assert john["emails"][0]["label"] == "home"
    assert john["source_timestamp"].startswith("2024-01-03")
    jane = rows["1"]
    assert jane["linkedin_url"] == ""  # non-linkedin URL nulled out
    assert jane["emails"] == []


def test_gmail_loader(spark, fixture_paths):
    _, gm, _ = fixture_paths
    rows = load_gmail(spark, gm).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["nickname"] == "Billy"
    assert r["full_name"] == "Bill Doe"
    # ::: multi-value split, preferred '*' stripped, 'Work' canonicalized
    assert [e["value"] for e in r["emails"]] == ["bill@x.com", "bdoe@y.com"]
    assert all(e["label"] == "work" for e in r["emails"])
    # extension extraction + iPhone → mobile
    assert r["phones"][0]["extension"] == "12"
    assert r["phones"][0]["label"] == "mobile"
    # multi-line street: second line absorbed as city/state/zip
    addr = r["addresses"][0]
    assert addr["street"] == "123 Elm St"
    assert addr["city"] == "Sampleville"
    assert addr["state"] == "MA"
    assert addr["postal_code"] == "02144"
    assert addr["label"] == "home"


def test_vcard_loader(spark, fixture_paths):
    _, _, vc = fixture_paths
    rows = {r["source_row_id"]: r for r in load_vcards(spark, vc).collect()}
    assert len(rows) == 2  # row ids assigned in file order
    casey = rows["0"]
    assert casey["full_name"] == "Casey Example"
    assert casey["nickname"] == "Case"
    assert casey["company"] == "Acme"
    assert casey["department"] == "Platform"
    # TYPE=pref/INTERNET dropped → work survives
    labels = {e["value"]: e["label"] for e in casey["emails"]}
    assert labels["casey.work@example.com"] == "work"
    # item-group Apple label
    assert labels["casey.home@example.com"] == "home"
    assert casey["phones"][0]["label"] == "cell"
    assert casey["source_timestamp"] == "2024-06-01T10:00:00Z"
    assert casey["notes"] == "Prefers email intros"
    riley = rows["1"]
    assert riley["addresses"][0]["street"] == "123 Elm St"
    assert riley["addresses"][0]["label"] == "home"
    assert riley["linkedin_url"] == "https://www.linkedin.com/in/riley"


def test_union_sources(spark, fixture_paths):
    li, gm, vc = fixture_paths
    df = load_sources(spark, linkedin_csv=li, gmail_csv=gm, mac_vcf=vc)
    by_source = {r["source"]: r for r in df.collect()}
    assert set(by_source) == {"linkedin", "gmail", "mac_vcf"}
    assert df.count() == 5


def test_gmail_multi_file_row_ids(spark, tmp_path):
    """r05: a multi-file drop directory numbers rows per-file in
    parallel (io.with_file_order_ids) — consecutive 0..N-1 ids across
    files in lexicographic path order, no coalesce(1) funnel."""
    d = tmp_path / "gmail_multi"
    d.mkdir()
    header, row = GMAIL_CSV.split("\n", 1)
    (d / "a_export.csv").write_text(
        header + "\n" + row.replace("Bill", "Alpha"))
    (d / "b_export.csv").write_text(
        header + "\n" + row.replace("Bill", "Beta"))
    rows = load_gmail(spark, str(d)).collect()
    by_id = {r["source_row_id"]: r["full_name"] for r in rows}
    # a_export.csv sorts first → its row takes id 0
    assert by_id == {"0": "Alpha Doe", "1": "Beta Doe"}


def test_vcard_multi_file_row_ids(spark, tmp_path):
    d = tmp_path / "vcf_multi"
    d.mkdir()
    (d / "a.vcf").write_text(VCF)
    (d / "b.vcf").write_text(VCF.replace("Casey", "Dana")
                             .replace("Riley", "Sky"))
    rows = {r["source_row_id"]: r["full_name"]
            for r in load_vcards(spark, str(d)).collect()}
    assert rows == {"0": "Casey Example", "1": "Riley Example",
                    "2": "Dana Example", "3": "Sky Example"}
