"""Unit tests for the scalar function library — behavioral vectors from
the reference's test contract (FIXTURES.md §3, SURVEY.md §5)."""

from __future__ import annotations

from datetime import datetime

from contacts_etl_phase21_spark.functions.emails import clean_email
from contacts_etl_phase21_spark.functions.geo import (
    address_match_key, country_iso2, split_embedded_city_state_zip, state_code,
)
from contacts_etl_phase21_spark.functions.ids import parse_linkedin_date, stable_uuid
from contacts_etl_phase21_spark.functions.labels import (
    apple_label, gmail_label, rank_is_better, should_replace_label,
    vcard_type_tokens,
)
from contacts_etl_phase21_spark.functions.names import (
    guess_from_email_local, initial_from_email, nickname_equivalent,
    parse_full_name, split_multi_last,
)
from contacts_etl_phase21_spark.functions.phones import (
    attach_orphan_extensions, extract_phone_values, phone_is_valid,
    phone_to_e164, split_extension,
)
from contacts_etl_phase21_spark.functions.similarity import (
    hamming64, jaccard, minhash_signature, seq_ratio, simhash64,
)
from contacts_etl_phase21_spark.functions.text import (
    email_domain, fold_text, pull_emails, vcard_unescape,
)


# ---- phones (reference tests:48-53) ----------------------------------------

def test_phone_e164_formats():
    assert phone_to_e164("(415) 555-2671") == "+14155552671"
    assert phone_to_e164("1-415-555-2671") == "+14155552671"
    assert phone_to_e164("+44 20 7946 0958") == "+442079460958"
    assert phone_to_e164("") == ""


def test_phone_validity_fallback():
    assert phone_is_valid("+14155552671")
    assert not phone_is_valid("415-555-2671")  # fallback needs leading '+'
    assert not phone_is_valid("")


def test_extension_handling():
    assert split_extension("617-555-0100 ext 12") == ("617-555-0100", "12")
    assert split_extension("617-555-0100;45") == ("617-555-0100", "45")
    assert split_extension("617-555-0100 x99") == ("617-555-0100", "99")
    assert split_extension("617-555-0100p77#") == ("617-555-0100", "77")
    assert split_extension("617-555-0100") == ("617-555-0100", "")


def test_orphan_extension_merge():
    merged = attach_orphan_extensions([("617-555-0100", ""), ("ext 12", "")])
    assert merged == [("617-555-0100", "12")]


def test_extract_phone_values_multi():
    # token regex anchors at the first digit (PHONE_VALUE_PATTERN,
    # combine_contacts.py:107) — leading '(' is not part of the match
    got = extract_phone_values("(617) 555-0100 ::: (617) 555-0200 ext 9")
    assert got == [("617) 555-0100", ""), ("617) 555-0200", "9")]


# ---- emails ----------------------------------------------------------------

def test_clean_email_fallback():
    assert clean_email(" John.Doe@Example.COM ") == "john.doe@example.com"
    assert clean_email("not-an-email") == ""
    assert clean_email("") == ""


def test_email_domain():
    assert email_domain("a@B.com") == "b.com"
    assert email_domain("nope") == ""


# ---- text ------------------------------------------------------------------

def test_fold_text():
    assert fold_text("  José   GARCÍA ") == "jose garcia"
    assert fold_text(None) == ""


def test_pull_emails():
    cleaned, found = pull_emails("Jane Doe jane@x.com")
    assert cleaned == "Jane Doe"
    assert found == ["jane@x.com"]


def test_vcard_unescape():
    assert vcard_unescape(r"a\,b\;c\nd") == "a,b;c\nd"


# ---- geo -------------------------------------------------------------------

def test_state_and_country():
    assert state_code("Massachusetts") == "MA"
    assert state_code("ma") == "MA"
    assert country_iso2("United States") == "US"
    assert country_iso2("uk") == "GB"
    assert country_iso2("Atlantis") == "Atlantis"


def test_embedded_address_split():
    s, c, st, z = split_embedded_city_state_zip("123 Elm St, Sampleville, MA 02144")
    assert (s, c, st, z) == ("123 Elm St", "Sampleville", "MA", "02144")


def test_address_match_key():
    assert address_match_key("Boston", "MA", "") == "boston|ma|"
    assert address_match_key("Boston", "", "") is None


# ---- names (FIXTURES §3 vectors) ------------------------------------------

def test_split_multi_last_particles():
    assert split_multi_last("Ana de la Cruz") == ("Ana", "", "de la Cruz")
    assert split_multi_last("John Smith") == ("John", "", "Smith")
    assert split_multi_last("Mary Jane Watson") == ("Mary", "Jane", "Watson")


def test_parse_full_name_suffixes():
    p = parse_full_name("Dr. John A. Smith Jr., CPA/MBA")
    assert p.prefix == "Dr."
    assert p.first == "John"
    assert p.middle == "A."
    assert p.last == "Smith"
    assert p.generational == "Jr."
    assert p.professional == ["CPA", "MBA"]
    assert p.clean_full == "Dr. John A. Smith Jr."


def test_parse_full_name_maiden():
    p = parse_full_name("Jane Doe (Smith)")
    assert p.maiden == "Smith"
    assert (p.first, p.last) == ("Jane", "Doe")


def test_nickname_equivalence():
    assert nickname_equivalent("Bill", "William")
    assert nickname_equivalent("Billy", "Will")
    assert not nickname_equivalent("Bill", "Robert")
    assert not nickname_equivalent("", "William")


def test_email_name_guesses():
    assert guess_from_email_local("jane.doe") == ("Jane", "Doe")
    assert initial_from_email("jdoe", "Doe") == "J"
    assert initial_from_email("doe", "Doe") == ""


# ---- labels ----------------------------------------------------------------

def test_gmail_label():
    assert gmail_label("* Work", "email") == ("work", True)
    assert gmail_label("iPhone", "phone") == ("mobile", False)
    assert gmail_label("Custom", "email") == ("other", False)
    assert gmail_label("", "email") == ("", False)


def test_apple_label():
    assert apple_label("_$!<Work>!$_") == "work"
    assert apple_label("_$!<Custom>!$_") == "custom"
    assert apple_label("plain") == "plain"


def test_vcard_type_tokens():
    # TYPE=INTERNET;TYPE=WORK;TYPE=pref → work (tests:505-533)
    assert vcard_type_tokens(["TYPE=INTERNET", "TYPE=WORK", "TYPE=pref"]) == ["work"]
    assert vcard_type_tokens(["TYPE=CELL,pref"]) == ["cell"]
    assert vcard_type_tokens(["TYPE=x-custom"]) == ["custom"]


def test_rank_lattice():
    t1, t2 = datetime(2024, 1, 1), datetime(2024, 6, 1)
    assert rank_is_better((t2, 1), (t1, 3))       # newer ts beats priority
    assert rank_is_better((t1, 3), (t1, 2))       # tie ts → priority
    assert not rank_is_better((t1, 2), (t1, 2))   # full tie → keep existing
    assert rank_is_better((t1, 0), (None, 3))     # any ts beats none
    # label survivorship: specific displaces 'other' when not older
    assert should_replace_label("other", (t1, 1), "work", (t1, 1))
    assert not should_replace_label("work", (t2, 1), "other", (t1, 1))
    # equal priority fills empty label
    assert should_replace_label("", (t1, 1), "home", (t1, 1))


# ---- similarity ------------------------------------------------------------

def test_seq_ratio_threshold():
    # merge-critical: difflib semantics, 0.88 threshold neighborhood
    assert seq_ratio("Jon", "John") > 0.85
    assert seq_ratio("abc", "abc") == 1.0
    assert seq_ratio("", "") == 1.0


def test_minhash_estimates_jaccard():
    a = {f"tok{i}" for i in range(100)}
    b = {f"tok{i}" for i in range(50, 150)}
    sig_a, sig_b = minhash_signature(a, 128), minhash_signature(b, 128)
    est = sum(x == y for x, y in zip(sig_a, sig_b)) / 128
    true = jaccard(a, b)
    assert abs(est - true) < 0.15


def test_simhash_near_dup():
    t1 = [f"w{i}" for i in range(200)]
    t2 = t1[:-4] + ["x1", "x2", "x3", "x4"]
    assert hamming64(simhash64(t1), simhash64(t2)) <= 12
    assert hamming64(simhash64(t1), simhash64([f"z{i}" for i in range(200)])) > 12


# ---- ids -------------------------------------------------------------------

def test_stable_uuid_deterministic():
    assert stable_uuid("a|b|c") == stable_uuid("a|b|c")
    assert stable_uuid("a|b|c") != stable_uuid("a|b|d")


def test_linkedin_date():
    assert parse_linkedin_date("03 Jan 2024") == datetime(2024, 1, 3)
    assert parse_linkedin_date("2024-01-03") == datetime(2024, 1, 3)
    assert parse_linkedin_date("") is None


def test_register_sql_functions(spark):
    from contacts_etl_phase21_spark.functions import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql(
        "SELECT seq_ratio('bill', 'billy') AS r,"
        "       fold_text('  José  GARCÍA ') AS f,"
        "       nickname_root('Billy') AS n,"
        "       parse_full_name('Dr. Jane van der Berg Jr., PhD').last_name AS l"
    ).collect()[0]
    assert 0.8 < row["r"] < 1.0
    assert row["f"] == "jose garcia"
    assert row["n"] == "william"
    assert row["l"] == "van der Berg"


def test_e7_oracle_pooling_claims():
    """The e7_first_name_vote DuckDB oracle is valid because the fuzzy
    pooling branch (seq_ratio >= 0.9) provably never fires on its
    candidate keys {bill, william, will} and explicit names out-rank
    guesses — pin exactly those claims."""
    assert seq_ratio("bill", "william") < 0.9
    assert seq_ratio("bill", "will") < 0.9
    assert seq_ratio("william", "will") < 0.9
    from contacts_etl_phase21_spark.functions.merge_core import (
        choose_best_first_name,
    )

    # 5 explicit 'Bill' voters + will-guess emails: explicit wins even
    # though the guesses pool 1.5 x 5 = 7.5 > 5.0
    records = [{"source": "gmail", "first_name": "Bill",
                "emails": [{"value": f"will.smith{i}@x.com"}]}
               for i in range(5)]
    best, key = choose_best_first_name(records)
    assert (best, key) == ("Bill", "bill")
