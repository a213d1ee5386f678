"""Head-to-head: this engine vs the reference pipeline on identical
source files (BASELINE.json north star: match-or-beat the reference's
single-node throughput at the same data scale).

Generates deterministic LinkedIn CSV + Gmail CSV + vCard fixtures
(person i appears in gmail always, linkedin when i%2==0, vcard when
i%4==0, sharing an email -> the ER core must merge them), then runs
BOTH four-stage pipelines as subprocesses (each pays its own process
startup — JVM included for ours; that is the honest single-node cost):

  reference: PYTHONPATH=/root/reference/src, the four CLI mains
  ours:      python -m contacts_etl_phase21_spark.cli pipeline

Usage: python tools/bench_vs_reference.py [N ...]   (default 2000 20000)
Prints one JSON line per N.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REF_SRC = "/root/reference/src"

_LI_HEADER = ("First Name,Last Name,URL,Email Address,Company,Position,"
              "Connected On\n")
_GM_HEADER = (
    "First Name,Middle Name,Last Name,Name Prefix,Name Suffix,Nickname,"
    "Organization Name,Organization Title,Organization Department,Notes,"
    "E-mail 1 - Value,E-mail 1 - Label,Phone 1 - Value,Phone 1 - Label,"
    "Address 1 - Street,Address 1 - City,Address 1 - Region,"
    "Address 1 - Postal Code,Address 1 - Country,Address 1 - Label\n")


def gen_fixtures(n_records: int, fix_dir: str) -> int:
    """Write the three source files totalling ~n_records rows; returns
    the distinct-person count. Surname pool scales with the corpus
    (constant block sizes, as in bench_pipeline)."""
    persons = max(4, int(n_records / 1.75))
    last_pool = max(11, persons // 25)

    def first(i: int) -> str:
        return f"First{(i // last_pool * 7919 + 13) % 997}"

    def last(i: int) -> str:
        return f"Surname{i % last_pool}"

    def email(i: int) -> str:
        return f"{first(i).lower()}.{last(i).lower()}.{i}@example.com"

    with open(f"{fix_dir}/linkedin.csv", "w", encoding="utf-8") as fh:
        fh.write(_LI_HEADER)
        for i in range(0, persons, 2):
            fh.write(f"{first(i)},{last(i)},"
                     f"https://linkedin.com/in/p{i},{email(i)},"
                     f"Company{i % 50},Title{i % 20},03 Jan 2024\n")
    with open(f"{fix_dir}/gmail.csv", "w", encoding="utf-8") as fh:
        fh.write(_GM_HEADER)
        for i in range(persons):
            fh.write(f"{first(i)},,{last(i)},,,,Company{i % 50},,,,"
                     f"{email(i)},Home,(617) 555-{i % 10000:04d},Mobile,"
                     f"{i % 99} Shore Rd,Quincy,MA,02169,US,Home\n")
    with open(f"{fix_dir}/mac.vcf", "w", encoding="utf-8") as fh:
        for i in range(0, persons, 4):
            fh.write("BEGIN:VCARD\nVERSION:3.0\n"
                     f"FN:{first(i)} {last(i)}\n"
                     f"N:{last(i)};{first(i)};;;\n"
                     f"EMAIL;TYPE=INTERNET;TYPE=WORK:{email(i)}\n"
                     "END:VCARD\n")
    return persons


def _run(cmd: list[str], env: dict | None = None) -> float:
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return time.perf_counter() - t0


def run_reference(fix: str, out: str) -> dict[str, float]:
    env = dict(os.environ, PYTHONPATH=_REF_SRC)

    def stage(module: str, *args: str) -> float:
        return _run([sys.executable, "-c",
                     f"import sys; from contacts_etl import {module}; "
                     f"sys.exit({module}.main())", *args], env=env)

    t = {}
    t["consolidate"] = stage(
        "combine_contacts",
        "--linkedin-csv", f"{fix}/linkedin.csv",
        "--gmail-csv", f"{fix}/gmail.csv",
        "--mac-vcf", f"{fix}/mac.vcf", "--out-dir", out)
    t["validate"] = stage(
        "validate_quality",
        "--contacts-csv", f"{out}/consolidated_contacts.csv",
        "--out-dir", out)
    t["confidence"] = stage(
        "confidence_report",
        "--contacts-csv", f"{out}/consolidated_contacts.csv",
        "--validation-csv", f"{out}/validation_report.csv",
        "--out-dir", out)
    t["tag"] = stage(
        "tag_contacts",
        "--contacts-csv", f"{out}/consolidated_contacts.csv",
        "--lineage-csv", f"{out}/consolidated_lineage.csv",
        "--gmail-csv", f"{fix}/gmail.csv",
        "--mac-vcf", f"{fix}/mac.vcf", "--out-dir", out)
    t["total"] = round(sum(t.values()), 1)
    return {k: round(v, 1) for k, v in t.items()}


def run_ours(fix: str, out: str) -> dict[str, float]:
    total = _run([sys.executable, "-m", "contacts_etl_phase21_spark.cli",
                  "pipeline",
                  "--linkedin-csv", f"{fix}/linkedin.csv",
                  "--gmail-csv", f"{fix}/gmail.csv",
                  "--mac-vcf", f"{fix}/mac.vcf", "--out-dir", out],
                 env=dict(os.environ, PYTHONPATH=_REPO))
    return {"total": round(total, 1)}


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [2_000, 20_000]
    for n in sizes:
        with tempfile.TemporaryDirectory(prefix="hh_") as tmp:
            fix = os.path.join(tmp, "fix")
            os.makedirs(fix)
            persons = gen_fixtures(n, fix)
            ref_out = os.path.join(tmp, "ref_out")
            our_out = os.path.join(tmp, "our_out")
            os.makedirs(ref_out)
            os.makedirs(our_out)
            ref = run_reference(fix, ref_out)
            ours = run_ours(fix, our_out)
            print(json.dumps({
                "metric": "pipeline_head_to_head_sec",
                "records": n, "persons": persons,
                "reference": ref, "spark": ours,
                "speedup": round(ref["total"] / max(ours["total"], 0.1), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
