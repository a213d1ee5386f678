"""Golden-content parity: run the reference pipeline and this engine on
one identical fixture, then diff every CSV artifact CELL BY CELL.

This is the strict pipeline-parity gate the count-only head-to-head
(bench_vs_reference.py) does not provide: a user switching engines must
get the same nine files, not just the same row counts
(reference Makefile:55, combine_contacts.py:1562-1568,
validate_quality.py:194-221, confidence_report.py:235-262,
tag_contacts.py:171-176).

Comparison protocol (mirrors the driver's oracle compare):
  - columns sorted by name on both sides,
  - rows sorted by the full normalized cell tuple (order-insensitive),
  - cells compared as normalized strings: numeric strings compare by
    value ("5" == "5.0"; pandas int-vs-float formatting is not a
    semantic difference), JSON-array/object cells compare by parsed
    value (key order / separator whitespace is serializer choice).

Usage: python tools/parity_vs_reference.py [N]   (default 600 records)
Prints one JSON report line; exit 1 on any cell mismatch.
"""

from __future__ import annotations

import csv
import glob
import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

ARTIFACTS = (
    "consolidated_contacts.csv",
    "consolidated_lineage.csv",
    "flattened_contacts.csv",
    "validation_report.csv",
    "contact_quality_scored.csv",
    "confidence_report.csv",
    "confidence_summary.csv",
    "tagged_contacts.csv",
    "referral_targets.csv",
)


def read_artifact(path: str) -> tuple[list[str], list[dict]]:
    """Read a CSV artifact — a plain file (reference) or a Spark output
    directory holding one part file (ours)."""
    if os.path.isdir(path):
        [path] = glob.glob(os.path.join(path, "part-*.csv"))
    with open(path, newline="", encoding="utf-8") as fh:
        reader = csv.DictReader(fh)
        return list(reader.fieldnames or []), list(reader)


def norm_cell(value: str | None) -> str:
    """Engine-neutral cell form: numbers by value, JSON by parsed value,
    everything else verbatim."""
    s = "" if value is None else str(value)
    t = s.strip()
    if t and t.lstrip("-").replace(".", "", 1).isdigit():
        try:
            f = float(t)
            return str(int(f)) if f == int(f) else repr(f)
        except (ValueError, OverflowError):
            pass
    if t[:1] in "[{":
        try:
            return json.dumps(json.loads(t), sort_keys=True,
                              ensure_ascii=False)
        except ValueError:
            pass
    return s


def compare_artifact(ref_path: str, ours_path: str,
                     max_samples: int = 5) -> dict:
    """Cell-level diff of one artifact. Returns a report dict."""
    ref_cols, ref_rows = read_artifact(ref_path)
    our_cols, our_rows = read_artifact(ours_path)
    report: dict = {"ref_rows": len(ref_rows), "our_rows": len(our_rows)}
    missing = sorted(set(ref_cols) - set(our_cols))
    extra = sorted(set(our_cols) - set(ref_cols))
    if missing or extra:
        report.update(match=False, missing_cols=missing, extra_cols=extra)
        return report
    cols = sorted(ref_cols)

    def canon(rows: list[dict]) -> list[tuple[str, ...]]:
        return sorted(tuple(norm_cell(r.get(c)) for c in cols)
                      for r in rows)

    a, b = canon(ref_rows), canon(our_rows)
    if a == b:
        report.update(match=True, cells=len(a) * len(cols))
        return report
    diffs = []
    for ra, rb in zip(a, b):
        if ra == rb:
            continue
        for c, va, vb in zip(cols, ra, rb):
            if va != vb and len(diffs) < max_samples:
                diffs.append({"col": c, "ref": va[:200], "ours": vb[:200]})
    n_diff_rows = sum(1 for ra, rb in zip(a, b) if ra != rb) \
        + abs(len(a) - len(b))
    report.update(match=False, n_diff_rows=n_diff_rows, samples=diffs)
    return report


def run_pipelines(fix: str, ref_out: str, our_out: str) -> None:
    from bench_vs_reference import run_ours, run_reference
    run_reference(fix, ref_out)
    run_ours(fix, our_out)


def parity_report(ref_out: str, our_out: str) -> dict:
    arts = {}
    for name in ARTIFACTS:
        ref_p = os.path.join(ref_out, name)
        our_p = os.path.join(our_out, name)
        if not os.path.exists(ref_p) or not os.path.exists(our_p):
            arts[name] = {"match": False,
                          "missing_file": [p for p in (ref_p, our_p)
                                           if not os.path.exists(p)]}
            continue
        arts[name] = compare_artifact(ref_p, our_p)
    arts_match = sum(1 for a in arts.values() if a.get("match"))
    return {"metric": "golden_content_parity",
            "artifacts_match": arts_match,
            "artifacts_total": len(ARTIFACTS),
            "artifacts": arts}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    from bench_vs_reference import gen_fixtures
    with tempfile.TemporaryDirectory(prefix="parity_") as tmp:
        fix = os.path.join(tmp, "fix")
        ref_out = os.path.join(tmp, "ref_out")
        our_out = os.path.join(tmp, "our_out")
        for d in (fix, ref_out, our_out):
            os.makedirs(d)
        gen_fixtures(n, fix)
        run_pipelines(fix, ref_out, our_out)
        report = parity_report(ref_out, our_out)
    report["records"] = n
    print(json.dumps(report), flush=True)
    return 0 if report["artifacts_match"] == report["artifacts_total"] else 1


if __name__ == "__main__":
    sys.exit(main())
