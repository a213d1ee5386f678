"""Golden-content parity gate: both pipelines on one fixture, all nine
CSV artifacts diffed CELL BY CELL (tools/parity_vs_reference.py).

This is the strict version of the count-only head-to-head: contact_ids,
rendered channel strings, detail JSON, scores, tags and bucket rows must
all be identical to the reference pipeline's output
(combine_contacts.py:1562-1568, validate_quality.py:194-221,
confidence_report.py:235-262, tag_contacts.py:171-176)."""

from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

from parity_vs_reference import (  # noqa: E402
    ARTIFACTS, norm_cell, parity_report, run_pipelines,
)


@pytest.fixture(scope="module")
def parity(tmp_path_factory):
    from bench_vs_reference import gen_fixtures

    tmp = tmp_path_factory.mktemp("parity")
    fix, ref_out, our_out = (str(tmp / d) for d in
                             ("fix", "ref_out", "our_out"))
    for d in (fix, ref_out, our_out):
        os.makedirs(d)
    gen_fixtures(150, fix)
    run_pipelines(fix, ref_out, our_out)
    return parity_report(ref_out, our_out)


@pytest.mark.parametrize("artifact", ARTIFACTS)
def test_artifact_cell_parity(parity, artifact):
    report = parity["artifacts"][artifact]
    assert report.get("match"), report
    assert report["ref_rows"] > 0


def test_norm_cell_numeric_and_json():
    assert norm_cell("5.0") == norm_cell("5")
    assert norm_cell("-3.25") == norm_cell("-3.250")
    assert norm_cell('{"b": 1, "a": []}') == norm_cell('{"a":[],"b":1}')
    assert norm_cell("") == ""
    # non-JSON text passes through verbatim
    assert norm_cell(" keep me ") == " keep me "
