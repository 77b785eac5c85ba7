"""Gauntlet-guard-style enforcement for the at-scale parity artifact
(round-10 verdict item 1): the committed ``SCALE_PARITY_r{N}.json``
must exist, be green, and cover the pinned risky-key set — so "values
were checked at 8x" is a mechanically verifiable claim, not prose.

The pinned set mirrors tools/scale_parity.py's TARGET_KEYS rationale:
iterative graph plans, the exact integer-moment stats lanes, the
double-precision time-series lanes, the prefix-sum percentile lanes,
the corpus pipeline, and two >100k-row detail results that exercise
the in-engine checksum fold itself.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Minimum coverage the artifact must certify (a superset is fine).
PINNED = {
    "q_graph_ktruss",
    "q_graph_betweenness",
    "q_graph_closeness",
    "q_graph_eccentricity",
    "q_stat_kruskal",
    "q_stat_cvm",
    "q_stat_jonckheere",
    "q_ts_kpss",
    "q_ts_adf",
    "q_agg_percentile",
    "q_events_gap_percentiles",
    "q_pipeline_clean_corpus",
    "q_corpus_budget_select",
    "q_window_rank",
    "q_quality_checksum",
}


def _latest_artifact() -> str | None:
    best, best_round = None, -1
    for path in glob.glob(os.path.join(REPO, "SCALE_PARITY_r*.json")):
        m = re.search(r"SCALE_PARITY_r(\d+)\.json$", path)
        if m and int(m.group(1)) > best_round:
            best, best_round = path, int(m.group(1))
    return best


def test_scale_parity_artifact_green():
    path = _latest_artifact()
    assert path, (
        "no committed SCALE_PARITY_r*.json — run tools/scale_parity.py "
        "and commit the artifact"
    )
    with open(path) as f:
        payload = json.load(f)
    assert payload.get("scale", 0) >= 8, (
        f"{os.path.basename(path)}: at-scale parity must run at >=8x "
        f"(got scale={payload.get('scale')})"
    )
    keys = payload.get("keys", {})
    missing = sorted(PINNED - set(keys))
    assert not missing, (
        f"{os.path.basename(path)} missing pinned at-scale keys: {missing}"
    )
    failed = sorted(k for k, v in keys.items() if not v.get("pass"))
    assert payload.get("all_pass") and not failed, (
        f"{os.path.basename(path)} records at-scale value mismatches: "
        f"{failed} — a red artifact certifies nothing; fix and re-run "
        f"tools/scale_parity.py"
    )
    # every passing entry must have actually compared something
    for k in PINNED:
        assert keys[k].get("n_rows", 0) > 0, (
            f"{k}: 0-row at-scale result certifies nothing"
        )


# Cumulative at-scale coverage floor (round-11 verdict item 1): the
# committed ledger may only GROW. Bump this constant when a round adds
# coverage; a ledger regression (lost evidence, clobbered file) fails
# here mechanically. r11 seeded 96 keys from the five committed
# SCALE_PARITY_r11* artifacts; the r12 sweeps (pinned 42, tranche 96,
# extra 84+224+3, 32x/64x/skew) completed the registry: every key
# value-checked at replica scale at least once; the Holt-Winters,
# Page, and Croston keys landed with their 8x (+skew where per-user)
# evidence in the same session (extra4-extra7, uskew2); Anderson-
# Darling, Theta, Fligner-Killeen, van der Waerden, Moran's I,
# Geary's C, Getis-Ord G, turning-points, and Bartels rank landed
# with their 8x evidence in extra8-extra14; Breslow-Day, Dunn's
# post-hoc, and Heaps' law in extra15-extra17; RMST in extra18 +
# uskew4; Cucconi, Count-Min, AMS-F2, BY-FDR, seasonal MK, Cliff's
# delta, Yuen's t, the periodogram, resource-allocation, Lin's CCC,
# and the jackknife ratio in extra19-extra29.
COVERAGE_FLOOR = 521


def test_scale_coverage_ledger_cumulative():
    path = os.path.join(REPO, "SCALE_COVERAGE.json")
    assert os.path.exists(path), (
        "no committed SCALE_COVERAGE.json — tools/scale_parity.py "
        "maintains the cumulative at-scale coverage ledger"
    )
    with open(path) as f:
        ledger = json.load(f)
    covered = ledger.get("covered", {})
    assert len(covered) >= COVERAGE_FLOOR, (
        f"coverage ledger shrank: {len(covered)} < floor {COVERAGE_FLOOR} "
        f"— at-scale evidence is append-only; restore the lost entries"
    )
    assert ledger.get("n_keys_covered") == len(covered)
    # every ledger key must be a real registry key (a rename must
    # migrate its evidence, not strand it)
    from trembita_spark import contract

    contract.load_all()
    stray = sorted(set(covered) - set(contract.QUERIES))
    assert not stray, f"ledger keys not in the registry: {stray}"
    # evidence tags are well-formed
    for k, tags in covered.items():
        assert tags and all(
            re.fullmatch(r"r\d+@(\d+x|u?skew)", t) for t in tags
        ), f"{k}: malformed evidence tags {tags}"
    # consistency: every green key in the committed at-scale artifacts
    # appears in the ledger (the union step ran)
    for path in glob.glob(os.path.join(REPO, "SCALE_PARITY_r*.json")):
        with open(path) as f:
            payload = json.load(f)
        missing = sorted(
            k
            for k, v in payload.get("keys", {}).items()
            if v.get("pass") is True and k not in covered
        )
        assert not missing, (
            f"{os.path.basename(path)}: green keys absent from the "
            f"coverage ledger: {missing}"
        )


def test_staged_oracle_matches_committed_oracle(oracle):
    """tools/scale_parity.py stages some oracles as temp-table statement
    sequences (DuckDB 1.0 executes deep MATERIALIZED-CTE chains
    pathologically at 8x). The staged sequence must stay the IDENTICAL
    recurrence: at sf0.01 its result must equal the committed
    single-statement oracle's, row for row."""
    from tools.scale_parity import ALT_ORACLES, STAGED_ORACLES, run_staged
    from trembita_spark import contract

    contract.load_all()
    for key, staged in STAGED_ORACLES.items():
        final = run_staged(oracle, staged)
        got = sorted(oracle.execute(final).fetchall())
        want = sorted(oracle.execute(contract.ORACLES[key]).fetchall())
        assert got == want, (
            f"{key}: staged oracle diverged from the committed oracle "
            f"(first rows: staged={got[:3]} committed={want[:3]})"
        )
    # ALT reformulations (different SQL, same result) carry the same
    # obligation: row-for-row equality with the committed oracle.
    for key, alt in ALT_ORACLES.items():
        got = sorted(oracle.execute(alt).fetchall())
        want = sorted(oracle.execute(contract.ORACLES[key]).fetchall())
        assert got == want, (
            f"{key}: ALT oracle diverged from the committed oracle "
            f"(first rows: alt={got[:3]} committed={want[:3]})"
        )
