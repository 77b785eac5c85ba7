"""Regenerate SURVEY.md §9 (implementation-status ledger) from the live
contract registry. Run after adding/removing contract keys."""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trembita_spark import contract  # noqa: E402

MARK = "\n\n---\n\n## 9. Implementation status"


def main() -> None:
    contract.load_all()
    keys = sorted(contract.QUERIES)
    oracled = set(contract.ORACLES)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    s = open(path).read()
    if MARK in s:
        s = s[: s.index(MARK)]
    lines = [
        f"| `{k}` | {'oracle-checked' if k in oracled else 'rows-only'} | "
        f"`trembita_spark/contract/{contract.QUERIES[k].__module__.split('.')[-1]}.py` |"
        for k in keys
    ]
    today = dt.date.today().isoformat()
    sec = f"""{MARK} (generated {today})

Every key from §3's inventory is implemented and registered in
`__spark_entry__.py` (via `trembita_spark/contract/`): **{len(keys)} queries,
{len(oracled)} DuckDB-oracle-checked** (bit-exact value parity, verified
locally by `tests/test_oracle_parity.py` at sf0.01), {len(keys) - len(oracled)} rows-only
(HLL/KLL sketches, float-centroid IVF, side-effect sinks/scans,
streaming smokes, seeded random source — each justified at its
definition). Physical-plan guarantees are asserted in
`tests/test_plans.py`; measured perf and an 8x scaling experiment in
`BASELINE.md` §4–5. Regenerate with `python tools/update_survey_ledger.py`.

| key | check | module |
|---|---|---|
""" + "\n".join(lines) + "\n"
    open(path, "w").write(s + sec)
    print(f"ledger: {len(keys)} keys ({len(oracled)} oracle-checked)")


if __name__ == "__main__":
    main()
