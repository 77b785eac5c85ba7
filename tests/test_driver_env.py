"""Driver-environment simulation: the grading driver constructs its OWN
SparkSession (not our factory). Contract queries must not depend on the
factory's confs — table() / events_stream() pin
spark.sql.session.timeZone=UTC per call, and no query relies on our AQE
or shuffle-partition tuning for correctness.

Two subprocess scenarios (sessions are JVM-singletons per process, so an
in-process test would silently inherit the conftest session's confs and
prove nothing):

1. Bare builder, UTC host (what the driver actually runs): byte-strict
   equality vs the DuckDB oracle.
2. Bare builder, TZ=America/New_York: SEMANTIC (epoch-level) equality.
   PySpark's plain ``collect()`` renders TimestampType in the *Python
   process* timezone regardless of the session conf — a presentational
   shift library code cannot prevent; the stored instants must still be
   exactly right. (The driver's host is UTC, so scenario 1 is the
   operative gate; this one pins that only presentation, never values,
   varies with host TZ.)
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import datetime as dt
import sys

import duckdb
from pyspark.sql import SparkSession

from trembita_spark import contract

MODE = sys.argv[1]  # "strict" | "epoch"
contract.load_all()

# bare driver-style session: no UTC pin, no AQE tuning, default 200
# shuffle partitions, host TZ rules
spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver_env_sim")
    .getOrCreate()
)
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ("lineitem", "events", "documents"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def canon_spark(v):
    if isinstance(v, dt.datetime):
        if MODE == "epoch":
            return v.timestamp()  # local-naive → epoch via process TZ
        return v.replace(tzinfo=None).isoformat()
    return v


def canon_oracle(v):
    if isinstance(v, dt.datetime):
        if MODE == "epoch":
            return v.replace(tzinfo=dt.timezone.utc).timestamp()
        return v.isoformat()
    return v


for key in ("q_flagship_q1", "q_window_tumbling", "q_stream_tumbling",
            "q_window_lag_lead", "q_stream_fsm_sessionize",
            "q_agg_sketch_mergeable",
            # watermark-sentinel key: its sentinel rows are built from a
            # collect()'d (process-local-naive) max_ts and lifted through
            # local_rows — pins that the Arrow path's naive-datetime
            # interpretation matches the classic path's on a non-UTC host
            "q_stream_outer_join"):
    srows = sorted(
        tuple(canon_spark(v) for v in row)
        for row in (tuple(r) for r in contract.QUERIES[key](spark, sf).collect())
    )
    orows = sorted(
        tuple(canon_oracle(v) for v in row)
        for row in con.execute(contract.ORACLES[key]).fetchall()
    )
    assert srows == orows, f"{key}: driver-style session diverged from oracle ({MODE})"
print("DRIVER_ENV_OK")
"""


def _run(mode: str, tz: str) -> None:
    env = dict(os.environ, TZ=tz)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, mode],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0 and "DRIVER_ENV_OK" in proc.stdout, (
        proc.stdout[-2000:] + "\n" + proc.stderr[-2000:]
    )


@pytest.mark.slow
def test_bare_session_utc_host_strict():
    _run("strict", "UTC")


@pytest.mark.slow
def test_bare_session_foreign_tz_semantics_hold():
    _run("epoch", "America/New_York")


def test_readme_query_count_matches_registry():
    # the README's headline count must track the live registry — it went
    # stale twice (153→219→227); this pins it mechanically.
    import os
    import re

    from trembita_spark import contract

    contract.load_all()
    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    ).read()
    m = re.search(r"\*\*(\d+) contract queries", readme)
    assert m, "README headline count sentence missing"
    assert int(m.group(1)) == len(contract.QUERIES), (
        f"README says {m.group(1)} but registry has {len(contract.QUERIES)} — "
        "run tools/update_survey_ledger.py and update README.md"
    )
