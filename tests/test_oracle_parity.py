"""Differential parity harness: run every registered contract query on
Spark AND its oracle SQL on DuckDB, canonicalize, and require EXACT value
equality — a strictly-stronger local mirror of the driver's
order-insensitive value-hash gate.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import pytest

from tests.conftest import SF_DIR
from trembita_spark import contract

contract.load_all()

KEYS = sorted(contract.QUERIES)
ORACLE_KEYS = [k for k in KEYS if k in contract.ORACLES]
ROWS_ONLY_KEYS = [k for k in KEYS if k not in contract.ORACLES]


def _canon_value(v):
    """Canonical form so hash-equivalent values compare equal."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return f
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, oracle):
    sdf = contract.QUERIES[key](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = oracle.execute(contract.ORACLES[key])
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(ocols), (
        f"{key}: column names differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{key}: row count differs: spark={len(srows)} oracle={len(orows)}"
    )
    _, s_canon = _canon_rows(scols, srows)
    cols, o_canon = _canon_rows(ocols, orows)
    if s_canon != o_canon:
        diffs = [
            (i, s, o)
            for i, (s, o) in enumerate(zip(s_canon, o_canon))
            if s != o
        ][:5]
        msg = f"{key}: values differ (cols={cols}); first diffs:\n"
        for i, s, o in diffs:
            msg += f"  row {i}:\n    spark : {s}\n    oracle: {o}\n"
        pytest.fail(msg)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark):
    sdf = contract.QUERIES[key](spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
