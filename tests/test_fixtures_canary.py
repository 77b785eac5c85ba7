"""Fixture-drift canary + loader robustness.

Round 3 post-mortem: the driver regenerated ``events.parquet`` with
``ts: timestamp[us]`` where older fixtures had TIMESTAMP(NANOS), and the
loader's hardcoded ns normalization broke 30 keys at analysis time. Two
defenses:

1. A canary that pyarrow-reads every fixture footer and asserts the
   schema matches FIXTURES.md's recorded types, naming the drifted
   column in the failure message.
2. A unit test that fabricates BOTH ts flavors (ns-as-long and µs) in
   tmp files and asserts ``load_table`` normalizes each to the same
   µs TimestampType values.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR
from trembita_spark.io import load_table

# Allowed pyarrow types per column, per table. A set per column: the
# loader explicitly supports multiple physical flavors for events.ts
# (both have shipped from the driver). Everything else is pinned to one
# type — drift there has no handling code and must fail loudly here
# rather than as 30 cryptic AnalysisExceptions.
EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # Both flavors supported by io._normalize_ts — keep in sync.
        "ts": {"timestamp[ns]", "timestamp[us]"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<item: float>", "list<element: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_fixture_schema_canary(name):
    schema = pq.read_schema(f"{SF_DIR}/{name}.parquet")
    expected = EXPECTED[name]
    actual = {f.name: str(f.type) for f in schema}
    missing = set(expected) - set(actual)
    assert not missing, (
        f"FIXTURE DRIFT in {name}.parquet: columns {sorted(missing)} "
        f"disappeared (have: {sorted(actual)}). Update loaders + FIXTURES.md."
    )
    for col, allowed in expected.items():
        assert actual[col] in allowed, (
            f"FIXTURE DRIFT in {name}.parquet: column '{col}' is now "
            f"{actual[col]}, expected one of {sorted(allowed)}. If this is "
            "a new driver fixture flavor, teach the loader "
            "(trembita_spark/io.py) to dispatch on it and add the type "
            "here + in FIXTURES.md."
        )


_TS_US = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 1, 15, 12, 30, 45, 987654),
    dt.datetime(2024, 1, 30, 23, 59, 59, 1),
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["click", "view", "error"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(tbl, path)


def test_load_table_normalizes_both_ts_flavors(spark, tmp_path):
    # µs flavor (current driver fixtures).
    us_dir = tmp_path / "us"
    us_dir.mkdir()
    _write_events(str(us_dir / "events.parquet"), pa.array(_TS_US, pa.timestamp("us")))

    # ns flavor (older driver fixtures): same instants plus sub-µs noise
    # that the loader must floor-truncate away.
    ns_dir = tmp_path / "ns"
    ns_dir.mkdir()
    ns_vals = [
        (int((t - dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
         + t.microsecond) * 1000 + 789
        for t in _TS_US
    ]
    _write_events(
        str(ns_dir / "events.parquet"), pa.array(ns_vals, pa.timestamp("ns"))
    )

    got_us = load_table(spark, str(us_dir), "events")
    got_ns = load_table(spark, str(ns_dir), "events")
    assert str(got_us.schema["ts"].dataType) == "TimestampType()"
    assert str(got_ns.schema["ts"].dataType) == "TimestampType()"

    rows_us = [r["ts"] for r in got_us.select("ts").orderBy("event_id").collect()]
    rows_ns = [r["ts"] for r in got_ns.select("ts").orderBy("event_id").collect()]
    assert rows_us == _TS_US
    assert rows_ns == _TS_US  # sub-µs noise floor-truncated
