"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in :mod:`trembita_spark.contract` — one
registered (PySpark, DuckDB-SQL) pair per operator from SURVEY.md §3;
this module just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trembita_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (trembita-QL pricing summary, TPC-H Q1 analogue)
    on /root/testdata/sf0.001; driver checks rows>0."""
    contract.load_all()
    return contract.QUERIES["q_flagship_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    contract.load_all()
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key (keys absent here are rows-only)."""
    contract.load_all()
    return dict(contract.ORACLES)
