"""SQL front door: the engine's tables registered as temp views and
queried with ``spark.sql`` — Catalyst produces the same plans as the
DataFrame builders, so the whole operator surface is reachable from SQL.
Contract queries here are TPC-H-shaped multi-join analytics (adapted to
the local schema), the workload the 100 TB posture is designed around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trembita_spark.contract import register, table
from trembita_spark.io import TABLES


def _register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "q_sql_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) DESC, l_orderkey
    LIMIT 10
    """,
)
def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 analogue (shipping priority): 3-way join, filtered both
    # sides, top-10 by revenue. Catalyst broadcast-joins the filtered
    # customer side; the ORDER BY+LIMIT plans TakeOrderedAndProject.
    _register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) DESC, l_orderkey
        LIMIT 10
        """
    )


@register(
    "q_sql_q5",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = (SELECT min(r_name) FROM region)
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 analogue (local supplier volume): 6-table star join with a
    # same-nation constraint and a scalar subquery. nation/region
    # broadcast; lineitem never shuffles more than once.
    _register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = (SELECT min(r_name) FROM region)
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        """
    )
