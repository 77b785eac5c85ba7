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


# Round 3: subquery surface — EXISTS, IN + HAVING, scalar subquery +
# NOT EXISTS. One SQL text per key, executed verbatim by BOTH engines
# (the common Spark-SQL/DuckDB dialect subset), so the oracle check
# certifies the front door end-to-end.

_Q4_SQL = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register("q_sql_q4", oracle=_Q4_SQL)
def q_sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 analogue (order-priority checking): correlated EXISTS —
    # Catalyst rewrites it to a LEFT SEMI join on l_orderkey with the
    # date filters pushed to both scans.
    _register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_Q4_SQL)


_Q18_SQL = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
"""


@register("q_sql_q18", oracle=_Q18_SQL)
def q_sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 analogue (large-volume customers): IN + grouped HAVING
    # subquery → semi join against a pre-aggregated lineitem; decimal-
    # trick sums keep qty totals bit-exact; DESC order tie-broken by the
    # unique o_orderkey (parity discipline rule 8).
    _register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q18_SQL)


_Q22_SQL = """
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-06-01'
        )
    ) t
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


@register("q_sql_q22", oracle=_Q22_SQL)
def q_sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 analogue (global sales opportunity): uncorrelated scalar
    # subquery (broadcast 1-row) + correlated NOT EXISTS (anti join,
    # kept NON-vacuous: 255 customers lack recent orders, 117 survive
    # the balance filter at sf0.01). Mean computed as decimal-sum /
    # count — identical double division in both engines.
    _register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_Q22_SQL)
