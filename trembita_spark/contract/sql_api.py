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


# (applicationId, view name) → sf_dir currently registered. Re-issuing
# createOrReplaceTempView for an unchanged view is a wasted JVM roundtrip
# per table per query; only re-register when the view should point at a
# DIFFERENT scale factor (e.g. parity at sf0.01 then bench at sf0.1).
_VIEW_STATE: dict = {}


def _register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    app = spark.sparkContext.applicationId
    for name in names:
        if _VIEW_STATE.get((app, name)) != sf_dir:
            table(spark, sf_dir, name).createOrReplaceTempView(name)
            _VIEW_STATE[(app, name)] = sf_dir


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
    # MERGE(lineitem): the date-filtered fact's sf0.1 estimate slipped
    # under the 8 MB broadcast threshold (a raw-fact broadcast no
    # production scale would plan — the shipdate filter keeps a constant
    # fraction, so the side grows with the data). Measured noop
    # 1.39 -> 0.71 s; rows identical; oracle text unhinted.
    _register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT /*+ MERGE(lineitem) */ l_orderkey,
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
    # broadcast; lineitem never shuffles more than once. Register only
    # the six tables this query reads — a corrupt unrelated fixture
    # (e.g. events) must not break it.
    #
    # MERGE(lineitem, orders): the two FACT tables must never be a
    # broadcast build side (at sf0.1 the 4-column lineitem estimate
    # slipped under the 8 MB threshold and the star joins broadcast a
    # 600k-row fact — a serial build no production scale would plan).
    # The hint pins the classic shape — dims broadcast, facts sort-merge
    # on the order key — and is FASTER locally too (noop 2.16 -> 0.99 s:
    # the serial broadcast build was the bottleneck). Join-strategy
    # hints never change results; the oracle text is unhinted.
    _register_views(
        spark,
        sf_dir,
        ["region", "nation", "customer", "supplier", "orders", "lineitem"],
    )
    return spark.sql(
        """
        SELECT /*+ MERGE(lineitem, orders) */ n_name,
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
    # date filters pushed to both scans. SHUFFLE_HASH(lineitem) inside
    # the EXISTS block (hints are block-scoped): the semi-join's build
    # side was the RAW 600k-row fact slipping under the 8 MB broadcast
    # threshold. Measured noop 0.93 -> 0.82 s; oracle text unhinted.
    _register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        _hinted(_Q4_SQL, "SELECT 1 FROM lineitem", "/*+ SHUFFLE_HASH(lineitem) */")
    )


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
    #
    # Spark side adds MERGE(lineitem): the RAW fact must not be a
    # broadcast build side (its pruned sf0.1 estimate slipped under the
    # 8 MB threshold); the semi-join sides stay broadcast — they are
    # AGGREGATES of lineitem (few qualifying orders), the legitimate
    # broadcast at any scale. Faster locally too (noop 1.09 -> 0.86 s —
    # the serial 600k-row broadcast build was the bottleneck). Hints
    # never change results; the oracle text is unhinted.
    _register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        _Q18_SQL.replace("SELECT c_name", "SELECT /*+ MERGE(lineitem) */ c_name", 1)
    )


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
    # MERGE(orders) inside the NOT EXISTS block: the anti-join's build
    # side was the RAW orders fact (date filter keeps a constant
    # fraction) slipping under the 8 MB broadcast threshold — and the
    # serial broadcast build was catastrophic locally too. Measured
    # noop 4.69 -> 0.51 s; oracle text unhinted.
    _register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        _hinted(_Q22_SQL, "SELECT 1 FROM orders", "/*+ MERGE(orders) */")
    )


# Round 3: the REST of the TPC-H suite, adapted to the local schema (no
# partsupp table; lineitem has no commitdate/receiptdate/shipmode; cost
# proxies use p_retailprice). Together with Q3/Q4/Q5/Q18/Q22 above this
# completes all 22 query shapes — every join topology, subquery form
# (scalar, correlated, IN, EXISTS, NOT EXISTS, CTE-with-max), and
# aggregate pattern of the benchmark is exercised through the SQL front
# door and value-hash-checked against DuckDB. One SQL text per key,
# executed verbatim by both engines.


def _hinted(sql: str, marker: str, hint: str) -> str:
    """Spark-side copy of ``sql`` with a join-strategy ``hint`` comment
    injected right after the SELECT that ``marker`` locates (hints are
    scoped to their query block, so the marker picks the block that
    names the hinted relation). The oracle keeps the unhinted text;
    hints choose the physical join, never the result."""
    assert marker in sql, f"hint marker not found: {marker!r}"
    return sql.replace(marker, marker.replace("SELECT", f"SELECT {hint}", 1), 1)


def _sql_key(
    key: str,
    tables: list,
    sql: str,
    doc: str,
    spark_sql: str | None = None,
    hint: tuple | None = None,
):
    """Register one shared-dialect SQL contract key (Spark executes the
    exact text the DuckDB oracle runs).

    ``spark_sql`` lets the Spark side run the SAME query text with
    join-strategy hints added (``/*+ ... */``) while the oracle keeps
    the unhinted text — hints only pick the physical join, never the
    result, and keeping them off the oracle text removes any dialect
    exposure. The two texts must stay semantically identical.
    ``hint=(marker, '/*+ ... */')`` derives spark_sql from ``sql`` via
    :func:`_hinted` so the texts cannot drift apart."""
    if hint is not None:
        assert spark_sql is None
        spark_sql = _hinted(sql, *hint)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_views(spark, sf_dir, tables)
        return spark.sql(spark_sql or sql)

    fn.__name__ = key
    fn.__doc__ = doc
    register(key, oracle=sql)(fn)


_sql_key(
    "q_sql_q1",
    ["lineitem"],
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 (pricing summary) through the SQL front door: scan → "
    "partial+final hash agg; decimal-trick sums (parity rule 4) keep "
    "every money column bit-exact.",
)

_sql_key(
    "q_sql_q2",
    ["part", "supplier", "lineitem", "nation", "region"],
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size <= 10 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT min(s2.s_acctbal)
        FROM supplier s2
        JOIN lineitem l2 ON l2.l_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    GROUP BY s_acctbal, s_name, n_name, p_partkey, p_name
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "TPC-H Q2 analogue (min-cost supplier; supplier-of-part via lineitem "
    "since there is no partsupp): correlated scalar MIN subquery — "
    "Catalyst rewrites it to an aggregated join on l_partkey. GROUP BY "
    "dedupes repeated lineitem matches; double equality on s_acctbal is "
    "exact (same source values both sides).",
)

_sql_key(
    "q_sql_q6",
    ["lineitem"],
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    "TPC-H Q6 (forecast revenue change): pure scan-side predicate — all "
    "four filters push into the parquet scan; single global agg.",
)

_sql_key(
    "q_sql_q7",
    ["supplier", "lineitem", "orders", "customer", "nation"],
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
          OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 (volume shipping): nation self-joined twice under a "
    "disjunctive cross-nation predicate; EXTRACT(YEAR) cast to BIGINT "
    "on both engines (Spark year() is INT32, DuckDB's BIGINT).",
    # orders (raw fact, no filter) was the broadcast build side of the
    # lineitem join at sf0.1 — SHUFFLE_HASH pins the per-partition hash
    # build on the order key instead. Measured noop neutral on a warm
    # box (0.46 base / 0.51 hinted, within trial noise; first-pass
    # medians favored the hint 2.03 -> 0.70); the win is the 100 TB
    # shape. Oracle text unhinted.
    hint=("SELECT n1.n_name", "/*+ SHUFFLE_HASH(orders) */"),
)

_sql_key(
    "q_sql_q8",
    ["part", "lineitem", "supplier", "orders", "customer", "nation", "region"],
    """
    SELECT o_year,
           CAST(sum(CAST(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "TPC-H Q8 (national market share): 7-table star join, conditional "
    "share ratio = decimal-exact numerator / decimal-exact denominator — "
    "identical double division both engines.",
    # orders (raw fact, date filter keeps a constant fraction) was the
    # broadcast build side of the lineitem join at sf0.1 — MERGE pins
    # the sort-merge on the order key; every true dim keeps its
    # broadcast. Measured noop 4.44 -> 0.73 s (the serial 600k-row
    # broadcast build was the bottleneck). Oracle text unhinted.
    hint=(
        "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year",
        "/*+ MERGE(orders) */",
    ),
)

_sql_key(
    "q_sql_q9",
    ["part", "lineitem", "supplier", "orders", "nation"],
    """
    SELECT nation, o_year,
           CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    "TPC-H Q9 analogue (product-type profit; p_retailprice stands in for "
    "ps_supplycost — no partsupp locally): per-row IEEE profit expression "
    "is bit-deterministic (rule 2); only the SUM gets the decimal trick.",
    # SHUFFLE_HASH(orders): orders is a FACT table — at sf0.1 its pruned
    # 2-column estimate slipped under the 8 MB threshold and became a
    # broadcast build side, which no production scale would plan. The
    # hint pins lineitem⨝orders as a shuffled-hash join on the order key
    # (build side = the narrower orders projection, the same surgical
    # hint the salted-join operator uses); part/supplier/nation keep
    # their broadcasts. Measured noop 1.20 -> 0.92 s (MERGE was 1.31 —
    # per-partition hash build beats the sort here). Oracle unhinted.
    spark_sql="""
    SELECT nation, o_year,
           CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT /*+ SHUFFLE_HASH(orders) */ n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)

_sql_key(
    "q_sql_q10",
    ["customer", "orders", "lineitem", "nation"],
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 (returned items): revenue-ranked top-20 with the unique "
    "c_custkey tiebreak (parity rule 8) so LIMIT is deterministic.",
    # lineitem (fact; the returnflag filter keeps ~1/3 of it at ANY
    # scale) was the broadcast build side at sf0.1 — MERGE pins the
    # sort-merge on the order key. Costs ~0.2 s locally (0.39 -> 0.58
    # noop: a 200k-row broadcast genuinely beats a shuffle at this SF)
    # — accepted and disclosed, because a third of the fact as a
    # broadcast build is exactly the plan that cannot exist at 100 TB.
    # Oracle text unhinted.
    hint=("SELECT c_custkey", "/*+ MERGE(lineitem) */"),
)

_sql_key(
    "q_sql_q11",
    ["lineitem", "supplier", "nation"],
    """
    SELECT l_partkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) > (
      SELECT 2.0 * CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             / count(DISTINCT l_partkey)
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    )
    ORDER BY part_value DESC, l_partkey
    """,
    "TPC-H Q11 analogue (important stock; lineitem revenue per part "
    "stands in for partsupp value): HAVING against an uncorrelated "
    "scalar subquery — Catalyst broadcasts the 1-row threshold. The "
    "threshold is 2x the AVERAGE part value, not a fixed fraction of "
    "the total: TPC-H scales Q11's fraction by 1/SF for exactly this "
    "reason — a fixed fraction goes vacuous as the table grows "
    "(caught by the sf0.1 parity sweep: 0 rows at 10x the data).",
)

_sql_key(
    "q_sql_q12",
    ["orders", "lineitem"],
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "TPC-H Q12 analogue (priority-by-shipping-class; l_returnflag stands "
    "in for the absent l_shipmode, ship-after-order for the absent "
    "commit/receipt dates): CASE-sum pivot counts, cast BIGINT both "
    "sides (DuckDB integer sum is HUGEINT — parity trap).",
    # orders (raw fact, unfiltered) was the broadcast build side of the
    # lineitem join at sf0.1 — SHUFFLE_HASH pins the per-partition hash
    # build on the order key. Measured noop 0.84 -> 0.70 s. Oracle
    # text unhinted.
    hint=("SELECT l_returnflag", "/*+ SHUFFLE_HASH(orders) */"),
)

_sql_key(
    "q_sql_q13",
    ["customer", "orders"],
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "TPC-H Q13 (customer order-count distribution): LEFT JOIN with a "
    "filter inside the ON clause (customers with zero qualifying orders "
    "count as c_count=0), then a count-of-counts re-aggregation.",
    # orders (raw fact; the ON-clause priority filter keeps ~4/5 at any
    # scale) was the broadcast build side of the outer join at sf0.1 —
    # MERGE pins the sort-merge on the customer key. Measured noop
    # 7.74 -> 0.36 s (the 1.4M-row broadcast build dominated the whole
    # query). Oracle text unhinted.
    hint=(
        "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count",
        "/*+ MERGE(orders) */",
    ),
)

_sql_key(
    "q_sql_q14",
    ["lineitem", "part"],
    """
    SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    "TPC-H Q14 (promo revenue share): conditional-aggregate ratio; both "
    "operands decimal-exact before one double division.",
)

_sql_key(
    "q_sql_q15",
    ["supplier", "lineitem"],
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15 (top supplier): CTE referenced twice — once as the join "
    "input and once inside the MAX scalar subquery; revenue doubles are "
    "decimal-derived so max-equality is exact.",
)

_sql_key(
    "q_sql_q16",
    ["lineitem", "part", "supplier"],
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "TPC-H Q16 analogue (supplier breadth per part attribute; lineitem "
    "links supplier↔part): NOT IN null-aware anti join (6 negative-"
    "balance suppliers at sf0.01 keep it non-vacuous) + count-distinct.",
)

_sql_key(
    "q_sql_q17",
    ["lineitem", "part"],
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    "TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG "
    "subquery per part — Catalyst rewrites to an aggregate + join; avg "
    "expressed as decimal-sum/count (parity rule 4). Brand-only filter: "
    "adding the p_size cut left ZERO qualifying rows at sf0.001 (NULL "
    "aggregate, caught by the tri-scale sweep).",
)

_sql_key(
    "q_sql_q19",
    ["lineitem", "part"],
    """
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19 analogue (discounted revenue; p_size ranges stand in for "
    "the absent p_container): disjunction of conjunctive join+scan "
    "predicates — Catalyst extracts the common join key and pushes the "
    "per-branch filters below it.",
)

_sql_key(
    "q_sql_q20",
    ["supplier", "nation", "lineitem", "part"],
    """
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_nationkey % 2 = 1
      AND s_suppkey IN (
        SELECT l1.l_suppkey
        FROM lineitem l1
        JOIN part ON p_partkey = l1.l_partkey
        WHERE p_type = 'PROMO'
          AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l1.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l1.l_suppkey, l1.l_partkey
        HAVING CAST(sum(CAST(l1.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 0.3 * (
          SELECT CAST(sum(CAST(l3.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          FROM lineitem l3
          WHERE l3.l_partkey = l1.l_partkey
            AND l3.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l3.l_shipdate <  TIMESTAMP '1997-01-01'
        )
      )
    ORDER BY s_name
    """,
    "TPC-H Q20 analogue (dominant-share suppliers; per-(supplier,part) "
    "shipped quantity vs 0.3× the part's total, via lineitem instead of "
    "partsupp availability): IN subquery whose HAVING contains a "
    "correlated scalar subquery on the grouping key.",
)

_sql_key(
    "q_sql_q21",
    ["supplier", "lineitem", "orders", "nation"],
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    "TPC-H Q21 analogue (suppliers who kept orders waiting; ship >60 days "
    "after order stands in for receipt-after-commit): EXISTS + NOT EXISTS "
    "both correlated to the fact row AND the outer orders row — semi and "
    "anti self-joins on the same key. s_name is unique → the DESC "
    "numwait LIMIT is a total order (parity rule 8).",
    # Three FACT-side broadcasts at sf0.1 (l1 under supplier's join,
    # orders, and the l2/l3 semi/anti sides — raw 600k-row lineitem
    # builds no production scale would plan): MERGE(orders) pins
    # l1⨝orders sort-merge on the order key, SHUFFLE_HASH(l2/l3) pins
    # the semi/anti self-joins as per-partition hash builds on the same
    # key; supplier/nation keep their broadcasts. Measured noop
    # 1.35 -> 0.84 s — the serial broadcast builds were the bottleneck.
    # Oracle unhinted.
    spark_sql="""
    SELECT /*+ MERGE(orders) */ s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT /*+ SHUFFLE_HASH(l2) */ 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT /*+ SHUFFLE_HASH(l3) */ 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)


_sql_key(
    "q_sql_groupby_all",
    ["orders"],
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    """,
    "GROUP BY ALL (Spark 3.4+/DuckDB shared dialect): every non-aggregate "
    "select item becomes a grouping key — the analyst shorthand resolves "
    "in the analyzer, so the physical plan is the ordinary partial+final "
    "hash aggregate with no extra cost.",
)


_sql_key(
    "q_sql_window_named",
    ["orders"],
    """
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rn,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "Named WINDOW clause (shared dialect): one window definition reused "
    "by multiple select items — Catalyst collapses same-spec window "
    "functions into ONE Window physical node (single sort+scan per "
    "partition, not one per function). Running decimal sum is exact and "
    "prefix-order pinned by the unique (o_orderdate, o_orderkey) order.",
)


@register(
    "q_sql_params",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
    GROUP BY o_orderpriority
    """,
)
def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parameterized SQL (Spark 3.4+/4 named-parameter API): the query
    # text carries :status / :floor placeholders and the literals bind
    # at spark.sql() call time — injection-safe templating with zero
    # plan difference (parameters fold to literals before optimization,
    # so predicate pushdown still reaches the scan). The oracle is the
    # same query with the constants inlined.
    _register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 1000.0},
    )


@register(
    "q_sql_session_variable",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_high,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_high
    FROM orders WHERE o_totalprice > 50000.0
    """,
)
def q_sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL session variables (Spark 4 DECLARE/SET VARIABLE): procedural
    # scripting state inside the SQL front door — the threshold lives in
    # a typed session variable referenced by the query, the ANSI way to
    # parameterize multi-statement SQL jobs. Variables resolve to
    # literals in the analyzer, so pushdown is unaffected.
    _register_views(spark, sf_dir, ["orders"])
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 50000.0")
    return spark.sql(
        """
        SELECT CAST(count(*) AS BIGINT) AS n_high,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_high
        FROM orders WHERE o_totalprice > price_floor
        """
    )


_sql_key(
    "q_sql_lateral_alias",
    ["lineitem"],
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net,
           CAST(net * (1 + l_tax) AS DOUBLE) AS gross,
           CAST(gross - net AS DOUBLE) AS tax_paid
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
    "Lateral column aliases (Spark 3.4+/DuckDB shared dialect): later "
    "select items reference earlier ones by alias — the analyzer "
    "inlines the chain, so the plan is a single projection with no "
    "subquery nesting; per-row double arithmetic is engine-identical.",
)
