"""Aggregation contract queries — the trembita-QL core
(reference: kernel/src/main/scala/trembita/ql/{QueryBuilder,AggFunc,
QueryResult}.scala — unverified; SURVEY.md §3.4).

All aggregates are commutative-monoid-shaped → Spark partial+final
HashAggregate with map-side combine; the QL's nested grouping tree with
per-level totals maps to rollup/cube + grouping_id (Catalyst Expand —
one shuffle, not n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trembita_spark.contract import dsum, dsum_sql, register, table
from trembita_spark.io import spread_scan
from trembita_spark.query import Query, agg


@register(
    "q_agg_basic",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)            AS total,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           count(*)                                                            AS cnt
    FROM orders
    WHERE o_totalprice > 1000
    GROUP BY o_orderpriority
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QL shape: where → groupBy(expr as name) → aggregate(sum/avg/count).
    return (
        Query(table(spark, sf_dir, "orders"))
        .where(F.col("o_totalprice") > 1000)
        .group_by(o_orderpriority="o_orderpriority")
        .aggregate(
            total=dsum("o_totalprice", 2),
            avg_price=dsum("o_totalprice", 2) / F.count(F.lit(1)),
            cnt=F.count(F.lit(1)),
        )
        .to_df()
    )


@register(
    "q_agg_minmax",
    oracle="""
    SELECT l_returnflag,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           min(l_shipdate)                AS first_ship,
           max(l_shipdate)                AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .group_by(l_returnflag="l_returnflag")
        .aggregate(
            min_price=F.min("l_extendedprice"),
            max_price=F.max("l_extendedprice"),
            first_ship=F.min("l_shipdate"),
            last_ship=F.max("l_shipdate"),
        )
        .to_df()
    )


@register(
    "q_agg_product",
    oracle="""
    SELECT l_orderkey, product(l_quantity) AS qty_product
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q_agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `.product` AggFunc (reference: ql/AggFunc.scala instances, unverified).
    # Quantities are small integral doubles → products stay exact in f64.
    # Spread on the group key: the inserted exchange satisfies the
    # aggregation's distribution, so the 150k-group product runs as one
    # 32-way stage instead of a single-task partial agg (guide §2.5).
    return (
        Query(spread_scan(table(spark, sf_dir, "lineitem"), "l_orderkey"))
        .group_by(l_orderkey="l_orderkey")
        .aggregate(qty_product=F.product("l_quantity"))
        .to_df()
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS names,
           count(*) AS cnt
    FROM nation GROUP BY n_regionkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `.arr` AggFunc — collect group values; sorted for determinism and
    # serialized (arr_str) so the result is driver-canon-safe (array
    # cells crash lexsort/hash harnesses). agg.arr is the in-engine form.
    return (
        Query(table(spark, sf_dir, "nation"))
        .group_by(n_regionkey="n_regionkey")
        .aggregate_cols(agg.arr_str("n_name", "names"), agg.count("cnt"))
        .to_df()
    )


@register(
    "q_agg_stringagg",
    oracle="""
    SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    WHERE c_custkey < 40
    GROUP BY c_mktsegment
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # String-monoid sum (concat) — deterministic via sorted order.
    return (
        Query(table(spark, sf_dir, "customer"))
        .where(F.col("c_custkey") < 40)
        .group_by(c_mktsegment="c_mktsegment")
        .aggregate_cols(agg.string_agg("c_name", "names"))
        .to_df()
    )


@register(
    "q_agg_stddev",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6)    AS var_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .group_by(l_returnflag="l_returnflag")
        .aggregate(
            sd_qty=F.round(F.stddev_samp("l_quantity"), 6),
            var_qty=F.round(F.var_samp("l_quantity"), 6),
        )
        .to_df()
    )


@register(
    "q_agg_rms",
    oracle="""
    SELECT l_linestatus, sqrt(avg(l_quantity * l_quantity)) AS rms_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_agg_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `.rms` AggFunc as an expression composition — keeps codegen +
    # partial agg (no custom UDAF).
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .group_by(l_linestatus="l_linestatus")
        .aggregate_cols(agg.rms("l_quantity", "rms_qty"))
        .to_df()
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT l_partkey, sum(l_quantity) AS total_qty, count(*) AS cnt
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) > 5 AND sum(l_quantity) > 50
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    # having = post-agg filter on DECLARED aggregate names (the builder
    # validates eagerly; Catalyst folds the filter into the agg).
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .group_by(l_partkey="l_partkey")
        .aggregate(
            total_qty=F.sum("l_quantity"),
            cnt=F.count(F.lit(1)),
        )
        .having((F.col("cnt") > 5) & (F.col("total_qty") > 50))
        .to_df()
    )


@register(
    "q_agg_ordered",
    oracle="""
    SELECT c_mktsegment,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           count(*) AS cnt,
           row_number() OVER (
             ORDER BY sum(CAST(c_acctbal AS DECIMAL(18,2))) DESC, c_mktsegment) AS pos
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QL `ordered` — materialize the rank so the order is hash-visible.
    from pyspark.sql.window import Window

    out = (
        Query(table(spark, sf_dir, "customer"))
        .group_by(c_mktsegment="c_mktsegment")
        .aggregate(
            total_bal_dec=F.sum(F.col("c_acctbal").cast("decimal(18,2)")),
            cnt=F.count(F.lit(1)),
        )
        .to_df()
    )
    w = Window.orderBy(F.col("total_bal_dec").desc(), F.col("c_mktsegment"))
    return out.select(
        "c_mktsegment",
        F.col("total_bal_dec").cast("double").alias("total_bal"),
        "cnt",
        F.row_number().over(w).alias("pos"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .group_by(l_returnflag="l_returnflag")
        .aggregate(
            n_parts=F.countDistinct("l_partkey"),
            n_supps=F.countDistinct("l_suppkey"),
        )
        .to_df()
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           true                      AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB default for distinct counts: HLL++ sketch, one pass, no
    # per-key state explosion. Sketch values are engine-specific, so the
    # oracle checks the PROPERTY approximation promises instead of the
    # value: |approx - exact| / exact <= 3*rsd (emitted as a boolean the
    # DuckDB oracle asserts true). Exactness itself is q_agg_distinct.
    rsd = 0.02
    approx = F.approx_count_distinct("l_partkey", rsd=rsd)
    exact = F.countDistinct("l_partkey")
    # spread the under-split scan (same rationale as
    # q_agg_approx_percentile; HLL merge is commutative, so the sketch
    # value is partitioning-independent too)
    return (
        spread_scan(
            table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey"),
            "l_partkey",
        )
        .groupBy("l_returnflag")
        .agg(approx.alias("approx"), exact.alias("exact_parts"))
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 3 * rsd
            ).alias("within_tol"),
        )
    )


# --------------------------------------------------------------------------
# Nested grouping tree with per-level totals (QueryResult) → rollup/cube +
# grouping_id. One Expand + one shuffle, not one pass per level.
# --------------------------------------------------------------------------


@register(
    "q_agg_rollup",
    oracle="""
    SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
           l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           count(*)        AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Measured: spreading the scan here REGRESSES (0.28s -> 0.39s noop):
    # grouping-sets distribution is never satisfied by a pre-spread, so
    # the spread becomes a second full shuffle while Expand+partial-agg
    # are too cheap to win it back. Left on the single-exchange plan.
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .rollup(l_returnflag="l_returnflag", l_linestatus="l_linestatus")
        .with_grouping_id("gid")
        .aggregate(
            sum_qty=F.sum("l_quantity"),
            cnt=F.count(F.lit(1)),
        )
        .to_df()
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
           l_returnflag, l_linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           count(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .cube(l_returnflag="l_returnflag", l_linestatus="l_linestatus")
        .with_grouping_id("gid")
        .aggregate(
            sum_price=dsum("l_extendedprice", 2),
            cnt=F.count(F.lit(1)),
        )
        .to_df()
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)  AS median_price,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS p25_price,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS p75_price,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.9)       AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles (Spark `percentile` ↔ DuckDB
    # `quantile_cont`, same index = p·(n-1) linear-interpolation
    # definition). Quartiles are emitted as SCALAR columns, not a
    # 3-element array: array cells crash driver-style lexsort/hash canon,
    # and stringifying doubles is engine-divergent. Exact percentile
    # requires per-group sorted values — at 100 TB prefer
    # q_agg_approx_percentile (sketch) below.
    q = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .group_by(l_returnflag="l_returnflag")
        .aggregate(
            median_price=q.getItem(1),
            p25_price=q.getItem(0),
            p75_price=q.getItem(2),
            p90_qty=F.percentile("l_quantity", F.lit(0.9)),
        )
        .to_df()
    )


@register(
    "q_agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)  AS p50_exact,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS p95_exact,
           true AS p50_ok,
           true AS p95_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KLL/GK-style sketch percentile — one pass, bounded memory, the
    # 100 TB default (exact percentile must materialize sorted groups).
    # Sketch outputs are engine-specific, so the oracle checks the
    # accuracy PROPERTY: approx within 2% relative of the exact
    # interpolated percentile (accuracy=10000 → rank error ≤ n/10000,
    # far tighter than 2% in value on this distribution).
    exact = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))
    approx50 = F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    approx95 = F.percentile_approx("l_extendedprice", F.lit(0.95), F.lit(10000))
    tol = 0.02
    # spread the under-split scan: the sketch+exact partial aggs are the
    # stage's whole cost and otherwise run in the one scan task
    # (io.spread_scan; no-op at production split counts). The emitted
    # columns are the exact percentiles and the accuracy booleans, both
    # partitioning-independent.
    return (
        spread_scan(
            table(spark, sf_dir, "lineitem").select(
                "l_returnflag", "l_extendedprice"
            ),
            "l_extendedprice",
        )
        .groupBy("l_returnflag")
        .agg(
            exact.getItem(0).alias("p50_exact"),
            exact.getItem(1).alias("p95_exact"),
            approx50.alias("a50"),
            approx95.alias("a95"),
        )
        .select(
            "l_returnflag",
            "p50_exact",
            "p95_exact",
            (F.abs(F.col("a50") - F.col("p50_exact")) / F.col("p50_exact") <= tol).alias("p50_ok"),
            (F.abs(F.col("a95") - F.col("p95_exact")) / F.col("p95_exact") <= tol).alias("p95_ok"),
        )
    )


@register(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bivariate moments: engines use different merge formulas → rounded
    # (discipline rule 5; covar magnitude ~1e4 → 2dp, corr ∈ [-1,1] → 6dp).
    return (
        Query(table(spark, sf_dir, "lineitem"))
        .group_by(l_returnflag="l_returnflag")
        .aggregate(
            qty_price_corr=F.round(F.corr("l_quantity", "l_extendedprice"), 6),
            qty_price_covar=F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2),
        )
        .to_df()
    )


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_F,
           sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_O,
           count(*)        FILTER (WHERE l_linestatus = 'F') AS n_F,
           count(*)        FILTER (WHERE l_linestatus = 'O') AS n_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot with EXPLICIT values — at scale never let Spark run the
    # extra distinct-values job (and plans stay deterministic).
    out = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).alias("n"))
    )
    return out.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        F.col("F_n").alias("n_F"),
        F.col("O_n").alias("n_O"),
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS DOUBLE) AS value FROM orders
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unpivot/melt: wide measures → (key, measure, value) rows.
    o = table(spark, sf_dir, "orders").withColumn(
        "custkey_d", F.col("o_custkey").cast("double")
    )
    return (
        o.unpivot(
            "o_orderkey",
            [F.col("o_totalprice").alias("totalprice"), F.col("custkey_d").alias("custkey")],
            "measure",
            "value",
        )
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
           l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit GROUPING SETS (the general form under rollup/cube): three
    # exact aggregation levels in ONE Expand+shuffle pass.
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
               l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_agg_argminmax",
    oracle="""
    SELECT o_orderpriority,
           max_by(o_totalprice, o_orderkey) AS price_of_latest,
           min_by(o_totalprice, o_orderkey) AS price_of_first
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    # argmin/argmax aggregates, ordered BY the unique o_orderkey only:
    # ordering by a non-unique value (e.g. max_by(key, totalprice)) is
    # tie-broken arbitrarily per engine — the fixture HAS totalprice
    # collisions within groups (61 at sf0.1), so such a column would be
    # a latent hash mismatch. Unique ordering keys only (rule 6).
    return (
        Query(table(spark, sf_dir, "orders"))
        .group_by(o_orderpriority="o_orderpriority")
        .aggregate(
            price_of_latest=F.max_by("o_totalprice", "o_orderkey"),
            price_of_first=F.min_by("o_totalprice", "o_orderkey"),
        )
        .to_df()
    )


@register(
    "q_agg_mode",
    oracle="""
    SELECT l_returnflag,
           arg_max(qty, c * 1000 - qty) AS mode_qty,
           max(c)                       AS mode_count
    FROM (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, count(*) AS c
      FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ) t
    GROUP BY l_returnflag
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Most-frequent-value aggregate with a DETERMINISTIC tiebreak
    # (highest count, then SMALLEST value — native mode() ties
    # arbitrarily per engine, a latent hash mismatch; rule 6): two-level
    # agg, both levels partial-friendly. The tiebreak is encoded in one
    # integer ordering key, c*1000 - qty (valid: qty ∈ [1,50] ≪ 1000),
    # because DuckDB 1.0's arg_max takes scalar keys only.
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    ).agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("l_returnflag").agg(
        F.max_by("qty", F.col("c") * 1000 - F.col("qty")).alias("mode_qty"),
        F.max("c").alias("mode_count"),
    )


@register(
    "q_agg_any",
    oracle="""
    SELECT o_orderpriority, any_value(prio_code) AS code
    FROM (SELECT o_orderpriority, CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_code
          FROM orders) t
    GROUP BY o_orderpriority
    """,
)
def q_agg_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference QL's `.random` (arbitrary group element). any_value
    # is nondeterministic in general — made checkable here by choosing a
    # value FUNCTIONALLY DEPENDENT on the group key, so every candidate
    # is identical and the arbitrary pick is forced.
    od = table(spark, sf_dir, "orders")
    return (
        od.select(
            "o_orderpriority",
            F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_code"),
        )
        .groupBy("o_orderpriority")
        .agg(F.any_value("prio_code").alias("code"))
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 5)   AS all_over5,
           bool_or(l_discount > 0.08) AS any_deep_discount,
           CAST(sum(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Boolean aggregates (every/some): predicate rollups — partial-agg
    # friendly (AND/OR are monoids, the AggFunc shape the reference's QL
    # is built on).
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_quantity") > 5).alias("all_over5"),
        F.some(F.col("l_discount") > 0.08).alias("any_deep_discount"),
        F.sum(F.when(F.col("l_tax") > 0.05, 1).otherwise(0)).alias("n_taxed"),
    )


@register(
    "q_agg_distinct_salted",
    oracle="""
    SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Skew-safe COUNT DISTINCT: the two-phase expansion — dedupe on
    # (key, value) first (the value itself spreads the hot key over all
    # partitions), then count per key. Result is identical to the plain
    # distinct count (the oracle IS the plain form); the difference is
    # the shuffle shape: phase 1 partitions by (key, value) so one hot
    # group key cannot pin a single task — the direct count(DISTINCT x)
    # plan funnels every distinct value of a hot key through one
    # partition. Mirrors q_join_salted for the aggregation side.
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    return pairs.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_parts")
    )


@register(
    "q_agg_bitops",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_or(CAST(l_linenumber AS BIGINT))  AS BIGINT) AS lines_or,
           CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS lines_and,
           CAST(bit_xor(CAST(l_suppkey AS BIGINT))    AS BIGINT) AS supp_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bitwise aggregates — commutative/associative (bitmap-index and
    # feature-flag rollup building blocks), partial-agg friendly.
    li = table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_or(ln).alias("lines_or"),
        F.bit_and(ln).alias("lines_and"),
        F.bit_xor(F.col("l_suppkey").cast("bigint")).alias("supp_xor"),
    )


@register(
    "q_pivot_multi",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS f_qty,
           CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT)                               AS f_cnt,
           CAST(sum(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS o_qty,
           CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT)                               AS o_cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot with MULTIPLE aggregates per pivoted value (sum + count per
    # linestatus): one Expand-free conditional-agg pass — Catalyst plans
    # pivot exactly as the oracle's CASE-aggregation, so both engines
    # run the same shape.
    li = table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("F_qty").alias("f_qty"),
        F.col("F_cnt").alias("f_cnt"),
        F.col("O_qty").alias("o_qty"),
        F.col("O_cnt").alias("o_cnt"),
    )


@register(
    "q_agg_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
           round(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n), 9) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS r2,
           CAST(n AS BIGINT) AS n_rows
    FROM s
    """,
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Linear-regression aggregates (regr_slope / regr_intercept / regr_r2
    # analogues) of price on quantity per return flag. Spark's builtin
    # regr_* stream central moments in merge order (float-nondeterministic
    # across engines), so the moments are computed as EXACT decimal power
    # sums — one partial-aggregating pass, order-independent — and the
    # closed-form slope/intercept/r2 arithmetic runs on near-identical
    # doubles in both engines. NEAR: the power sums overflow 2^53 as
    # decimals (syy ~ 2e17 scaled), so the decimal→double CAST itself can
    # differ by one ulp between engines (seen at sf0.001) — hence round-9
    # on the final closed forms, whose magnitudes (≤1e5) make the ulp
    # error ≤1e-11, far inside the 5e-10 half-grid (parity rule 5).
    # Same single-shuffle cost as the builtin regr_*; exactness is free.
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        F.round(slope, 9).alias("slope"),
        F.round(sy / n - slope * (sx / n), 9).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            9,
        ).alias("r2"),
        n.cast("long").alias("n_rows"),
    )


@register(
    "q_agg_skewkurt",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n, s1, s2, s3, s4,
             s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS v
      FROM s
    )
    SELECT l_returnflag,
           mu AS mean_qty,
           v AS var_pop,
           (s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu) / (v * sqrt(v)) AS skew,
           (s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu)
             / (v * v) - 3 AS kurt_excess
    FROM m
    """,
)
def q_agg_skewkurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Population skewness / excess kurtosis from EXACT integer power sums
    # (l_quantity is integral; q^4 sums stay far inside BIGINT at any SF).
    # Spark's builtin skewness/kurtosis merge central moments in partial-
    # agg order (float-drift across engines); raw power sums are a
    # commutative integer monoid — order-independent, map-side combining,
    # and the closed-form standardized-moment arithmetic on identical
    # doubles is bit-exact in both engines. sigma^3 is spelled v*sqrt(v)
    # (mul+sqrt are correctly rounded; pow(v,1.5) is libm, 1-ulp risk).
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    n = F.col("n")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    m = s.select(
        "l_returnflag", "n", "s1", "s2", "s3", "s4",
        (s1 / n).alias("mu"),
        (s2 / n - (s1 / n) * (s1 / n)).alias("v"),
    )
    mu, v = F.col("mu"), F.col("v")
    return m.select(
        "l_returnflag",
        mu.alias("mean_qty"),
        v.alias("var_pop"),
        ((s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu) / (v * F.sqrt(v))).alias("skew"),
        (
            (s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu)
            / (v * v) - 3
        ).alias("kurt_excess"),
    )


@register(
    "q_agg_entropy",
    oracle="""
    WITH c AS (
      SELECT event_type, extract(hour FROM ts) AS h, CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, sum(cnt) AS total FROM c GROUP BY 1)
    SELECT event_type,
           round(sum(-(cnt / total) * log2(cnt / total)), 12) AS entropy_bits,
           CAST(count(*) AS BIGINT) AS n_cats
    FROM c JOIN t USING (event_type)
    GROUP BY event_type
    """,
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shannon entropy (bits) of each event type's hour-of-day histogram —
    # the distribution-uniformity signal (burst detection, load shaping).
    # Two hash aggregates: exact integer counts per (type, hour), then the
    # -p*log2(p) fold per type. The category-term sum is a float fold in
    # merge order and log2 is libm (1-ulp engine skew) -> round-12, like
    # pagerank (error ~1e-15 vs 5e-13 half-grid; parity rule 5).
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    t = c.groupBy("event_type").agg(F.sum("cnt").alias("total"))
    p = F.col("cnt") / F.col("total")
    return (
        c.join(F.broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum(-p * F.log2(p)), 12).alias("entropy_bits"),
            F.count(F.lit(1)).alias("n_cats"),
        )
    )


@register(
    "q_agg_sketch_mergeable",
    oracle="""
    SELECT lang,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_distinct,
           true AS within_tol
    FROM documents GROUP BY lang
    """,
)
def q_agg_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mergeable HLL sketch columns (operators/sketches.py) exercised as
    # the REAL incremental pattern: per-(lang, source) sketches written
    # to parquet, read back, unioned up to lang, and the estimate
    # checked in-query against the exact distinct (within_tol must come
    # out true on both engines — the q_agg_approx_distinct precedent for
    # engine-private approximations). lg_k=12 → ±~1.6% rel. error at 3σ;
    # tolerance 5%. At 100 TB the persisted sketch table replaces every
    # raw rescan for distinct-count rollups.
    from trembita_spark.contract import run_tmp
    from trembita_spark.operators.sketches import hll_sketch_by, hll_union_estimate

    docs = table(spark, sf_dir, "documents")
    tmp = run_tmp("sketches")
    hll_sketch_by(docs, ["lang", "source"], "doc_id").write.mode("overwrite").parquet(tmp)
    persisted = spark.read.parquet(tmp)
    merged = hll_union_estimate(persisted, ["lang"])
    exact = docs.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("exact_distinct")
    )
    return exact.join(merged, "lang").select(
        "lang",
        "exact_distinct",
        (
            F.abs(F.col("distinct_est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_tol"),
    )


# Count-min sketch oracle: identical md5-fold hashing, the same
# pre-agg → fan-out → cell-sum → broadcast-probe min, all BIGINT.
from trembita_spark.contract import HEX60_SQL as _H60

_CMS_H = _H60.format(md5="md5(k || '#' || CAST(dd.d AS VARCHAR))")
_CMS_HP = _H60.format(md5="md5(p.k || '#' || CAST(dd.d AS VARCHAR))")
_CMS_ORACLE = f"""
WITH ks AS (
  SELECT user_id, CAST(user_id AS VARCHAR) AS k, count(*) AS c
  FROM events GROUP BY 1, 2
),
dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
cells AS (
  SELECT dd.d AS d, CAST({_CMS_H} % 256 AS INT) AS cell,
         CAST(sum(c) AS BIGINT) AS cnt
  FROM ks CROSS JOIN dd GROUP BY 1, 2
),
probes AS (
  SELECT user_id, k, c FROM ks ORDER BY md5(k), user_id LIMIT 20
),
pc AS (
  SELECT p.user_id, p.c, dd.d AS d, CAST({_CMS_HP} % 256 AS INT) AS cell
  FROM probes p CROSS JOIN dd
)
SELECT pc.user_id,
       min(cl.cnt)              AS est_count,
       CAST(min(pc.c) AS BIGINT) AS exact_count
FROM pc JOIN cells cl ON cl.d = pc.d AND cl.cell = pc.cell
GROUP BY pc.user_id
"""


@register("q_agg_countmin", oracle=_CMS_ORACLE)
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-min sketch frequency estimation (operators/sketches.py):
    # the 4×256-counter sketch is built from ONE map-side-combined
    # groupBy of events.user_id, then 20 md5-chosen probe keys read
    # min-over-depth estimates from the broadcast sketch next to their
    # exact counts (est ≥ exact, bounded overcount — both engines
    # compute identical integers, so the check is bit-exact, not
    # within-tolerance). At 100 TB the sketch is 1024 rows whatever the
    # corpus; persist it per shard/day and heavy-hitter queries never
    # rescan raw events.
    from trembita_spark.operators.sketches import cms_point_query, cms_table

    ev = table(spark, sf_dir, "events").select("user_id")
    cms = cms_table(ev, "user_id", depth=4, width=256)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    probes = exact.orderBy(
        F.md5(F.col("user_id").cast("string")), "user_id"
    ).limit(20)
    est = cms_point_query(
        cms, probes.select("user_id"), "user_id", depth=4, width=256
    )
    return probes.join(est, "user_id").select(
        "user_id", "est_count", "exact_count"
    )


@register(
    "q_agg_qualify",
    oracle="""
    SELECT o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    QUALIFY row_number() OVER (ORDER BY spend DESC, o_custkey) <= 10
    """,
)
def q_agg_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QUALIFY through the QL builder (query.py: Query.qualify_rank):
    # filter the AGGREGATED rows on a window rank — top-10 spenders, the
    # Snowflake/DuckDB QUALIFY clause Spark SQL lacks. This is the
    # GLOBAL row_number <= k shape, so qualify_rank compiles it to
    # orderBy().limit() → TakeOrderedAndProject (per-partition top-k +
    # k-row merge) instead of a single-partition global window
    # (plan-asserted in tests/test_plans.py). Ranking is anchored to the
    # unique (spend desc, custkey) total order; spend is the
    # decimal-exact sum.
    return (
        Query(table(spark, sf_dir, "orders"))
        .group_by(o_custkey="o_custkey")
        .aggregate(
            spend=dsum("o_totalprice", 2),
            n_orders=F.count(F.lit(1)),
        )
        .qualify_rank([F.col("spend").desc(), F.col("o_custkey")], 10)
        .to_df()
    )


@register(
    "q_agg_weighted",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted mean — Σ(w·x)/Σw per group. The per-row product is one
    # correctly-rounded double op (identical both engines) that lands
    # back on a 2-decimal grid (price 2dp × integral qty), so BOTH sums
    # take the decimal trick and the final division is bit-exact — no
    # rounding. Same partial+final hash-agg shape as any sum.
    li = table(spark, sf_dir, "lineitem")
    wsum = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,2)")
    ).cast("double")
    tw = F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    return li.groupBy("l_returnflag").agg(
        (wsum / tw).alias("wavg_price"),
        tw.alias("total_weight"),
    )


@register(
    "q_agg_mad",
    oracle="""
    WITH med AS (
      SELECT user_id, median(value) AS med
      FROM events GROUP BY user_id
    )
    SELECT e.user_id,
           any_value(m.med) AS med,
           median(abs(e.value - m.med)) AS mad
    FROM events e JOIN med m USING (user_id)
    GROUP BY e.user_id
    """,
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Median absolute deviation per user — the robust dispersion
    # statistic (outlier-insensitive stddev). Two-stage: exact median
    # per group, join back (broadcast — the medians table is
    # groups-sized), then the median of absolute deviations. Spark has
    # no mad(); both stages use exact percentile(0.5), which matches
    # DuckDB's interpolating median bit-for-bit on the same inputs (the
    # deviations are per-row correctly-rounded doubles).
    ev = table(spark, sf_dir, "events").select("user_id", "value")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        ev.join(F.broadcast(med), "user_id")
        .groupBy("user_id")
        .agg(
            F.any_value("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )


@register(
    "q_stat_ttest",
    oracle="""
    WITH m AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s_a,
        CAST(sum(CASE WHEN event_type = 'view'  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s_b,
        CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value * value AS DECIMAL(18,4)) END) AS DOUBLE) AS ss_a,
        CAST(sum(CASE WHEN event_type = 'view'  THEN CAST(value * value AS DECIMAL(18,4)) END) AS DOUBLE) AS ss_b
      FROM events
    ),
    v AS (
      SELECT n_a, n_b, s_a / n_a AS mean_a, s_b / n_b AS mean_b,
             (ss_a - s_a * s_a / n_a) / (n_a - 1) AS var_a,
             (ss_b - s_b * s_b / n_b) / (n_b - 1) AS var_b
      FROM m
    )
    SELECT n_a, n_b, mean_a, mean_b,
           (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS t_stat,
           pow(var_a / n_a + var_b / n_b, 2) /
             (pow(var_a / n_a, 2) / (n_a - 1) + pow(var_b / n_b, 2) / (n_b - 1))
             AS df_welch
    FROM v
    """,
)
def q_stat_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Welch's unequal-variance t-test (click vs view event values) as
    # ONE partial-agg pass: conditional decimal sums (n, sum, sum-of-
    # squares per arm) are exact and merge-order-independent, then the
    # t statistic and Welch-Satterthwaite df are closed-form scalar
    # doubles over those exact sums — identical expression shape on
    # both engines, bit-exact without rounding. At 100 TB this is a
    # single map-side-combined scan: no shuffle carries more than one
    # partial-moment row per partition.
    ev = table(spark, sf_dir, "events")
    is_a = F.col("event_type") == "click"
    is_b = F.col("event_type") == "view"
    vdec = F.col("value").cast("decimal(18,2)")
    v2dec = (F.col("value") * F.col("value")).cast("decimal(18,4)")
    m = ev.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_a, vdec)).cast("double").alias("s_a"),
        F.sum(F.when(is_b, vdec)).cast("double").alias("s_b"),
        F.sum(F.when(is_a, v2dec)).cast("double").alias("ss_a"),
        F.sum(F.when(is_b, v2dec)).cast("double").alias("ss_b"),
    )
    v = m.select(
        "n_a",
        "n_b",
        (F.col("s_a") / F.col("n_a")).alias("mean_a"),
        (F.col("s_b") / F.col("n_b")).alias("mean_b"),
        ((F.col("ss_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (F.col("n_a") - 1)).alias("var_a"),
        ((F.col("ss_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (F.col("n_b") - 1)).alias("var_b"),
    )
    se2_a = F.col("var_a") / F.col("n_a")
    se2_b = F.col("var_b") / F.col("n_b")
    return v.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        ((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2_a + se2_b)).alias("t_stat"),
        (
            F.pow(se2_a + se2_b, 2)
            / (F.pow(se2_a, 2) / (F.col("n_a") - 1) + F.pow(se2_b, 2) / (F.col("n_b") - 1))
        ).alias("df_welch"),
    )


@register(
    "q_stat_mannwhitney",
    oracle="""
    WITH x AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(sum(is_a) AS BIGINT) AS na,
             CAST(sum(1 - is_a) AS BIGINT) AS nb
      FROM x GROUP BY v
    ),
    c AS (
      SELECT na, nb, na + nb AS n,
             CAST(sum(na + nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn
      FROM pv
    ),
    s AS (
      SELECT CAST(sum(na) AS BIGINT) AS n_a,
             CAST(sum(nb) AS BIGINT) AS n_b,
             CAST(sum(na * (2 * (cumn - n) + n + 1)) AS BIGINT) AS r2a,
             CAST(sum(CASE WHEN n > 1 THEN n * n * n - n ELSE 0 END) AS BIGINT) AS ties
      FROM c
    )
    SELECT n_a, n_b,
           CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2 AS u_stat,
           (CAST(r2a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) / 2)
             / sqrt(
                 CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)
                      * (CAST(n_a + n_b + 1 AS HUGEINT) * CAST(n_a + n_b AS HUGEINT)
                         * CAST(n_a + n_b - 1 AS HUGEINT)
                         - CAST(ties AS HUGEINT)) AS DOUBLE)
                 / CAST(12 * (n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)
               ) AS z_stat
    FROM s
    """,
)
def q_stat_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mann-Whitney U (Wilcoxon rank-sum, purchase vs click values) with
    # the normal approximation and tie correction. Ranks come from the
    # VALUE-level aggregate, not a row-level sort: group by distinct
    # value (na/nb per value), run the distributed prefix sum over the
    # value order, and the tied-average rank of a value is
    # (cum_before + (n+1)/2) — so doubling gives the exact INTEGER
    # 2·rank, and every moment (rank sum, tie term Σ(t³-t)) stays in
    # exact integer/decimal arithmetic until one final double division
    # chain that both engines evaluate with the identical expression
    # tree (no rounding needed, the t-test discipline). At 100 TB:
    # one value-level hash agg + the range-partitioned prefix sum +
    # a scalar rollup — no row-level global sort, no low-card window.
    from trembita_spark.operators.stats import mann_whitney_u

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    return mann_whitney_u(ev, "value", F.col("event_type") == "purchase")


@register(
    "q_stat_ks",
    oracle="""
    WITH x AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(sum(is_a) AS BIGINT) AS na,
             CAST(sum(1 - is_a) AS BIGINT) AS nb
      FROM x GROUP BY v
    ),
    c AS (
      SELECT CAST(sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
             CAST(sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
      FROM pv
    ),
    t AS (
      SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b
      FROM pv
    )
    SELECT n_a, n_b,
           CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_stat,
           CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             * sqrt(CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             AS ks_scaled
    FROM c CROSS JOIN t GROUP BY n_a, n_b
    """,
)
def q_stat_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-sample Kolmogorov-Smirnov (purchase vs click values):
    # D = max_v |F_a(v) - F_b(v)| over the pooled value support. The
    # two ECDFs come from ONE multi-column distributed prefix sum over
    # the distinct-value frame (running na and nb share the range
    # shuffle), and the max runs on the EXACT integer cross-difference
    # |ca*n_b - cb*n_a| — only the final normalization (and the
    # sqrt(n_a*n_b/N) effect scaling) divides in double, with the
    # identical expression tree both engines. Same 100 TB shape as
    # mannwhitney: value-level hash agg + range-partitioned prefix sum
    # + scalar rollup; no row-level global sort.
    from trembita_spark.operators.stats import ks_2samp

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    return ks_2samp(ev, "value", F.col("event_type") == "purchase")


@register(
    "q_stat_psi",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
      GROUP BY 1
    ),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM b)
    SELECT n_a, n_b,
           CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins,
           round(sum(CASE WHEN ca > 0 AND cb > 0 THEN
               (CAST(ca AS DOUBLE) / n_a - CAST(cb AS DOUBLE) / n_b)
               * ln((CAST(ca AS DOUBLE) / n_a) / (CAST(cb AS DOUBLE) / n_b))
             END), 12) AS psi
    FROM b CROSS JOIN t GROUP BY n_a, n_b
    """,
)
def q_stat_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Population stability index (purchase vs click value distributions)
    # — THE standard production drift metric a training-data pipeline
    # monitors between corpus snapshots: PSI = Σ_bins (p-q)·ln(p/q)
    # over fixed-width value bins, restricted to bins populated in BOTH
    # arms (the conventional zero-handling, stated rather than epsilon-
    # fudged). One hash agg to (bin, ca, cb) + a broadcast scalar total
    # + one fold — a single data-touching pass at any scale. Counts and
    # the both-arms filter are exact integers; the p/q divisions are
    # identical double trees, and ln is libm (1-ulp engine skew) →
    # round-12, the q_agg_entropy discipline (parity rule 5).
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click") & F.col("value").isNotNull()
    )
    b = ev.groupBy(
        F.floor(F.col("value") / 25).cast("bigint").alias("bin")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    t = b.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    both = (F.col("ca") > 0) & (F.col("cb") > 0)
    p = F.col("ca").cast("double") / F.col("n_a")
    q = F.col("cb").cast("double") / F.col("n_b")
    return (
        b.crossJoin(F.broadcast(t))
        .groupBy("n_a", "n_b")
        .agg(
            F.sum(F.when(both, 1).otherwise(0)).cast("bigint").alias("n_bins"),
            F.round(F.sum(F.when(both, (p - q) * F.log(p / q))), 12).alias("psi"),
        )
    )


@register(
    "q_stat_spearman",
    oracle="""
    WITH rows0 AS (
      SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    rx AS (
      SELECT v, 2 * (cum - cnt) + cnt + 1 AS rx2 FROM (
        SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(count(*)) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM rows0 GROUP BY x)
    ),
    ry AS (
      SELECT v, 2 * (cum - cnt) + cnt + 1 AS ry2 FROM (
        SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(count(*)) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM rows0 GROUP BY y)
    ),
    j AS (
      SELECT rx2, ry2 FROM rows0
      JOIN rx ON rows0.x = rx.v JOIN ry ON rows0.y = ry.v
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(rx2 AS HUGEINT)) AS sx,
             sum(CAST(ry2 AS HUGEINT)) AS sy,
             sum(CAST(rx2 AS HUGEINT) * CAST(rx2 AS HUGEINT)) AS sxx,
             sum(CAST(ry2 AS HUGEINT) * CAST(ry2 AS HUGEINT)) AS syy,
             sum(CAST(rx2 AS HUGEINT) * CAST(ry2 AS HUGEINT)) AS sxy
      FROM j
    )
    SELECT n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt(
               (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             ) AS rho
    FROM s
    """,
)
def q_stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spearman rank correlation of quantity vs extended price (heavy
    # ties on the quantity side — 50 distinct values — exercising the
    # tied-average-rank lane). The operator never sorts rows globally:
    # each column's 2·rank map comes from a value-level hash agg + the
    # distributed prefix sum, joined back onto the rows; the five moment
    # sums ride the exact decimal(38,0)/HUGEINT lanes and only the final
    # Pearson expression is double, with the identical tree both engines
    # (parity rule 2 — no rounding). 100 TB: two value-level prefix
    # sums + two hash joins ∝ data + one scalar rollup.
    from trembita_spark.operators.stats import spearman_rho

    li = table(spark, sf_dir, "lineitem")
    return spearman_rho(li, "l_quantity", "l_extendedprice")


@register(
    "q_stat_jsd",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
      GROUP BY 1
    ),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM b)
    SELECT n_a, n_b,
           round(sum(
             CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / n_a)
               * ln((CAST(ca AS DOUBLE) / n_a)
                    / (0.5 * (CAST(ca AS DOUBLE) / n_a) + 0.5 * (CAST(cb AS DOUBLE) / n_b)))
             ELSE 0 END
             + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / n_b)
               * ln((CAST(cb AS DOUBLE) / n_b)
                    / (0.5 * (CAST(ca AS DOUBLE) / n_a) + 0.5 * (CAST(cb AS DOUBLE) / n_b)))
             ELSE 0 END), 12) AS jsd
    FROM b CROSS JOIN t GROUP BY n_a, n_b
    """,
)
def q_stat_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Jensen-Shannon divergence between the purchase and click value
    # distributions (same fixed-width bins as q_stat_psi). Unlike PSI,
    # JSD is defined on single-arm bins — the zero arm contributes 0 and
    # the nonzero arm tests against the mixture m = (p+q)/2 — so it is
    # bounded (≤ ln 2) and never needs the both-arms restriction: the
    # better drift metric when new bins appear in one snapshot, which is
    # exactly what corpus drift looks like. One hash agg + broadcast
    # scalar totals + one fold; ln is libm → round-12 (parity rule 5).
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click") & F.col("value").isNotNull()
    )
    b = ev.groupBy(
        F.floor(F.col("value") / 25).cast("bigint").alias("bin")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    t = b.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    p = F.col("ca").cast("double") / F.col("n_a")
    q = F.col("cb").cast("double") / F.col("n_b")
    m = 0.5 * p + 0.5 * q
    term = F.when(F.col("ca") > 0, 0.5 * p * F.log(p / m)).otherwise(
        F.lit(0)
    ) + F.when(F.col("cb") > 0, 0.5 * q * F.log(q / m)).otherwise(F.lit(0))
    return (
        b.crossJoin(F.broadcast(t))
        .groupBy("n_a", "n_b")
        .agg(F.round(F.sum(term), 12).alias("jsd"))
    )


@register(
    "q_stat_chisq",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT c.event_type, c.dow, c.o,
             sum(c.o) OVER (PARTITION BY c.event_type) AS rt,
             sum(c.o) OVER (PARTITION BY c.dow) AS ct,
             sum(c.o) OVER () AS n
      FROM cells c
    ),
    contrib AS (
      SELECT event_type, dow, o,
             pow(o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE), 2)
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) AS x,
             n
      FROM tot
    )
    SELECT list_reduce(list(x ORDER BY event_type, dow), (a, b) -> a + b) AS chi2,
           CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
           CAST(any_value(n) AS BIGINT) AS n
    FROM contrib
    """,
)
def q_stat_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Chi-squared independence test (event_type x day-of-week); the
    # contingency fold is shared with q_stat_cramers_v — see
    # _chisq_event_dow for the shape and the ordered-fold discipline.
    folded = _chisq_event_dow(spark, sf_dir)
    return folded.select(
        "chi2", (F.col("r1") * F.col("c1")).cast("bigint").alias("dof"), "n"
    )


def _event_dow_tot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event_type × day-of-week contingency CELLS frame with
    marginals: (event_type, dow, o, rt, ct, n). One data-touching
    partial-agg groupBy; the marginal windows run over the cells frame
    (|types| × 7 ≈ 35 rows, never the fact table) — shared by the
    chi-square family (q_stat_chisq / q_stat_cramers_v) and the
    G-test (q_stat_gtest)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday.
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    return cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("dow")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )


def _chisq_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row (chi2, r1, c1, n) over `_event_dow_tot`'s cell frame:
    the statistic folds the per-cell contributions in a SORTED
    sequential order (collect → array_sort → aggregate), matching
    DuckDB's ordered list_reduce left-fold bit-for-bit — a global float
    sum is only order-safe if the order is pinned. At 100 TB only the
    first groupBy touches data; everything after is cells-sized
    (|types| × 7)."""
    tot = _event_dow_tot(spark, sf_dir)
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast("double")
    contrib = tot.select(
        "event_type",
        "dow",
        "o",
        (F.pow(F.col("o") - e, 2) / e).alias("x"),
        "n",
    )
    return contrib.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "dow", "x"))),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("chi2"),
        (F.countDistinct("event_type") - 1).cast("bigint").alias("r1"),
        (F.countDistinct("dow") - 1).cast("bigint").alias("c1"),
        F.any_value("n").cast("bigint").alias("n"),
    )


@register(
    "q_stat_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT c.event_type, c.dow, c.o,
             sum(c.o) OVER (PARTITION BY c.event_type) AS rt,
             sum(c.o) OVER (PARTITION BY c.dow) AS ct,
             sum(c.o) OVER () AS n
      FROM cells c
    ),
    contrib AS (
      SELECT event_type, dow, o,
             pow(o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE), 2)
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) AS x,
             n
      FROM tot
    ),
    s AS (
      SELECT list_reduce(list(x ORDER BY event_type, dow), (a, b) -> a + b) AS chi2,
             CAST(count(DISTINCT event_type) - 1 AS BIGINT) AS r1,
             CAST(count(DISTINCT dow) - 1 AS BIGINT) AS c1,
             CAST(any_value(n) AS BIGINT) AS n
      FROM contrib
    )
    SELECT chi2, n,
           sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(r1, c1) AS DOUBLE))) AS cramers_v
    FROM s
    """,
)
def q_stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cramér's V effect size — chi2 alone grows with n, so at corpus
    # scale every association is "significant"; V = sqrt(chi2 / (n ·
    # min(r-1, c-1))) is the scale-free [0,1] strength a monitoring
    # pipeline actually thresholds on. Rides the same ordered
    # contingency fold as q_stat_chisq (one data-touching groupBy);
    # the normalization is one extra double expression with the
    # identical tree both engines.
    folded = _chisq_event_dow(spark, sf_dir)
    return folded.select(
        "chi2",
        "n",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("r1"), F.col("c1")).cast("double")
            )
        ).alias("cramers_v"),
    )


@register(
    "q_stat_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                                 '([1-9])', 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
    )
    SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS obs_frac,
           round(log10(1.0 + 1.0 / digit), 12) AS benford_frac
    FROM c
    """,
)
def q_stat_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-significant-digit audit (fraud/data-quality screen):
    # the first digit is extracted from the CANONICAL DECIMAL STRING of
    # the price, not via log10 bucketing — floor(log10(x)) can flip at
    # power-of-10 boundaries when the two engines' libm log10 differ by
    # an ulp, while decimal(18,2) renders identically everywhere. One
    # partial-agg groupBy over 9 digit groups; the expected Benford
    # share is a 9-row constant (rounded to a 1e-12 grid for the same
    # libm reason). Compare obs_frac vs benford_frac downstream.
    od = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = od.select(
        F.regexp_extract(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            "([1-9])",
            1,
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    return c.select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(Window.partitionBy()).cast("double")).alias("obs_frac"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 12).alias("benford_frac"),
    )


# Shared closed-form Cramer fragments for the 2-feature normal equations
# (identical TEXT evaluated by Spark's F.expr and DuckDB — expression
# shape equality is what makes the doubles bit-identical).
_LR3_DET = (
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) "
    "+ s2 * (s1 * s12 - s11 * s2))"
)
_LR3_DET0 = (
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) "
    "+ s2 * (s1y * s12 - s11 * s2y))"
)
_LR3_DET1 = (
    "(n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) "
    "+ s2 * (s1 * s2y - s1y * s2))"
)
_LR3_DET2 = (
    "(n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2) "
    "+ sy * (s1 * s12 - s11 * s2))"
)


@register(
    "q_ml_linreg_multi",
    oracle=f"""
    WITH s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS s1,
             CAST(sum(x2) AS DOUBLE) AS s2,
             CAST(sum(x1 * x1) AS DOUBLE) AS s11,
             CAST(sum(x2 * x2) AS DOUBLE) AS s22,
             CAST(sum(x1 * x2) AS DOUBLE) AS s12,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x1 * y) AS DOUBLE) AS s1y,
             CAST(sum(x2 * y) AS DOUBLE) AS s2y
      FROM (
        SELECT CAST(hour(ts) AS BIGINT) AS x1,
               CAST(dayofweek(ts) AS BIGINT) AS x2,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
      )
    )
    SELECT {_LR3_DET0} / {_LR3_DET} AS b0,
           {_LR3_DET1} / {_LR3_DET} AS b1,
           {_LR3_DET2} / {_LR3_DET} AS b2,
           CAST(n AS BIGINT) AS n_rows
    FROM s
    """,
)
def q_ml_linreg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multiple linear regression (value ~ hour-of-day + day-of-week) by
    # the normal equations: ONE partial-agg pass accumulates the 9
    # exact moment sums (integer features, 2-decimal target -> decimal
    # sums are merge-order-independent), then Cramer's rule solves the
    # 3x3 system in closed form. Spark evaluates the SAME formula TEXT
    # the DuckDB oracle runs (shared fragments above), so every double
    # is bit-identical. The 100 TB cost is the single scan; the solve
    # is O(1) on a 1-row frame. Spark dayofweek is 1..7 Sunday-first;
    # DuckDB 0..6 — the Spark side subtracts 1.
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("bigint").alias("x1"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("x2"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    s = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
    )
    return s.selectExpr(
        f"{_LR3_DET0} / {_LR3_DET} AS b0",
        f"{_LR3_DET1} / {_LR3_DET} AS b1",
        f"{_LR3_DET2} / {_LR3_DET} AS b2",
        "CAST(n AS BIGINT) AS n_rows",
    )


@register(
    "q_mining_copair",
    oracle="""
    WITH bask AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM bask),
    supp1 AS (SELECT part, CAST(count(*) AS BIGINT) AS s FROM bask GROUP BY 1),
    pairs AS (
      SELECT a.part AS part_a, b.part AS part_b,
             CAST(count(*) AS BIGINT) AS support
      FROM bask a JOIN bask b ON a.okey = b.okey AND a.part < b.part
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, support,
           CAST(support AS DOUBLE) * n_orders / (sa.s * sb.s) AS lift,
           rk
    FROM (
      SELECT *, CAST(row_number() OVER (
        ORDER BY support DESC, part_a, part_b) AS INT) AS rk
      FROM pairs
    ) p
    JOIN supp1 sa ON sa.part = p.part_a
    JOIN supp1 sb ON sb.part = p.part_b
    CROSS JOIN n
    WHERE rk <= 20
    """,
)
def q_mining_copair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Market-basket co-occurrence mining: top-20 part pairs by support
    # with lift. The pair generation is a SELF-JOIN ON THE BASKET KEY —
    # co-partitioned, one shuffle, and pair fan-out is bounded by
    # basket size squared (baskets are small by nature; a hot basket is
    # a data bug, not a plan input), never |parts|^2. Per-part supports
    # join back broadcast (vocabulary-sized); lift is exact-integer
    # ratio arithmetic -> identical doubles. The global top-20 is an
    # orderBy+limit (TakeOrderedAndProject — per-partition top-k then a
    # 20-row merge, no global sort), ranked AFTER the limit for the
    # unique (support desc, part_a, part_b) order.
    from pyspark.sql.window import Window

    bask = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds pairs (twice) + supports + N
    )
    n = bask.agg(F.countDistinct("okey").alias("n_orders"))
    supp1 = bask.groupBy("part").agg(F.count(F.lit(1)).alias("s"))
    a = bask.select(F.col("okey"), F.col("part").alias("part_a"))
    b = bask.select(F.col("okey"), F.col("part").alias("part_b"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    top = pairs.orderBy(
        F.col("support").desc(), "part_a", "part_b"
    ).limit(20).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("support").desc(), "part_a", "part_b")
        ),
    )
    sa = supp1.select(F.col("part").alias("part_a"), F.col("s").alias("sa"))
    sb = supp1.select(F.col("part").alias("part_b"), F.col("s").alias("sb"))
    return (
        top.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            (F.col("support").cast("double") * F.col("n_orders") / (F.col("sa") * F.col("sb"))).alias("lift"),
            "rk",
        )
    )


@register(
    "q_agg_mom_change",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, revenue, n_orders,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           (revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month) AS mom_change
    FROM m
    """,
)
def q_agg_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Month-over-month revenue change — the BI staple: one partial-agg
    # monthly rollup (the only fact-table pass), then lag + ratio over
    # the MONTHS frame (calendar-sized at any data volume — the benign
    # aggregate-frame window). Exact decimal monthly sums; the ratio is
    # per-row double arithmetic on identical inputs.
    from pyspark.sql.window import Window

    od = table(spark, sf_dir, "orders")
    m = od.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        "n_orders",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("mom_change"),
    )


@register(
    "q_agg_pareto_concentration",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(sum(rev) AS DECIMAL(18,2)) AS total FROM per_cust),
    c AS (
      SELECT o_custkey, rev,
             CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey
                                 ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS cum
      FROM per_cust
    )
    SELECT CAST((SELECT count(*) FROM per_cust) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN cum - rev < CAST(0.8 AS DECIMAL(3,2)) * total
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
           CAST(sum(CASE WHEN cum - rev < CAST(0.8 AS DECIMAL(3,2)) * total
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / (SELECT count(*) FROM per_cust) AS top80_frac
    FROM c CROSS JOIN t
    """,
)
def q_agg_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Revenue concentration (the 80/20 audit): how many customers,
    # ranked by exact decimal revenue, does it take to cover 80% of the
    # total. The running total is the DISTRIBUTED prefix sum
    # (operators/ranking.py prefix_sum) over the unique
    # (rev desc, custkey) order — never a single-partition window on
    # the customer frame — and the 80% threshold test is pure decimal
    # arithmetic (a customer counts while the revenue BEFORE them is
    # under the cutoff), exact on both engines.
    from trembita_spark.operators.ranking import prefix_sum

    od = table(spark, sf_dir, "orders")
    per_cust = (
        od.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
        .localCheckpoint(eager=False)  # feeds total + the ranked curve
    )
    t = per_cust.agg(F.sum("rev").cast("decimal(18,2)").alias("total"))
    c = prefix_sum(
        per_cust, "rev", [F.col("rev").desc(), F.col("o_custkey")], name="cum"
    ).withColumn("cum", F.col("cum").cast("decimal(18,2)"))
    n = per_cust.agg(F.count(F.lit(1)).alias("n_customers"))
    in_top = (
        (F.col("cum") - F.col("rev"))
        < F.lit("0.8").cast("decimal(3,2)") * F.col("total")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(n))
        .agg(
            F.any_value("n_customers").alias("n_customers"),
            F.sum(F.when(in_top, 1).otherwise(0)).alias("n_top80"),
            (
                F.sum(F.when(in_top, 1).otherwise(0)).cast("double")
                / F.any_value("n_customers")
            ).alias("top80_frac"),
        )
    )


@register(
    "q_agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS wt,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS BIGINT) AS total
      FROM lineitem
    )
    SELECT flag,
           min(CASE WHEN 2 * cum >= total THEN price END) AS wmedian_price,
           CAST(any_value(total) AS BIGINT) AS total_weight
    FROM w GROUP BY flag
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted median (quantity-weighted price per return flag — the
    # lower weighted median: smallest price whose cumulative weight
    # reaches half the total), threshold test in exact integer
    # arithmetic (2*cum >= total — no division), then a conditional min.
    #
    # Scale shape: l_returnflag has only THREE distinct values, so a
    # window partitioned by it funnels ~1/3 of lineitem through a single
    # window task — the low-cardinality-key skew the repo's scale
    # discipline bans (round-5 ADVICE). Instead the running weight rides
    # the DISTRIBUTED two-phase prefix sum over the global
    # (flag, price, orderkey, linenumber) range-partitioned order; each
    # flag's rows are contiguous in that order, so the within-flag
    # cumulative is global_cum minus the flag's starting offset —
    # recovered from a 3-row per-flag aggregate broadcast back.
    from trembita_spark.operators.ranking import prefix_sum

    li = table(spark, sf_dir, "lineitem")
    wt = F.col("l_quantity").cast("bigint")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        wt.alias("wt"),
    )
    x = prefix_sum(
        x,
        "wt",
        order_by=[F.col("flag"), F.col("price"), F.col("l_orderkey"), F.col("l_linenumber")],
        name="gcum",
    )
    per_flag = x.groupBy("flag").agg(
        F.sum("wt").cast("bigint").alias("total"),
        # first row of the flag in the global order: its gcum - wt is the
        # cumulative weight of everything BEFORE the flag. PRECONDITION:
        # min() equals that first-row offset only because gcum is
        # monotone under the order, i.e. weights are NONNEGATIVE — true
        # here (l_quantity is 1..50). With signed weights, derive the
        # offset from the flag's first row under the unique
        # (price, orderkey, linenumber) order instead of min().
        F.min(F.col("gcum") - F.col("wt")).cast("bigint").alias("off"),
    )
    x = x.join(F.broadcast(per_flag), "flag")
    cum = F.col("gcum") - F.col("off")
    return x.groupBy("flag").agg(
        F.min(F.when(2 * cum >= F.col("total"), F.col("price"))).alias(
            "wmedian_price"
        ),
        F.any_value("total").cast("bigint").alias("total_weight"),
    )


@register(
    "q_agg_gini",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT rev,
             CAST(row_number() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS i
      FROM per_cust
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rev) AS DOUBLE) AS total_rev,
           (2.0 * CAST(sum(CAST(i AS DECIMAL(18,0)) * rev) AS DOUBLE))
             / (count(*) * CAST(sum(rev) AS DOUBLE))
             - (count(*) + 1.0) / count(*) AS gini
    FROM r
    """,
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gini coefficient of customer revenue (the inequality companion to
    # q_agg_pareto_concentration): closed form over the ascending-rank
    # weighted sum G = 2*Σ(i·x_i)/(n·Σx) − (n+1)/n. Ranks come from the
    # DISTRIBUTED zip_with_index under the unique (rev, custkey) order
    # — no global window on the customer frame — and both Σx and
    # Σ(i·x_i) are exact decimal sums (rank times 2-decimal revenue is
    # exactly representable), so the final doubles are bit-identical.
    from trembita_spark.pipeline import Pipeline

    od = table(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    r = (
        Pipeline(per_cust)
        .zip_with_index([F.col("rev"), F.col("o_custkey")], "idx")
        .df.select("rev", (F.col("idx") + 1).cast("bigint").alias("i"))
    )
    n = F.count(F.lit(1))
    total = F.sum("rev").cast("double")
    iwsum = F.sum(F.col("i").cast("decimal(18,0)") * F.col("rev")).cast("double")
    return r.agg(
        n.alias("n"),
        total.alias("total_rev"),
        ((2.0 * iwsum) / (n * total) - (n + 1.0) / n).alias("gini"),
    )


@register(
    "q_histogram_log",
    oracle="""
    WITH b AS (
      SELECT length(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR)) AS magnitude
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT magnitude, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY magnitude
    """,
)
def q_histogram_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Log-scale (order-of-magnitude) histogram of order values — the
    # latency/money-histogram staple. The magnitude bucket is the DIGIT
    # COUNT of the integer part (a string property of the exact
    # integer), NOT floor(log10(x)): the two engines' libm log10 can
    # disagree by an ulp exactly at the power-of-10 bucket boundaries,
    # where it matters most (same determinism rule as q_stat_benford).
    # One partial-agg groupBy over ~7 buckets.
    od = table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    magnitude = F.length(
        F.floor("o_totalprice").cast("bigint").cast("string")
    ).alias("magnitude")
    return od.select(magnitude).groupBy("magnitude").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q_stat_anova",
    oracle="""
    WITH md AS (
      SELECT
        CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS sd_a,
        sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS sd_n,
        sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS sd_r,
        sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4)) END) AS ssd_a,
        sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4)) END) AS ssd_n,
        sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4)) END) AS ssd_r
      FROM lineitem
    ),
    m AS (
      -- split-cast decimal->double: floor part (< 2^53, exact) + small
      -- fraction part, each a single correctly-rounded conversion in
      -- both engines; a direct CAST of a wide decimal double-rounds in
      -- DuckDB (int128 -> double -> /10^scale) and can differ by ulps.
      SELECT n_a, n_n, n_r,
        CAST(floor(sd_a) AS DOUBLE) + CAST(sd_a - floor(sd_a) AS DOUBLE) AS s_a,
        CAST(floor(sd_n) AS DOUBLE) + CAST(sd_n - floor(sd_n) AS DOUBLE) AS s_n,
        CAST(floor(sd_r) AS DOUBLE) + CAST(sd_r - floor(sd_r) AS DOUBLE) AS s_r,
        CAST(floor(ssd_a) AS DOUBLE) + CAST(ssd_a - floor(ssd_a) AS DOUBLE) AS ss_a,
        CAST(floor(ssd_n) AS DOUBLE) + CAST(ssd_n - floor(ssd_n) AS DOUBLE) AS ss_n,
        CAST(floor(ssd_r) AS DOUBLE) + CAST(ssd_r - floor(ssd_r) AS DOUBLE) AS ss_r
      FROM md
    ),
    v AS (
      SELECT n_a + n_n + n_r AS n,
             s_a + s_n + s_r AS s,
             s_a * s_a / n_a + s_n * s_n / n_n + s_r * s_r / n_r AS sg,
             ss_a + ss_n + ss_r AS sst
      FROM m
    ),
    w AS (
      SELECT n,
             sg - s * s / n AS ss_between,
             sst - sg AS ss_within
      FROM v
    )
    SELECT n, ss_between, ss_within,
           (ss_between / 2) / (ss_within / (n - 3)) AS f_stat,
           ss_between / (ss_between + ss_within) AS eta_sq
    FROM w
    """,
)
def q_stat_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One-way ANOVA of l_extendedprice across the three l_returnflag
    # arms (k = 3 fixed by the flag domain): per-arm conditional
    # decimal sums (count, sum, sum-of-squares — price² lands exactly
    # on the 4-dec grid, 1.1e14 units < 2⁵³) in ONE partial-agg scan,
    # then SS_between = Σ s_g²/n_g − S²/N and SS_within = SS_total −
    # Σ s_g²/n_g as fixed-order double expressions over the exact
    # moments — identical tree both engines, bit-exact, NO rounding
    # (parity rule 2). At 100 TB: one map-side-combined scan; the
    # shuffle carries one partial-moment row per partition.
    ev = table(spark, sf_dir, "lineitem")
    arms = [("a", "A"), ("n", "N"), ("r", "R")]
    vdec = F.col("l_extendedprice").cast("decimal(18,2)")
    v2dec = (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
        "decimal(24,4)"
    )
    md = ev.agg(
        *[
            F.sum(F.when(F.col("l_returnflag") == fv, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{a}")
            for a, fv in arms
        ],
        *[
            F.sum(F.when(F.col("l_returnflag") == fv, vdec)).alias(f"sd_{a}")
            for a, fv in arms
        ],
        *[
            F.sum(F.when(F.col("l_returnflag") == fv, v2dec)).alias(f"ssd_{a}")
            for a, fv in arms
        ],
    )
    # split-cast decimal->double (see the oracle comment): floor part +
    # fraction part are each one correctly-rounded conversion in both
    # engines, so the doubles agree bit-for-bit while the integer part
    # is < 2^53 (holds far past the fixture scales; the statistic
    # itself loses meaning before the bound does).
    d2d = lambda c: F.floor(c).cast("double") + (c - F.floor(c)).cast("double")  # noqa: E731
    m = md.select(
        "n_a",
        "n_n",
        "n_r",
        *[d2d(F.col(f"sd_{a}")).alias(f"s_{a}") for a, _ in arms],
        *[d2d(F.col(f"ssd_{a}")).alias(f"ss_{a}") for a, _ in arms],
    )
    v = m.select(
        (F.col("n_a") + F.col("n_n") + F.col("n_r")).alias("n"),
        (F.col("s_a") + F.col("s_n") + F.col("s_r")).alias("s"),
        (
            F.col("s_a") * F.col("s_a") / F.col("n_a")
            + F.col("s_n") * F.col("s_n") / F.col("n_n")
            + F.col("s_r") * F.col("s_r") / F.col("n_r")
        ).alias("sg"),
        (F.col("ss_a") + F.col("ss_n") + F.col("ss_r")).alias("sst"),
    )
    w = v.select(
        "n",
        (F.col("sg") - F.col("s") * F.col("s") / F.col("n")).alias("ss_between"),
        (F.col("sst") - F.col("sg")).alias("ss_within"),
    )
    return w.select(
        "n",
        "ss_between",
        "ss_within",
        (
            (F.col("ss_between") / 2) / (F.col("ss_within") / (F.col("n") - 3))
        ).alias("f_stat"),
        (
            F.col("ss_between") / (F.col("ss_between") + F.col("ss_within"))
        ).alias("eta_sq"),
    )


@register(
    "q_stat_gtest",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT c.event_type, c.dow, c.o,
             sum(c.o) OVER (PARTITION BY c.event_type) AS rt,
             sum(c.o) OVER (PARTITION BY c.dow) AS ct,
             sum(c.o) OVER () AS n
      FROM cells c
    ),
    contrib AS (
      SELECT event_type, dow,
             2 * o * ln(CAST(o AS DOUBLE)
                        / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))) AS x,
             n
      FROM tot
    )
    SELECT round(list_reduce(list(x ORDER BY event_type, dow), (a, b) -> a + b), 12) AS g_stat,
           CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
           CAST(any_value(n) AS BIGINT) AS n
    FROM contrib
    """,
)
def q_stat_gtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # G-test (log-likelihood ratio) of event_type × day-of-week
    # independence: G = 2 Σ o·ln(o/e) over the same contingency cell
    # frame as q_stat_chisq (`_event_dow_tot` — one data-touching
    # groupBy, marginal windows over the 35-row cells frame). The fold
    # is the chisq family's sorted sequential order; ln is libm so the
    # folded statistic is round-12 (parity rule 5), unlike chisq's
    # pow-only contributions. G is additive across partitions of the
    # table (chisq is not) — the reason a corpus pipeline monitors G.
    tot = _event_dow_tot(spark, sf_dir)
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    contrib = tot.select(
        "event_type",
        "dow",
        (2 * F.col("o") * F.log(F.col("o").cast("double") / e)).alias("x"),
        "n",
    )
    return contrib.agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("event_type", "dow", "x"))),
                F.lit(0.0),
                lambda acc, s: acc + s["x"],
            ),
            12,
        ).alias("g_stat"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("bigint").alias("dof"),
        F.any_value("n").cast("bigint").alias("n"),
    )


@register(
    "q_stat_kendall",
    oracle="""
    WITH cells AS (
      SELECT l_quantity AS x, l_linenumber AS y, CAST(count(*) AS BIGINT) AS c
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
        AND l_linenumber IN (1, 2, 3, 4, 5, 6, 7)
      GROUP BY 1, 2
    ),
    p AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS HUGEINT) AS cc,
        CAST(coalesce(sum(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS HUGEINT) AS dd
      FROM cells a JOIN cells b ON a.x < b.x
    ),
    mx AS (SELECT x, CAST(sum(c) AS HUGEINT) AS nx FROM cells GROUP BY x),
    my AS (SELECT y, CAST(sum(c) AS HUGEINT) AS ny FROM cells GROUP BY y),
    m AS (
      SELECT CAST(sum(nx) AS HUGEINT) AS n,
             CAST(sum(nx * (nx - 1)) AS HUGEINT) AS tx2
      FROM mx
    ),
    m2 AS (SELECT CAST(sum(ny * (ny - 1)) AS HUGEINT) AS ty2 FROM my)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(cc AS BIGINT) AS concordant,
           CAST(dd AS BIGINT) AS discordant,
           CAST(cc - dd AS DOUBLE) * 2
             / sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE) * CAST(n * (n - 1) - ty2 AS DOUBLE)) AS tau_b
    FROM p, m, m2
    """,
)
def q_stat_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Kendall's tau-b of quantity vs line number (heavy ties on both
    # sides — 50×7 support). The operator
    # (operators/stats.py: kendall_tau_b) never forms the O(n²) pair
    # set: one groupBy to the contingency cells, the bounded y-domain
    # (1..7, fixed by the fixture schema) pivoted into columns, and ONE
    # distributed prefix sum over the x-support gives every cell its
    # (x'<x, y'<y) dominance count as a fixed expression. The oracle
    # replays the statistic from the quadratic CELL join (350 rows —
    # fine in SQL, wrong shape at scale). Pair/tie moments ride the
    # exact decimal lane; only the final tau is double with the
    # identical tree (parity rule 2 — no rounding). The oracle pins the
    # SAME y-domain the operator enumerates (IN (1..7)): the operator
    # silently drops out-of-domain y, and the r12 hot-orderkey skew
    # rotation (linenumber + 10*rep) caught the unfiltered oracle
    # diverging — the ordinal_assoc ADVICE-r11 trap, now closed here
    # too.
    from trembita_spark.operators.stats import kendall_tau_b

    li = table(spark, sf_dir, "lineitem")
    return kendall_tau_b(
        li, "l_quantity", "l_linenumber", [1, 2, 3, 4, 5, 6, 7]
    )


_LEVENE_ARMS = [("a", "click"), ("b", "purchase"), ("c", "view")]


@register(
    "q_stat_levene",
    oracle="""
    WITH pv AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100,
             CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_b,
             CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS c_c
      FROM events
      WHERE event_type IN ('click', 'purchase', 'view') AND value IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT v100, c_a, c_b, c_c,
             sum(c_a) OVER w AS cum_a,
             sum(c_b) OVER w AS cum_b,
             sum(c_c) OVER w AS cum_c
      FROM pv WINDOW w AS (ORDER BY v100 ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (
      SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
             CAST(sum(c_b) AS BIGINT) AS n_b,
             CAST(sum(c_c) AS BIGINT) AS n_c
      FROM pv
    ),
    meds AS (
      SELECT
        min(CASE WHEN cum_a >= CAST(floor((n_a + 1) / 2) AS BIGINT) THEN v100 END)
      + min(CASE WHEN cum_a >= CAST(floor(n_a / 2) + 1 AS BIGINT) THEN v100 END) AS med2_a,
        min(CASE WHEN cum_b >= CAST(floor((n_b + 1) / 2) AS BIGINT) THEN v100 END)
      + min(CASE WHEN cum_b >= CAST(floor(n_b / 2) + 1 AS BIGINT) THEN v100 END) AS med2_b,
        min(CASE WHEN cum_c >= CAST(floor((n_c + 1) / 2) AS BIGINT) THEN v100 END)
      + min(CASE WHEN cum_c >= CAST(floor(n_c / 2) + 1 AS BIGINT) THEN v100 END) AS med2_c
      FROM cum, tot
    ),
    dm AS (
      SELECT
        sum(CAST(c_a * abs(2 * v100 - med2_a) AS DECIMAL(38,0))) AS sd_a,
        sum(CAST(c_b * abs(2 * v100 - med2_b) AS DECIMAL(38,0))) AS sd_b,
        sum(CAST(c_c * abs(2 * v100 - med2_c) AS DECIMAL(38,0))) AS sd_c,
        sum(CAST(c_a * abs(2 * v100 - med2_a) * abs(2 * v100 - med2_a) AS DECIMAL(38,0))) AS ssd_a,
        sum(CAST(c_b * abs(2 * v100 - med2_b) * abs(2 * v100 - med2_b) AS DECIMAL(38,0))) AS ssd_b,
        sum(CAST(c_c * abs(2 * v100 - med2_c) * abs(2 * v100 - med2_c) AS DECIMAL(38,0))) AS ssd_c
      FROM pv, meds
    ),
    m AS (
      SELECT n_a, n_b, n_c,
        CAST(floor(sd_a) AS DOUBLE) + CAST(sd_a - floor(sd_a) AS DOUBLE) AS s_a,
        CAST(floor(sd_b) AS DOUBLE) + CAST(sd_b - floor(sd_b) AS DOUBLE) AS s_b,
        CAST(floor(sd_c) AS DOUBLE) + CAST(sd_c - floor(sd_c) AS DOUBLE) AS s_c,
        CAST(floor(ssd_a) AS DOUBLE) + CAST(ssd_a - floor(ssd_a) AS DOUBLE) AS ss_a,
        CAST(floor(ssd_b) AS DOUBLE) + CAST(ssd_b - floor(ssd_b) AS DOUBLE) AS ss_b,
        CAST(floor(ssd_c) AS DOUBLE) + CAST(ssd_c - floor(ssd_c) AS DOUBLE) AS ss_c
      FROM dm, tot
    ),
    v AS (
      SELECT n_a + n_b + n_c AS n,
             s_a + s_b + s_c AS s,
             s_a * s_a / n_a + s_b * s_b / n_b + s_c * s_c / n_c AS sg,
             ss_a + ss_b + ss_c AS sst
      FROM m
    ),
    w AS (
      SELECT n, sg - s * s / n AS ss_between, sst - sg AS ss_within FROM v
    )
    SELECT n, ss_between, ss_within,
           (ss_between / 2) / (ss_within / (n - 3)) AS f_stat
    FROM w
    """,
)
def q_stat_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Brown-Forsythe test (Levene with median centers — the
    # recommended robust variant) of value-spread homogeneity across
    # the click/purchase/view arms. Two scale tricks make it exact AND
    # 100 TB-safe: (1) the per-arm MEDIAN is computed on the integer
    # lane as the SUM of the two middle order statistics (med2 =
    # 2·100·median) read off ONE distributed prefix sum over the
    # (v100 × arm) contingency frame — no percentile interpolation, so
    # no cross-engine ulp risk, and no low-cardinality window (the
    # prefix sum is operators/ranking.py's range-partitioned form);
    # (2) the deviations |2·v100 − med2| = 200·|x − med| are integers,
    # so the ANOVA moments ride the exact decimal(38,0) lane and the F
    # statistic (scale-invariant, so the 200× factor cancels) is a
    # fixed-order double tree over exact moments — bit-identical in
    # both engines, NO rounding (parity rule 2). One data-touching
    # groupBy; everything after is support-sized (≤ |value domain|).
    from trembita_spark.operators.ranking import prefix_sum_multi

    ev = table(spark, sf_dir, "events")
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    pv = (
        ev.where(
            F.col("event_type").isin([t for _, t in _LEVENE_ARMS])
            & F.col("value").isNotNull()
        )
        .select(v100.alias("v100"), "event_type")
        .groupBy("v100")
        .agg(
            *[
                F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
                .cast("bigint")
                .alias(f"c_{a}")
                for a, t in _LEVENE_ARMS
            ]
        )
    )
    cum = prefix_sum_multi(
        pv,
        [f"c_{a}" for a, _ in _LEVENE_ARMS],
        order_by=[F.col("v100")],
        names=[f"cum_{a}" for a, _ in _LEVENE_ARMS],
    )
    tot = pv.agg(
        *[F.sum(f"c_{a}").cast("bigint").alias(f"n_{a}") for a, _ in _LEVENE_ARMS]
    )
    meds = cum.crossJoin(F.broadcast(tot)).agg(
        *[
            (
                F.min(
                    F.when(
                        F.col(f"cum_{a}")
                        >= F.floor((F.col(f"n_{a}") + 1) / 2).cast("bigint"),
                        F.col("v100"),
                    )
                )
                + F.min(
                    F.when(
                        F.col(f"cum_{a}")
                        >= (F.floor(F.col(f"n_{a}") / 2) + 1).cast("bigint"),
                        F.col("v100"),
                    )
                )
            ).alias(f"med2_{a}")
            for a, _ in _LEVENE_ARMS
        ]
    )
    d = {
        a: F.abs(2 * F.col("v100") - F.col(f"med2_{a}")) for a, _ in _LEVENE_ARMS
    }
    dm = pv.crossJoin(F.broadcast(meds)).agg(
        *[
            F.sum((F.col(f"c_{a}") * d[a]).cast("decimal(38,0)")).alias(f"sd_{a}")
            for a, _ in _LEVENE_ARMS
        ],
        *[
            F.sum((F.col(f"c_{a}") * d[a] * d[a]).cast("decimal(38,0)")).alias(
                f"ssd_{a}"
            )
            for a, _ in _LEVENE_ARMS
        ],
    )
    d2d = lambda c: F.floor(c).cast("double") + (c - F.floor(c)).cast("double")  # noqa: E731
    m = dm.crossJoin(F.broadcast(tot)).select(
        *[F.col(f"n_{a}") for a, _ in _LEVENE_ARMS],
        *[d2d(F.col(f"sd_{a}")).alias(f"s_{a}") for a, _ in _LEVENE_ARMS],
        *[d2d(F.col(f"ssd_{a}")).alias(f"ss_{a}") for a, _ in _LEVENE_ARMS],
    )
    v = m.select(
        (F.col("n_a") + F.col("n_b") + F.col("n_c")).alias("n"),
        (F.col("s_a") + F.col("s_b") + F.col("s_c")).alias("s"),
        (
            F.col("s_a") * F.col("s_a") / F.col("n_a")
            + F.col("s_b") * F.col("s_b") / F.col("n_b")
            + F.col("s_c") * F.col("s_c") / F.col("n_c")
        ).alias("sg"),
        (F.col("ss_a") + F.col("ss_b") + F.col("ss_c")).alias("sst"),
    )
    w = v.select(
        "n",
        (F.col("sg") - F.col("s") * F.col("s") / F.col("n")).alias("ss_between"),
        (F.col("sst") - F.col("sg")).alias("ss_within"),
    )
    return w.select(
        "n",
        "ss_between",
        "ss_within",
        (
            (F.col("ss_between") / 2) / (F.col("ss_within") / (F.col("n") - 3))
        ).alias("f_stat"),
    )


@register(
    "q_stat_wilcoxon",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100
      FROM events WHERE value IS NOT NULL
    ),
    us AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'click'    THEN v100 END) AS sc,
             sum(CASE WHEN event_type = 'purchase' THEN v100 END) AS sp
      FROM r GROUP BY user_id
    ),
    d AS (
      SELECT CAST(sc - sp AS BIGINT) AS d
      FROM us WHERE sc IS NOT NULL AND sp IS NOT NULL AND sc <> sp
    ),
    lv AS (
      SELECT abs(d) AS v,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1
    ),
    c AS (
      SELECT v, na, n,
             sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumn
      FROM lv
    ),
    m AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_tot,
             CAST(sum(na * (2 * (cumn - n) + n + 1)) AS BIGINT) AS w2,
             CAST(sum(CASE WHEN n > 1 THEN n * n * n - n ELSE 0 END) AS BIGINT)
               AS ties
      FROM c
    )
    SELECT n_tot AS n, w2,
           (CAST(w2 AS DOUBLE)
              - CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1) / 2)
           / sqrt(CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1)
                    * (2 * CAST(n_tot AS DOUBLE) + 1) / 6
                  - CAST(ties AS DOUBLE) / 12) AS z_stat
    FROM m
    """,
)
def q_stat_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wilcoxon signed-rank (operators/stats.py: wilcoxon_signed_rank)
    # on naturally paired data: per user, total click spend vs total
    # purchase spend, both as exact cent sums, restricted to users with
    # at least one of each (the paired complement to q_stat_mannwhitney's
    # independent-arm test). The difference column is an exact bigint,
    # so the |d|-level ranking, W+ = sum of positive-arm tied ranks
    # (kept doubled: w2 = 2·W+), and the tie moments all stay integer;
    # only the final tie-corrected z is a fixed-order double tree —
    # bit-identical in both engines, NO rounding (parity rule 2). One
    # user-cardinality groupBy + one |d|-support contingency + one
    # distributed prefix sum — mann_whitney_u's 100 TB shape.
    from trembita_spark.operators.stats import wilcoxon_signed_rank

    ev = table(spark, sf_dir, "events")
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    us = (
        ev.where(F.col("value").isNotNull())
        .select("user_id", "event_type", v100.alias("v100"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", F.col("v100"))).alias(
                "sc"
            ),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("v100"))
            ).alias("sp"),
        )
    )
    pairs = us.where(
        F.col("sc").isNotNull() & F.col("sp").isNotNull()
    ).select((F.col("sc") - F.col("sp")).cast("bigint").alias("d"))
    return wilcoxon_signed_rank(pairs, "d")


@register(
    "q_anomaly_robust_z",
    oracle="""
    WITH pv AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT v100, c, sum(c) OVER (ORDER BY v100 ROWS UNBOUNDED PRECEDING) AS cn
      FROM pv
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pv),
    med AS (
      SELECT min(CASE WHEN cn >= CAST(floor((n + 1) / 2) AS BIGINT) THEN v100 END)
           + min(CASE WHEN cn >= CAST(floor(n / 2) + 1 AS BIGINT) THEN v100 END)
             AS med2
      FROM cum, tot
    ),
    dc AS (
      SELECT abs(2 * v100 - med2) AS d, CAST(sum(c) AS BIGINT) AS c
      FROM pv, med GROUP BY 1
    ),
    dcum AS (
      SELECT d, c, sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cn
      FROM dc
    ),
    mad AS (
      SELECT min(CASE WHEN cn >= CAST(floor((n + 1) / 2) AS BIGINT) THEN d END)
           + min(CASE WHEN cn >= CAST(floor(n / 2) + 1 AS BIGINT) THEN d END)
             AS mad2
      FROM dcum, tot
    )
    SELECT n, med2, mad2,
           CAST(sum(CASE WHEN 1349 * abs(2 * v100 - med2) > 3500 * mad2
                         THEN c ELSE 0 END) AS BIGINT) AS n_out,
           CAST(sum(CASE WHEN 1349 * abs(2 * v100 - med2) > 3500 * mad2
                         THEN c * v100 ELSE 0 END) AS BIGINT) AS sum_out_v100
    FROM pv, med, mad, tot
    GROUP BY n, med2, mad2
    """,
)
def q_anomaly_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Robust z-score outlier detection over event values — the
    # median/MAD criterion (|0.6745·(x−med)/MAD| > 3.5, Iglewicz-
    # Hoaglin's modified z): immune to the outliers it hunts, unlike
    # mean/stddev. Everything rides the integer lane: both medians are
    # the sum of the two middle order statistics (med2 = 2·100·median,
    # mad2 = 2·100·MAD·2... the doubled-tied-middle trick twice — once
    # over the v100 contingency, once over the |2·v100 − med2|
    # deviation cells), and the threshold test folds the constants into
    # the EXACT integer comparison 1349·|2·v100 − med2| > 3500·mad2 —
    # the whole output is integers, parity rule 1, no floats anywhere.
    # Two distributed prefix sums over support-sized frames; one
    # data-touching groupBy (q_stat_levene's shape).
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events")
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    pv = (
        ev.where(F.col("value").isNotNull())
        .select(v100.alias("v100"))
        .groupBy("v100")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = pv.agg(F.sum("c").cast("bigint").alias("n"))

    def two_middle(cells: DataFrame, val: str, out: str) -> DataFrame:
        cum = prefix_sum(cells, "c", order_by=[F.col(val)], name="cn")
        return (
            cum.crossJoin(F.broadcast(tot))
            .agg(
                (
                    F.min(
                        F.when(
                            F.col("cn")
                            >= F.floor((F.col("n") + 1) / 2).cast("bigint"),
                            F.col(val),
                        )
                    )
                    + F.min(
                        F.when(
                            F.col("cn")
                            >= (F.floor(F.col("n") / 2) + 1).cast("bigint"),
                            F.col(val),
                        )
                    )
                ).alias(out)
            )
        )

    med = two_middle(pv, "v100", "med2")
    dc = (
        pv.crossJoin(F.broadcast(med))
        .groupBy(F.abs(2 * F.col("v100") - F.col("med2")).alias("d"))
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    mad = two_middle(dc, "d", "mad2")
    d = F.abs(2 * F.col("v100") - F.col("med2"))
    is_out = 1349 * d > 3500 * F.col("mad2")
    return (
        pv.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(tot))
        .groupBy("n", "med2", "mad2")
        .agg(
            F.sum(F.when(is_out, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_out"),
            F.sum(F.when(is_out, F.col("c") * F.col("v100")).otherwise(0))
            .cast("bigint")
            .alias("sum_out_v100"),
        )
    )


@register(
    "q_stat_kruskal",
    oracle="""
    WITH x AS (
      SELECT value AS v, event_type AS g
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    gv AS (
      SELECT v, g, CAST(count(*) AS BIGINT) AS ngv FROM x GROUP BY v, g
    ),
    pv AS (SELECT v, CAST(sum(ngv) AS BIGINT) AS n FROM gv GROUP BY v),
    c AS (
      SELECT v, n,
             CAST(sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumn
      FROM pv
    ),
    r AS (SELECT v, 2 * (cumn - n) + n + 1 AS r2v FROM c),
    pg AS (
      SELECT g, CAST(sum(ngv) AS BIGINT) AS n_g,
             CAST(sum(ngv * r2v) AS BIGINT) AS r2_g
      FROM gv JOIN r USING (v) GROUP BY g
    ),
    gs AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             sum(CAST(CAST(r2_g AS HUGEINT) * CAST(r2_g AS HUGEINT) AS DOUBLE)
                 / CAST(n_g AS DOUBLE)) AS s_term
      FROM pg
    ),
    t AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_tot,
             CAST(sum(CASE WHEN n > 1
                      THEN CAST(n AS HUGEINT) * n * n - n ELSE 0 END)
                  AS HUGEINT) AS tie3
      FROM c
    )
    SELECT k, n_tot,
           round(3.0 * s_term / CAST(n_tot * (n_tot + 1) AS DOUBLE)
                 - CAST(3 * (n_tot + 1) AS DOUBLE), 6) AS h_stat,
           round((3.0 * s_term / CAST(n_tot * (n_tot + 1) AS DOUBLE)
                  - CAST(3 * (n_tot + 1) AS DOUBLE))
                 / (1.0 - CAST(tie3 AS DOUBLE)
                          / CAST(CAST(n_tot AS HUGEINT) * n_tot * n_tot
                                 - n_tot AS DOUBLE)),
                 6) AS h_corrected
    FROM gs CROSS JOIN t
    """,
)
def q_stat_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Kruskal-Wallis H (operators/stats.py: kruskal_wallis) across ALL
    # FIVE event_type arms of events.value — the k-group generalization
    # of q_stat_mannwhitney's rank machinery: (value, group) contingency
    # agg, exact doubled tied ranks via the distributed prefix sum, a
    # support-sized join of the rank map, per-group integer moments
    # (n_g, 2R_g), and tie correction 1 - Σ(t³-t)/(N³-N). Only the
    # Σ(2R_g)²/n_g rollup sums k doubles in engine order, so H is
    # rounded to 6 decimals on both sides (parity rule 5). 100 TB: one
    # hash agg + one prefix sum + one |support|-sized join — no global
    # sort, no low-cardinality window, shuffles ∝ value support.
    from trembita_spark.operators.stats import kruskal_wallis

    ev = table(spark, sf_dir, "events")
    return kruskal_wallis(ev, "value", F.col("event_type"))


@register(
    "q_stat_jarque_bera",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n, s1, s2, s3, s4,
             s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS v
      FROM s
    ),
    k AS (
      SELECT l_returnflag, n,
             (s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu)
               / (v * sqrt(v)) AS skew,
             (s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
              - 3 * mu * mu * mu * mu) / (v * v) - 3 AS kurt_excess
      FROM m
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, skew, kurt_excess,
           n / 6 * (skew * skew + kurt_excess * kurt_excess / 4) AS jb_stat
    FROM k
    """,
)
def q_stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Jarque-Bera normality statistic JB = n/6·(S² + K²/4) per return
    # flag, on q_agg_skewkurt's exact integer power-sum lane: raw sums
    # q..q⁴ are a commutative bigint monoid (order-independent, map-side
    # combined), and the entire standardized-moment + JB chain is one
    # fixed double expression tree both engines replay bit-for-bit — NO
    # rounding (parity rule 2). σ³ spelled v·sqrt(v) (correctly-rounded
    # ops), never pow(v,1.5) (libm, 1-ulp risk). 100 TB: one partial-agg
    # scan, one row per group out — nothing else moves.
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    n = F.col("n")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    m = s.select(
        "l_returnflag", "n", "s1", "s2", "s3", "s4",
        (s1 / n).alias("mu"),
        (s2 / n - (s1 / n) * (s1 / n)).alias("v"),
    )
    mu, v = F.col("mu"), F.col("v")
    k = m.select(
        "l_returnflag", "n",
        ((s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu) / (v * F.sqrt(v))).alias("skew"),
        (
            (s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu)
            / (v * v) - 3
        ).alias("kurt_excess"),
    )
    sk, ku = F.col("skew"), F.col("kurt_excess")
    return k.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        "skew",
        "kurt_excess",
        (n / 6 * (sk * sk + ku * ku / 4)).alias("jb_stat"),
    )


@register(
    "q_stat_runs",
    oracle="""
    WITH b AS (
      SELECT user_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b,
             CASE WHEN lag(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NOT NULL
                   AND lag(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    <> CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
              THEN 1 ELSE 0 END AS chg
      FROM events
    ),
    per AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(b) AS BIGINT) AS n1,
             CAST(1 + sum(chg) AS BIGINT) AS r
      FROM b GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(n1) AS BIGINT) AS n_ones,
             CAST(sum(n - n1) AS BIGINT) AS n_zeros,
             CAST(sum(r) AS BIGINT) AS runs,
             sum(CAST(2 * n1 * (n - n1) AS DOUBLE) / CAST(n AS DOUBLE) + 1)
               AS e_runs,
             sum(CASE WHEN n > 1 THEN
                   CAST(2 * n1 * (n - n1) AS DOUBLE)
                   * (CAST(2 * n1 * (n - n1) AS DOUBLE) - CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * (CAST(n AS DOUBLE) - 1))
                 ELSE 0.0 END) AS v_runs
      FROM per
    )
    SELECT n_blocks, n_ones, n_zeros, runs,
           round((CAST(runs AS DOUBLE) - e_runs) / sqrt(v_runs), 6) AS z_stat
    FROM s
    """,
)
def q_stat_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Blocked Wald-Wolfowitz runs test (operators/stats.py: runs_test)
    # on each user's click/non-click sequence under the unique
    # (ts, event_id) order: per-user run counts are exact integers from
    # a user-partitioned lag window (data-cardinality partitioning, not
    # a global sort), the independent-block null moments add, and only
    # the cross-user sum of per-block rational E/Var terms is
    # engine-order-sensitive — hence round(z, 6) both sides (parity
    # rule 5). 100 TB: one user-key shuffle + scalar rollup; nothing
    # collapses to a single task.
    from trembita_spark.operators.stats import runs_test

    ev = table(spark, sf_dir, "events")
    return runs_test(
        ev,
        "user_id",
        [F.col("ts"), F.col("event_id")],
        F.col("event_type") == "click",
    )


@register(
    "q_stat_friedman",
    oracle="""
    WITH us AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ),
    full_blocks AS (
      SELECT user_id FROM us GROUP BY user_id HAVING count(*) = 5
    ),
    cb AS (SELECT us.* FROM us JOIN full_blocks USING (user_id)),
    r AS (
      SELECT a.user_id, a.event_type,
             CAST(2 * sum(CASE WHEN b.t < a.t THEN 1 ELSE 0 END)
                  + sum(CASE WHEN b.t = a.t THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS r2
      FROM cb a JOIN cb b USING (user_id)
      GROUP BY a.user_id, a.event_type
    ),
    pt AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_t FROM r
      GROUP BY event_type
    ),
    gs AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(r2_t AS HUGEINT) * CAST(r2_t AS HUGEINT))
                  AS HUGEINT) AS ssr2
      FROM pt
    ),
    nb AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_blocks FROM r
    )
    SELECT n_blocks, k,
           3.0 * CAST(ssr2 AS DOUBLE)
             / CAST(n_blocks * k * (k + 1) AS DOUBLE)
           - CAST(3 * n_blocks * (k + 1) AS DOUBLE) AS chi2
    FROM gs CROSS JOIN nb
    """,
)
def q_stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Friedman rank test (operators/stats.py: friedman_test): blocks =
    # users, treatments = the 5 event types, response = each user's
    # exact cent-total spend per type (bigint — rank comparisons are
    # integer-exact, never float). Only complete blocks (users with all
    # 5 types) enter. Within-block tied-average ranks come from a
    # user-key k² self-join (doubled → exact integers), rank sums and
    # ΣR² stay in the decimal lane, and chi2 is ONE final double tree —
    # bit-exact both engines, NO rounding (parity rule 2). Because the
    # doubled-rank identity Σ2r = k(k+1) holds per block, the classic
    # statistic needs only the 3/(nk(k+1)) multiplier on the doubled
    # lane. 100 TB: two user-key shuffles, work ∝ users·k².
    from trembita_spark.operators.stats import friedman_test

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    us = ev.groupBy("user_id", "event_type").agg(
        F.sum(v100).cast("bigint").alias("t")
    )
    us = us.localCheckpoint(eager=False)  # feeds the block filter + join
    full_blocks = us.groupBy("user_id").agg(F.count(F.lit(1)).alias("__k")).where(
        F.col("__k") == 5
    ).select("user_id")
    cb = us.join(full_blocks, "user_id")
    return friedman_test(cb, "user_id", "event_type", "t")


@register(
    "q_stat_page",
    oracle="""
    WITH us AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ),
    full_blocks AS (
      SELECT user_id FROM us GROUP BY user_id HAVING count(*) = 5
    ),
    cb AS (SELECT us.* FROM us JOIN full_blocks USING (user_id)),
    r AS (
      SELECT a.user_id, a.event_type,
             CAST(2 * sum(CASE WHEN b.t < a.t THEN 1 ELSE 0 END)
                  + sum(CASE WHEN b.t = a.t THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS r2
      FROM cb a JOIN cb b USING (user_id)
      GROUP BY a.user_id, a.event_type
    ),
    pt AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_t FROM r
      GROUP BY event_type
    ),
    trts AS (SELECT DISTINCT event_type FROM pt),
    pos AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.event_type < a.event_type THEN 1 ELSE 0 END)
                  + 1 AS BIGINT) AS pos
      FROM trts a JOIN trts b ON true
      GROUP BY a.event_type
    ),
    l AS (
      SELECT CAST(sum(pos.pos * pt.r2_t) AS BIGINT) AS l2,
             CAST(count(*) AS BIGINT) AS k
      FROM pt JOIN pos USING (event_type)
    ),
    nb AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_blocks FROM r
    )
    SELECT n_blocks, k,
           CAST(l2 AS DOUBLE) / CAST(2.0 AS DOUBLE) AS l_stat,
           (CAST(l2 AS DOUBLE)
              - CAST(n_blocks * k * (k + 1) * (k + 1) AS DOUBLE)
                / CAST(2.0 AS DOUBLE))
           / (CAST(2.0 AS DOUBLE)
              * sqrt(CAST(n_blocks * k * k * (k + 1) * (k * k - 1) AS DOUBLE)
                     / CAST(144.0 AS DOUBLE))) AS z
    FROM l CROSS JOIN nb
    """,
)
def q_stat_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Page's trend test (operators/stats.py: page_test) — the
    # ordered-alternative sibling of q_stat_friedman on the SAME
    # complete-block doubled-rank lane: treatments (the 5 event types,
    # a-priori ordered by their natural label sort) are position-
    # weighted, L = Σ pos_j·R_j, with the large-sample z closing the
    # form. L2 = 2L stays an exact BIGINT (position k²-self-join is
    # windowless on the k-row treatment frame); z is ONE double tree
    # with a correctly-rounded sqrt — bit-exact both engines, NO
    # rounding. Completes the repeated-measures family Friedman/Quade/
    # Kendall-W opened. 100 TB: identical cost shape to friedman —
    # two user-key shuffles, work ∝ users·k².
    from trembita_spark.operators.stats import page_test

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    us = ev.groupBy("user_id", "event_type").agg(
        F.sum(v100).cast("bigint").alias("t")
    )
    us = us.localCheckpoint(eager=False)  # feeds the block filter + join
    full_blocks = us.groupBy("user_id").agg(F.count(F.lit(1)).alias("__k")).where(
        F.col("__k") == 5
    ).select("user_id")
    cb = us.join(full_blocks, "user_id")
    return page_test(cb, "user_id", "event_type", "t")


# Ridge variants of the shared Cramer fragments: the Gram diagonal of the
# non-intercept features carries +lambda (s11 -> s11l, s22 -> s22l); the
# intercept row/column is unpenalized (standard ridge).
_RIDGE_DET = _LR3_DET.replace("s11", "s11l").replace("s22", "s22l")
_RIDGE_DET0 = _LR3_DET0.replace("s11", "s11l").replace("s22", "s22l")
_RIDGE_DET1 = _LR3_DET1.replace("s11", "s11l").replace("s22", "s22l")
_RIDGE_DET2 = _LR3_DET2.replace("s11", "s11l").replace("s22", "s22l")
_RIDGE_LAMBDA = "1000.0"


@register(
    "q_ml_ridge",
    oracle=f"""
    WITH s0 AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS s1,
             CAST(sum(x2) AS DOUBLE) AS s2,
             CAST(sum(x1 * x1) AS DOUBLE) AS s11,
             CAST(sum(x2 * x2) AS DOUBLE) AS s22,
             CAST(sum(x1 * x2) AS DOUBLE) AS s12,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x1 * y) AS DOUBLE) AS s1y,
             CAST(sum(x2 * y) AS DOUBLE) AS s2y
      FROM (
        SELECT CAST(hour(ts) AS BIGINT) AS x1,
               CAST(dayofweek(ts) AS BIGINT) AS x2,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
      )
    ),
    s AS (
      SELECT *, s11 + {_RIDGE_LAMBDA} AS s11l, s22 + {_RIDGE_LAMBDA} AS s22l
      FROM s0
    )
    SELECT {_RIDGE_DET0} / {_RIDGE_DET} AS b0,
           {_RIDGE_DET1} / {_RIDGE_DET} AS b1,
           {_RIDGE_DET2} / {_RIDGE_DET} AS b2,
           CAST({_RIDGE_LAMBDA} AS DOUBLE) AS lambda_l2,
           CAST(n AS BIGINT) AS n_rows
    FROM s
    """,
)
def q_ml_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ridge regression (value ~ hour-of-day + day-of-week, lambda=1000)
    # by the regularized normal equations: q_ml_linreg_multi's single
    # exact-moment scan, then Cramer on the Gram matrix with +lambda on
    # the non-intercept diagonal (the intercept stays unpenalized).
    # Spark evaluates the SAME formula TEXT as the DuckDB oracle
    # (string-rewritten shared fragments), so every double is
    # bit-identical — no rounding. 100 TB cost: the one scan; the
    # solve is O(1) on a 1-row frame.
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("bigint").alias("x1"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("x2"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    s = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
    ).withColumn("s11l", F.col("s11") + F.lit(1000.0)).withColumn(
        "s22l", F.col("s22") + F.lit(1000.0)
    )
    return s.selectExpr(
        f"{_RIDGE_DET0} / {_RIDGE_DET} AS b0",
        f"{_RIDGE_DET1} / {_RIDGE_DET} AS b1",
        f"{_RIDGE_DET2} / {_RIDGE_DET} AS b2",
        f"CAST({_RIDGE_LAMBDA} AS DOUBLE) AS lambda_l2",
        "CAST(n AS BIGINT) AS n_rows",
    )


def _split_top_level(fragment: str) -> list[str]:
    """Split a shared SQL fragment on top-level commas (commas inside
    parentheses — e.g. round(x, 6) — stay put) so Spark's selectExpr
    evaluates exactly the comma-separated expressions the oracle text
    declares."""
    parts, depth, cur = [], 0, []
    for ch in fragment:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


# Shared logistic-IRLS formula text (identical in Spark and DuckDB — the
# q_ml_linreg_multi discipline): step 1 from beta=0 is closed-form on
# EXACT decimal moments (H = 0.25*[[n,sx],[sx,sxx]], g = [Sy - n/2,
# Sxy - Sx/2]); step 2 re-weights per row with p = sigma(eta).
_LOGR_S1 = (
    "CAST(n_b AS DOUBLE) AS n, CAST(svd AS DOUBLE)/100 AS sx, "
    "CAST(svv AS DOUBLE)/10000 AS sxx, "
    "CAST(syn AS DOUBLE) - CAST(n_b AS DOUBLE)/2 AS g0, "
    "CAST(svp AS DOUBLE)/100 - (CAST(svd AS DOUBLE)/100)/2 AS g1, n_b"
)
_LOGR_B1 = (
    "n_b, 4*(sxx*g0 - sx*g1)/(n*sxx - sx*sx) AS b0, "
    "4*(n*g1 - sx*g0)/(n*sxx - sx*sx) AS b1"
)
_LOGR_FINAL = (
    "round(b0 + (swxx*h0 - swx*h1)/(sw*swxx - swx*swx), 6) AS b0_fit, "
    "round(b1 + (sw*h1 - swx*h0)/(sw*swxx - swx*swx), 6) AS b1_fit"
)


@register(
    "q_ml_logreg",
    oracle=f"""
    WITH b AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)/100 AS x,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
             CAST(value AS DECIMAL(18,2)) AS vd
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_b,
             sum(vd) AS svd, sum(vd * vd) AS svv,
             CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS syn,
             sum(CASE WHEN y = 1.0 THEN vd END) AS svp
      FROM b
    ),
    s1 AS (SELECT {_LOGR_S1} FROM m),
    b1f AS (SELECT {_LOGR_B1} FROM s1),
    r2 AS (
      SELECT x, y, b0, b1, n_b,
             1/(1 + exp(-(b0 + b1*x))) AS p
      FROM b CROSS JOIN b1f
    ),
    m2 AS (
      SELECT b0, b1, n_b,
             sum(p*(1-p)) AS sw, sum(p*(1-p)*x) AS swx,
             sum(p*(1-p)*x*x) AS swxx,
             sum(y-p) AS h0, sum(x*(y-p)) AS h1
      FROM r2 GROUP BY b0, b1, n_b
    )
    SELECT n_b AS n_rows, {_LOGR_FINAL}
    FROM m2
    """,
)
def q_ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Logistic regression P(purchase | value/100) by TWO IRLS
    # (Newton-Raphson) steps from beta = 0, each step a closed-form
    # aggregate round — the bounded-round pattern that makes an
    # "iterative" fit declarative. Step 1 is exact: with p = 1/2 the
    # gradient/Hessian reduce to decimal moment sums, so beta_1 is one
    # fixed double tree. Step 2 re-weights per row with the libm
    # sigmoid and sums doubles in partial-agg order, so the final
    # coefficients round to 6 decimals both sides (parity rule 5).
    # Both engines evaluate the SAME formula text (shared fragments).
    # 100 TB: two scans + one broadcast of a 1-row coefficient frame;
    # adding IRLS steps adds scans, never shuffle width.
    ev = table(spark, sf_dir, "events")
    b = ev.where(F.col("value").isNotNull()).selectExpr(
        "CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)/100 AS x",
        "CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y",
        "CAST(value AS DECIMAL(18,2)) AS vd",
    )
    b = b.localCheckpoint(eager=False)  # feeds both IRLS rounds
    m = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("vd").alias("svd"),
        F.sum(F.col("vd") * F.col("vd")).alias("svv"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("bigint").alias("syn"),
        F.sum(F.when(F.col("y") == 1.0, F.col("vd"))).alias("svp"),
    )
    s1 = m.selectExpr(*[e.strip() for e in _split_top_level(_LOGR_S1)])
    b1f = s1.selectExpr(*[e.strip() for e in _split_top_level(_LOGR_B1)])
    r2 = b.crossJoin(F.broadcast(b1f)).selectExpr(
        "x", "y", "b0", "b1", "n_b", "1/(1 + exp(-(b0 + b1*x))) AS p"
    )
    m2 = r2.groupBy("b0", "b1", "n_b").agg(
        F.expr("sum(p*(1-p))").alias("sw"),
        F.expr("sum(p*(1-p)*x)").alias("swx"),
        F.expr("sum(p*(1-p)*x*x)").alias("swxx"),
        F.expr("sum(y-p)").alias("h0"),
        F.expr("sum(x*(y-p))").alias("h1"),
    )
    return m2.selectExpr(
        "n_b AS n_rows", *[e.strip() for e in _split_top_level(_LOGR_FINAL)]
    )


@register(
    "q_stat_bartlett",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    ),
    v AS (
      SELECT n_i,
             (s2 - s1 * s1 / CAST(n_i AS DOUBLE)) / CAST(n_i - 1 AS DOUBLE)
               AS var_i
      FROM g WHERE n_i > 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_i) AS BIGINT) AS n_tot,
             sum(CAST(n_i - 1 AS DOUBLE) * var_i) AS sp_num,
             sum(CAST(n_i - 1 AS DOUBLE) * ln(var_i)) AS sln,
             sum(1.0 / CAST(n_i - 1 AS DOUBLE)) AS sinv
      FROM v
    )
    SELECT k, n_tot,
           round(
             (CAST(n_tot - k AS DOUBLE)
                * ln(sp_num / CAST(n_tot - k AS DOUBLE)) - sln)
             / (1 + (sinv - 1.0 / CAST(n_tot - k AS DOUBLE))
                    / (3 * CAST(k - 1 AS DOUBLE))),
             6) AS bartlett_stat
    FROM s
    """,
)
def q_stat_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bartlett's test for equal variances across the five event_type
    # arms: per-group EXACT decimal moments (n, Σv, Σv²) → unbiased
    # group variances as fixed double trees, then the classic
    # correction-factor statistic. The k-row rollup sums per-group
    # ln-terms in engine order, so the statistic rounds to 6 decimals
    # both sides (parity rule 5); everything upstream is exact or a
    # shared expression tree. Complements q_stat_levene (which tests
    # the same hypothesis robustly); Bartlett is the likelihood-ratio
    # version. 100 TB: one partial-agg scan, k rows out.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    vd = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(vd).cast("double").alias("s1"),
        F.sum(vd * vd).cast("double").alias("s2"),
    )
    v = g.where(F.col("n_i") > 1).select(
        "n_i",
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_i").cast("double"))
            / (F.col("n_i") - 1).cast("double")
        ).alias("var_i"),
    )
    s = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_i").cast("bigint").alias("n_tot"),
        F.sum((F.col("n_i") - 1).cast("double") * F.col("var_i")).alias("sp_num"),
        F.sum((F.col("n_i") - 1).cast("double") * F.log(F.col("var_i"))).alias("sln"),
        F.sum(F.lit(1.0) / (F.col("n_i") - 1).cast("double")).alias("sinv"),
    )
    nk = (F.col("n_tot") - F.col("k")).cast("double")
    return s.select(
        "k",
        "n_tot",
        F.round(
            (nk * F.log(F.col("sp_num") / nk) - F.col("sln"))
            / (
                1
                + (F.col("sinv") - F.lit(1.0) / nk)
                / (3 * (F.col("k") - 1).cast("double"))
            ),
            6,
        ).alias("bartlett_stat"),
    )


@register(
    "q_stat_cochran_q",
    oracle="""
    WITH ones AS (
      SELECT DISTINCT user_id, event_type
      FROM events WHERE value > 100
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS c_j FROM ones GROUP BY event_type
    ),
    r AS (
      SELECT CAST(count(*) AS BIGINT) AS r_i FROM ones GROUP BY user_id
    ),
    sc AS (
      SELECT CAST(sum(c_j) AS BIGINT) AS t,
             CAST(sum(CAST(c_j AS HUGEINT) * CAST(c_j AS HUGEINT))
                  AS HUGEINT) AS sc2
      FROM c
    ),
    sr AS (
      SELECT CAST(sum(CAST(r_i AS HUGEINT) * CAST(r_i AS HUGEINT))
                  AS HUGEINT) AS sr2
      FROM r
    ),
    nb AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_blocks FROM events
    )
    SELECT CAST(5 AS BIGINT) AS k, n_blocks, t,
           CAST(4 AS DOUBLE)
             * CAST(5 * sc2 - CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
                    AS DOUBLE)
             / CAST(5 * CAST(t AS HUGEINT) - sr2 AS DOUBLE) AS q_stat
    FROM sc CROSS JOIN sr CROSS JOIN nb
    """,
)
def q_stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cochran's Q over binary repeated measures: blocks = users,
    # treatments = the 5 event types (fixed k — an absent (user, type)
    # cell IS a measured 0, so every block is complete by construction),
    # response = "user has at least one event of that type with
    # value > 100". Q = (k-1)·[k·ΣC_j² − T²] / (k·T − ΣR_i²) — column
    # totals, row totals, and their squares are EXACT integers in the
    # decimal lane, so Q is one double division with NO rounding
    # (parity rule 2). All-zero blocks drop out of every moment
    # algebraically — no dense user×type materialization needed. 100 TB:
    # one distinct on the 1-cells + two tiny aggs; shuffle ∝ distinct
    # (user, type) pairs.
    ev = table(spark, sf_dir, "events")
    ones = ev.where(F.col("value") > 100).select("user_id", "event_type").distinct()
    ones = ones.localCheckpoint(eager=False)  # feeds both marginals
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731 — exact lane
    c = ones.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("c_j"))
    r = ones.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("r_i"))
    sc = c.agg(
        F.sum("c_j").cast("bigint").alias("t"),
        F.sum(dec(F.col("c_j")) * dec(F.col("c_j"))).cast("decimal(38,0)").alias("sc2"),
    )
    sr = r.agg(
        F.sum(dec(F.col("r_i")) * dec(F.col("r_i"))).cast("decimal(38,0)").alias("sr2")
    )
    nb = ev.agg(F.count_distinct(F.col("user_id")).cast("bigint").alias("n_blocks"))
    z = sc.crossJoin(F.broadcast(sr)).crossJoin(F.broadcast(nb))
    t = F.col("t")
    return z.select(
        F.lit(5).cast("bigint").alias("k"),
        "n_blocks",
        "t",
        (
            F.lit(4.0)
            * (5 * F.col("sc2") - dec(t) * dec(t)).cast("double")
            / (5 * dec(t) - F.col("sr2")).cast("double")
        ).alias("q_stat"),
    )


@register(
    "q_stat_mcnemar",
    oracle="""
    WITH per AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' AND value > 100
                 THEN 1 ELSE 0 END) AS x,
             max(CASE WHEN event_type = 'purchase' AND value > 100
                 THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS b,
             CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
      FROM per
    )
    SELECT n_users, b, c,
           CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
             AS chi2,
           CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
             / CAST(b + c AS DOUBLE) AS chi2_cc
    FROM s
    """,
)
def q_stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # McNemar's test on naturally paired binary outcomes: per user,
    # x = "has a click with value > 100", y = "has a purchase with
    # value > 100". Only the discordant cells matter: chi2 = (b-c)²/
    # (b+c), plus the Edwards continuity-corrected variant — every
    # moment is an exact integer from ONE user-key aggregate, and the
    # two statistics are single double divisions, NO rounding (parity
    # rule 2). 100 TB: one conditional-max agg on the user key + a
    # scalar rollup.
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("value") > 100), 1)
            .otherwise(0)
        ).alias("x"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 100), 1)
            .otherwise(0)
        ).alias("y"),
    )
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when((F.col("x") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint").alias("b"),
        F.sum(F.when((F.col("x") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint").alias("c"),
    )
    b, c = F.col("b"), F.col("c")
    return s.select(
        "n_users",
        "b",
        "c",
        (((b - c) * (b - c)).cast("double") / (b + c).cast("double")).alias("chi2"),
        (
            ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double")
            / (b + c).cast("double")
        ).alias("chi2_cc"),
    )


@register(
    "q_agg_theil",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx_g,
             sum(CAST(o_totalprice AS DOUBLE)
                 * ln(CAST(o_totalprice AS DOUBLE))) AS sxlx_g
      FROM orders GROUP BY o_orderpriority
    ),
    t AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n, sum(sx_g) AS sx
      FROM g
    ),
    w AS (
      SELECT n, sx,
             sum((sx_g / sx) * (sxlx_g / sx_g - ln(sx_g / n_g))) AS t_within,
             sum((sx_g / sx) * ln((sx_g / n_g) / (sx / n))) AS t_between
      FROM g CROSS JOIN t GROUP BY n, sx
    )
    SELECT n,
           round(t_within, 6) AS theil_within,
           round(t_between, 6) AS theil_between,
           round(t_within + t_between, 6) AS theil_total
    FROM w
    """,
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Theil T inequality index of order prices with its exact
    # between/within decomposition across the 5 order priorities:
    # per-group moments (n_g, exact decimal Σx, float Σ x·ln x), then
    # T_g = Σxlnx/Σx − ln(μ_g), share-weighted within term, and the
    # between term Σ s_g·ln(μ_g/μ) — total = within + between by the
    # decomposition identity (both reported, so the identity is
    # oracle-checked). Per-row ln and the k-term rollups are libm/
    # engine-order sensitive → round-6 (parity rule 5). 100 TB: one
    # partial-agg scan, 5 rows after.
    od = table(spark, sf_dir, "orders")
    xd = F.col("o_totalprice").cast("double")
    g = od.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sx_g"),
        F.sum(xd * F.log(xd)).alias("sxlx_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("bigint").alias("n"), F.sum("sx_g").alias("sx")
    )
    j = g.crossJoin(F.broadcast(t))
    mu_g = F.col("sx_g") / F.col("n_g")
    mu = F.col("sx") / F.col("n")
    share = F.col("sx_g") / F.col("sx")
    w = j.groupBy("n", "sx").agg(
        F.sum(share * (F.col("sxlx_g") / F.col("sx_g") - F.log(mu_g))).alias(
            "t_within"
        ),
        F.sum(share * F.log(mu_g / mu)).alias("t_between"),
    )
    return w.select(
        "n",
        F.round(F.col("t_within"), 6).alias("theil_within"),
        F.round(F.col("t_between"), 6).alias("theil_between"),
        F.round(F.col("t_within") + F.col("t_between"), 6).alias("theil_total"),
    )


@register(
    "q_stat_proportion_z",
    oracle="""
    WITH s AS (
      SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(sum(CASE WHEN event_type = 'purchase' AND value > 100
                      THEN 1 ELSE 0 END) AS BIGINT) AS x1,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2,
             CAST(sum(CASE WHEN event_type = 'click' AND value > 100
                      THEN 1 ELSE 0 END) AS BIGINT) AS x2
      FROM events WHERE value IS NOT NULL
    )
    SELECT n1, x1, n2, x2,
           CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2 AS diff,
           (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                    * (1 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                    * (1.0 / n1 + 1.0 / n2)) AS z_stat
    FROM s
    """,
)
def q_stat_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-proportion z-test with pooled variance: P(value > 100) in the
    # purchase arm vs the click arm. All four cell counts are exact
    # integers from ONE conditional-sum scan; diff and z are single
    # fixed double trees — bit-identical both engines, NO rounding
    # (parity rule 2). The A/B-testing workhorse beside q_stat_ttest
    # (means) and q_stat_mcnemar (paired). 100 TB: one partial-agg
    # scan, one row out.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    is_p = F.col("event_type") == "purchase"
    is_c = F.col("event_type") == "click"
    hi = F.col("value") > 100
    s = ev.agg(
        F.sum(F.when(is_p, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is_p & hi, 1).otherwise(0)).cast("bigint").alias("x1"),
        F.sum(F.when(is_c, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(is_c & hi, 1).otherwise(0)).cast("bigint").alias("x2"),
    )
    n1, x1, n2, x2 = F.col("n1"), F.col("x1"), F.col("n2"), F.col("x2")
    p1 = x1.cast("double") / n1
    p2 = x2.cast("double") / n2
    pp = (x1 + x2).cast("double") / (n1 + n2).cast("double")
    return s.select(
        "n1", "x1", "n2", "x2",
        (p1 - p2).alias("diff"),
        (
            (p1 - p2)
            / F.sqrt(pp * (1 - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
        ).alias("z_stat"),
    )


# Shared Poisson-IRLS formula text (identical both engines). With the
# single binary regressor, BOTH rounds are closed-form over the four
# exact integers (n0, n1, sy0, sy1): step 1 (beta=0, mu=1) and step 2
# (mu constant within each x-group) need no per-row float sums at all.
_POIS_B1 = (
    "n0, n1, sy0, sy1, "
    "(sy0 - n0) / n0 AS b0, "
    "((n0 + n1) * (sy1 - n1) - n1 * (sy0 + sy1 - n0 - n1)) / (n0 * n1) AS b1"
)
_POIS_MU = (
    "n0, n1, sy0, sy1, b0, b1, "
    "exp(b0) AS mu0, exp(b0 + b1) AS mu1"
)
_POIS_B2 = (
    "CAST(n0 + n1 AS BIGINT) AS n_cells, "
    "round(b0 + (n1 * mu1 * (sy0 - n0 * mu0 + sy1 - n1 * mu1)"
    " - n1 * mu1 * (sy1 - n1 * mu1)) / (n0 * mu0 * n1 * mu1), 6) AS b0_fit, "
    "round(b1 + (-(n1 * mu1) * (sy0 - n0 * mu0 + sy1 - n1 * mu1)"
    " + (n0 * mu0 + n1 * mu1) * (sy1 - n1 * mu1)) / (n0 * mu0 * n1 * mu1), 6)"
    " AS b1_fit"
)


@register(
    "q_ml_poisson",
    oracle=f"""
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y,
             CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS x
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
             CAST(sum(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             CAST(sum(CASE WHEN x = 0 THEN y ELSE 0 END) AS DOUBLE) AS sy0,
             CAST(sum(CASE WHEN x = 1 THEN y ELSE 0 END) AS DOUBLE) AS sy1
      FROM d
    ),
    s1 AS (SELECT {_POIS_B1} FROM m),
    s2 AS (SELECT {_POIS_MU} FROM s1)
    SELECT {_POIS_B2} FROM s2
    """,
)
def q_ml_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Poisson regression with log link — daily events per (user, day) ~
    # weekend indicator — by two IRLS rounds. With one binary
    # regressor, BOTH Newton steps are closed-form over four exact
    # integer cells (n0, n1, sy0, sy1): step 1 because mu = 1
    # everywhere at beta = 0, step 2 because mu is constant within
    # each x-group — so unlike q_ml_logreg there are no per-row float
    # sums anywhere. The only non-exact inputs are the two exp() calls
    # (libm, 1-ulp cross-engine risk) → final coefficients round-6
    # (parity rule 5). Spark dayofweek is 1..7 Sunday-first, DuckDB
    # 0..6 — each side tests its own weekend encoding. 100 TB: one
    # (user, day) agg + a 4-cell rollup; the fit itself is O(1).
    ev = table(spark, sf_dir, "events")
    d = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .withColumn(
            "x",
            F.when(F.dayofweek("day").isin(1, 7), 1).otherwise(0),
        )
    )
    m = d.agg(
        F.sum(F.when(F.col("x") == 0, 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(F.col("x") == 1, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("x") == 0, F.col("y")).otherwise(0)).cast("double").alias("sy0"),
        F.sum(F.when(F.col("x") == 1, F.col("y")).otherwise(0)).cast("double").alias("sy1"),
    )
    s1 = m.selectExpr(*[e.strip() for e in _split_top_level(_POIS_B1)])
    s2 = s1.selectExpr(*[e.strip() for e in _split_top_level(_POIS_MU)])
    return s2.selectExpr(*[e.strip() for e in _split_top_level(_POIS_B2)])


@register(
    "q_ml_gmm_em",
    oracle="""
    WITH b AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL
    ),
    init AS (
      SELECT min(x) AS lo, max(x) AS hi FROM b
    ),
    prm AS (
      SELECT lo + (hi - lo) / 4 AS mu1,
             lo + 3 * (hi - lo) / 4 AS mu2,
             ((hi - lo) / 4) * ((hi - lo) / 4) AS v0
      FROM init
    ),
    e AS (
      SELECT x, mu1, mu2, v0,
             exp(-(x - mu1) * (x - mu1) / (2 * v0))
               / (exp(-(x - mu1) * (x - mu1) / (2 * v0))
                  + exp(-(x - mu2) * (x - mu2) / (2 * v0))) AS r
      FROM b CROSS JOIN prm
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(r) AS sr, sum(r * x) AS srx, sum(r * x * x) AS srxx,
             sum((1 - r) * x) AS sqx, sum((1 - r) * x * x) AS sqxx
      FROM e
    )
    SELECT n,
           round(sr / n, 6) AS pi1,
           round(srx / sr, 6) AS mu1,
           round(sqx / (n - sr), 6) AS mu2,
           round(srxx / sr - (srx / sr) * (srx / sr), 6) AS var1,
           round(sqxx / (n - sr) - (sqx / (n - sr)) * (sqx / (n - sr)), 6)
             AS var2
    FROM m
    """,
)
def q_ml_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One EM round of a two-component 1-D Gaussian mixture on
    # events.value — the bounded-round pattern a third time (IRLS
    # twice, now EM): deterministic range-quartile init (exact min/max
    # aggregates, equal initial variances so the shared normalizer
    # cancels in the responsibility ratio), E-step responsibilities as
    # per-row expressions over the broadcast 1-row parameter frame,
    # M-step as one weighted-moment aggregate. Per-row exp is libm and
    # the weighted sums merge in partial-agg order → all five updated
    # parameters round-6 (parity rule 5). 100 TB: one init scan + one
    # EM scan; each further round adds a scan, never shuffle width.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.select(
        F.col("value").cast("decimal(18,2)").cast("double").alias("x")
    )
    b = b.localCheckpoint(eager=False)  # feeds init + E-step
    init = b.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    prm = init.select(
        (F.col("lo") + (F.col("hi") - F.col("lo")) / 4).alias("mu1"),
        (F.col("lo") + 3 * (F.col("hi") - F.col("lo")) / 4).alias("mu2"),
        (((F.col("hi") - F.col("lo")) / 4) * ((F.col("hi") - F.col("lo")) / 4)).alias("v0"),
    )
    e = b.crossJoin(F.broadcast(prm)).selectExpr(
        "x",
        "exp(-(x - mu1) * (x - mu1) / (2 * v0))"
        " / (exp(-(x - mu1) * (x - mu1) / (2 * v0))"
        "    + exp(-(x - mu2) * (x - mu2) / (2 * v0))) AS r",
    )
    m = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("x")).alias("srx"),
        F.sum(F.col("r") * F.col("x") * F.col("x")).alias("srxx"),
        F.sum((1 - F.col("r")) * F.col("x")).alias("sqx"),
        F.sum((1 - F.col("r")) * F.col("x") * F.col("x")).alias("sqxx"),
    )
    n, sr = F.col("n"), F.col("sr")
    return m.select(
        "n",
        F.round(sr / n, 6).alias("pi1"),
        F.round(F.col("srx") / sr, 6).alias("mu1"),
        F.round(F.col("sqx") / (n - sr), 6).alias("mu2"),
        F.round(
            F.col("srxx") / sr - (F.col("srx") / sr) * (F.col("srx") / sr), 6
        ).alias("var1"),
        F.round(
            F.col("sqxx") / (n - sr)
            - (F.col("sqx") / (n - sr)) * (F.col("sqx") / (n - sr)),
            6,
        ).alias("var2"),
    )


@register(
    "q_agg_trimmed_mean",
    oracle="""
    WITH pv AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM pv
    ),
    t AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt) // 10 AS BIGINT) AS k
      FROM pv
    ),
    s AS (
      SELECT n, k,
             CAST(sum(v * greatest(least(cum, n - k) - greatest(cum - cnt, k),
                                   0)) AS BIGINT) AS tsum,
             CAST(sum(CASE WHEN cum - cnt <= k AND cum >= k + 1
                      THEN v ELSE 0 END) AS BIGINT) AS v_lo,
             CAST(sum(CASE WHEN cum - cnt < n - k AND cum >= n - k
                      THEN v ELSE 0 END) AS BIGINT) AS v_hi
      FROM c CROSS JOIN t GROUP BY n, k
    )
    SELECT n, k,
           CAST(tsum AS DOUBLE) / CAST((n - 2 * k) * 100 AS DOUBLE)
             AS trimmed_mean,
           CAST(tsum + k * v_lo + k * v_hi AS DOUBLE)
             / CAST(n * 100 AS DOUBLE) AS winsor_mean
    FROM s
    """,
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 10%-trimmed and winsorized means of events.value, EXACT: on the
    # value-support contingency (cent lane), one distributed prefix sum
    # gives each value's rank interval (cum-cnt, cum]; a value
    # contributes min(cum, n-k) - max(cum-cnt, k) occurrences to the
    # trimmed interior, and the rank-(k+1) / rank-(n-k) boundary values
    # are read off the same frame with interval-membership predicates
    # (each matches exactly one row — summed, not windowed). Every
    # moment is an exact integer; the two means are single double
    # divisions, NO rounding (parity rule 2). The robust-location
    # companion to q_agg_mad / q_window_hampel. 100 TB: one hash agg +
    # one prefix sum over the value support.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    pv = ev.groupBy(v100.alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    t = pv.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr("sum(cnt) div 10").cast("bigint").alias("k"),
    )
    j = c.crossJoin(F.broadcast(t))
    n, k, cum, cnt = F.col("n"), F.col("k"), F.col("cum"), F.col("cnt")
    interior = F.greatest(
        F.least(cum, n - k) - F.greatest(cum - cnt, k), F.lit(0)
    )
    s = j.groupBy("n", "k").agg(
        F.sum(F.col("v") * interior).cast("bigint").alias("tsum"),
        F.sum(
            F.when((cum - cnt <= k) & (cum >= k + 1), F.col("v")).otherwise(0)
        ).cast("bigint").alias("v_lo"),
        F.sum(
            F.when((cum - cnt < n - k) & (cum >= n - k), F.col("v")).otherwise(0)
        ).cast("bigint").alias("v_hi"),
    )
    return s.select(
        "n",
        "k",
        (
            F.col("tsum").cast("double")
            / ((F.col("n") - 2 * F.col("k")) * 100).cast("double")
        ).alias("trimmed_mean"),
        (
            (F.col("tsum") + F.col("k") * F.col("v_lo") + F.col("k") * F.col("v_hi"))
            .cast("double")
            / (F.col("n") * 100).cast("double")
        ).alias("winsor_mean"),
    )


@register(
    "q_agg_iqr_outliers",
    oracle="""
    WITH pv AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM pv
    ),
    t AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST((sum(cnt) + 3) // 4 AS BIGINT) AS r1,
             CAST((3 * sum(cnt) + 3) // 4 AS BIGINT) AS r3
      FROM pv
    ),
    q AS (
      SELECT n,
             CAST(sum(CASE WHEN cum - cnt < r1 AND cum >= r1
                      THEN v ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN cum - cnt < r3 AND cum >= r3
                      THEN v ELSE 0 END) AS BIGINT) AS q3
      FROM c CROSS JOIN t GROUP BY n
    ),
    o AS (
      SELECT n, q1, q3,
             CAST(sum(CASE WHEN 2 * v < 5 * q1 - 3 * q3
                            OR 2 * v > 5 * q3 - 3 * q1
                      THEN cnt ELSE 0 END) AS BIGINT) AS n_outliers
      FROM c CROSS JOIN q GROUP BY n, q1, q3
    )
    SELECT n,
           CAST(q1 AS DOUBLE) / 100 AS q1,
           CAST(q3 AS DOUBLE) / 100 AS q3,
           CAST(5 * q1 - 3 * q3 AS DOUBLE) / 200 AS fence_lo,
           CAST(5 * q3 - 3 * q1 AS DOUBLE) / 200 AS fence_hi,
           n_outliers
    FROM o
    """,
)
def q_agg_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tukey-fence outlier census, EXACT: type-1 quartiles are the
    # boundary order statistics at ranks ceil(n/4) / ceil(3n/4), read
    # off the value-support prefix sum with interval-membership
    # predicates (the q_agg_trimmed_mean lane), and the fence test
    # v < q1 − 1.5·IQR / v > q3 + 1.5·IQR doubles through to the
    # all-integer comparison 2v < 5q1 − 3q3 / 2v > 5q3 − 3q1 — the
    # outlier count is exact; only the reported quartiles/fences divide
    # once into doubles (parity rule 2, no rounding). 100 TB: one hash
    # agg + one prefix sum + one broadcast-scalar re-scan of the
    # support frame.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    pv = ev.groupBy(v100.alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    c = c.localCheckpoint(eager=False)  # feeds quartile + census passes
    t = pv.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        ((F.sum("cnt") + 3) / 4).cast("bigint").alias("r1"),
        ((3 * F.sum("cnt") + 3) / 4).cast("bigint").alias("r3"),
    )
    cum, cnt = F.col("cum"), F.col("cnt")
    # every scalar frame below is a GROUPING-FREE aggregate so each
    # crossJoin(broadcast(...)) build side passes the BNLJ floor's
    # benign rule (a keyed aggregate would be flagged — round-6 ADVICE)
    q = c.crossJoin(F.broadcast(t)).agg(
        F.sum(
            F.when((cum - cnt < F.col("r1")) & (cum >= F.col("r1")), F.col("v"))
            .otherwise(0)
        ).cast("bigint").alias("q1"),
        F.sum(
            F.when((cum - cnt < F.col("r3")) & (cum >= F.col("r3")), F.col("v"))
            .otherwise(0)
        ).cast("bigint").alias("q3"),
    )
    o = c.crossJoin(F.broadcast(q)).agg(
        F.sum(
            F.when(
                (2 * F.col("v") < 5 * F.col("q1") - 3 * F.col("q3"))
                | (2 * F.col("v") > 5 * F.col("q3") - 3 * F.col("q1")),
                F.col("cnt"),
            ).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
        F.max("q1").cast("bigint").alias("q1"),
        F.max("q3").cast("bigint").alias("q3"),
    )
    return t.select("n").crossJoin(F.broadcast(o)).select(
        "n",
        (F.col("q1").cast("double") / 100).alias("q1"),
        (F.col("q3").cast("double") / 100).alias("q3"),
        ((5 * F.col("q1") - 3 * F.col("q3")).cast("double") / 200).alias("fence_lo"),
        ((5 * F.col("q3") - 3 * F.col("q1")).cast("double") / 200).alias("fence_hi"),
        "n_outliers",
    )


@register(
    "q_stat_cohens_kappa",
    oracle="""
    WITH per AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' AND value > 100
                 THEN 1 ELSE 0 END) AS x,
             max(CASE WHEN event_type = 'purchase' AND value > 100
                 THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM per
    )
    SELECT n, a, b, c, d,
           CAST(a + d AS DOUBLE) / n AS p_observed,
           (CAST((a + b) * (a + c) AS DOUBLE) + CAST((c + d) * (b + d) AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS p_expected,
           (CAST(a + d AS DOUBLE) / n
              - (CAST((a + b) * (a + c) AS DOUBLE)
                 + CAST((c + d) * (b + d) AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
           / (1 - (CAST((a + b) * (a + c) AS DOUBLE)
                   + CAST((c + d) * (b + d) AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
    FROM s
    """,
)
def q_stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohen's kappa between two binary "raters" on the same subjects
    # (per user: high-value click vs high-value purchase — the
    # q_stat_mcnemar cells completed to the full 2×2): observed
    # agreement (a+d)/n against chance agreement from the marginals,
    # kappa = (po − pe)/(1 − pe). All four cells are exact integers
    # from one conditional-max user agg; the kappa chain is one fixed
    # double tree — NO rounding (parity rule 2). 100 TB: one user-key
    # agg + a scalar rollup.
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("value") > 100), 1)
            .otherwise(0)
        ).alias("x"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 100), 1)
            .otherwise(0)
        ).alias("y"),
    )
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((F.col("x") == 1) & (F.col("y") == 1), 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when((F.col("x") == 1) & (F.col("y") == 0), 1).otherwise(0)).cast("bigint").alias("b"),
        F.sum(F.when((F.col("x") == 0) & (F.col("y") == 1), 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when((F.col("x") == 0) & (F.col("y") == 0), 1).otherwise(0)).cast("bigint").alias("d"),
    )
    n, a, b, c, d = F.col("n"), F.col("a"), F.col("b"), F.col("c"), F.col("d")
    po = (a + d).cast("double") / n
    pe = (
        ((a + b) * (a + c)).cast("double") + ((c + d) * (b + d)).cast("double")
    ) / (n.cast("double") * n.cast("double"))
    return s.select(
        "n", "a", "b", "c", "d",
        po.alias("p_observed"),
        pe.alias("p_expected"),
        ((po - pe) / (1 - pe)).alias("kappa"),
    )


@register(
    "q_agg_hoover",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx_g
      FROM orders GROUP BY o_orderpriority
    ),
    d AS (
      SELECT g.grp, g.n_g, g.sx_g,
             sum(abs(CAST(o_totalprice AS DOUBLE) - g.sx_g / g.n_g)) AS sad
      FROM orders o JOIN g ON o.o_orderpriority = g.grp
      GROUP BY g.grp, g.n_g, g.sx_g
    )
    SELECT grp, n_g,
           round(0.5 * sad / sx_g, 6) AS hoover
    FROM d
    """,
)
def q_agg_hoover(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hoover (Robin Hood) index per order priority — the share of total
    # order value that would have to move to equalize orders:
    # H = ½·Σ|x − μ|/Σx. Group means come from exact decimal sums; the
    # per-row absolute deviations are doubles summed in partial-agg
    # order → round-6 (parity rule 5). Completes the inequality family
    # (gini / pareto concentration / theil). 100 TB: one group agg +
    # one broadcast-joined deviation scan.
    od = table(spark, sf_dir, "orders")
    g = od.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sx_g"),
    )
    d = (
        od.join(F.broadcast(g), od.o_orderpriority == g.grp)
        .groupBy("grp", "n_g", "sx_g")
        .agg(
            F.sum(
                F.abs(
                    F.col("o_totalprice").cast("double")
                    - F.col("sx_g") / F.col("n_g")
                )
            ).alias("sad")
        )
    )
    return d.select(
        "grp",
        "n_g",
        F.round(F.lit(0.5) * F.col("sad") / F.col("sx_g"), 6).alias("hoover"),
    )


@register(
    "q_agg_hhi",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority AS grp, o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY o_orderpriority, o_custkey
    ),
    s AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n_sellers,
             -- DECIMAL(19,2) factors force DuckDB's HUGEINT lane: at the
             -- 8x replica x reaches ~1.2e9 and the (18,2)x(18,2) multiply
             -- overflows its INT64 physical type (caught by the r12
             -- oracle watchdog sweep); (19,2)x(19,2) -> (38,4) is exact,
             -- identical in value to Spark's (18,2)x(18,2) -> (37,4)
             CAST(sum(CAST(x AS DECIMAL(19,2)) * CAST(x AS DECIMAL(19,2)))
                  AS DOUBLE) AS sxx,
             CAST(sum(x) AS DOUBLE) AS sx
      FROM per GROUP BY grp
    )
    SELECT grp, n_sellers,
           round(sxx / (sx * sx), 12) AS hhi,
           1.0 / n_sellers AS hhi_floor
    FROM s
    """,
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Herfindahl-Hirschman concentration of order value across
    # customers within each priority: HHI = Σ s_i² = Σx_i²/(Σx)² —
    # both moments are EXACT decimal sums (x_i is a per-customer
    # decimal total; x² stays in the decimal(38,4) lane), so the index
    # is a single double division chain, NO rounding (parity rule 2),
    # with the 1/n perfect-competition floor alongside. 100 TB: two
    # hash aggs (customer-level then group-level), map-side combined.
    od = table(spark, sf_dir, "orders")
    per = od.groupBy(
        F.col("o_orderpriority").alias("grp"), "o_custkey"
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    s = per.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sellers"),
        # square in the (18,2)x(18,2) -> (37,4) decimal lane: DuckDB's
        # sum(decimal(18,2)) is DECIMAL(38,2) and a 38x38 multiply
        # silently promotes to DOUBLE there (lossy) - pinning the
        # factor width keeps BOTH engines exact (seen as a 1-ulp hhi
        # mismatch before the pin)
        F.sum(
            F.col("x").cast("decimal(18,2)") * F.col("x").cast("decimal(18,2)")
        ).cast("double").alias("sxx"),
        F.sum("x").cast("double").alias("sx"),
    )
    return s.select(
        "grp",
        "n_sellers",
        # round-12: the decimal moments are bit-identical, but DuckDB's
        # wide-decimal→double cast rounds twice (int128→double, then
        # ·10^-scale) vs the JVM's single correctly-rounded conversion
        # — a 1-ulp seam on sxx (parity rule 5; hhi error ~1e-19 ≪
        # the 5e-13 half-grid)
        F.round(F.col("sxx") / (F.col("sx") * F.col("sx")), 12).alias("hhi"),
        (F.lit(1.0) / F.col("n_sellers")).alias("hhi_floor"),
    )


# Deterministic Poisson(1) bootstrap weights: cumulative-probability
# thresholds scaled to the 60-bit md5 fold lane (floor(cum·2^60)) so the
# weight mapping is an EXACT integer comparison in both engines.
_BOOT_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)
_BOOT_W_SQL = (
    "CASE WHEN u < {t0} THEN 0 WHEN u < {t1} THEN 1 WHEN u < {t2} THEN 2 "
    "WHEN u < {t3} THEN 3 WHEN u < {t4} THEN 4 ELSE 5 END"
).format(t0=_BOOT_T[0], t1=_BOOT_T[1], t2=_BOOT_T[2], t3=_BOOT_T[3], t4=_BOOT_T[4])


@register(
    "q_stat_bootstrap_ci",
    oracle=f"""
    WITH x AS (
      SELECT event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    reps AS (
      SELECT v, b,
             list_reduce(list_transform(
               string_split_regex(substr(md5(concat(CAST(event_id AS VARCHAR),
                 ':', CAST(b AS VARCHAR))), 1, 15), ''),
               c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
               (a, b2) -> a * 16 + b2) AS u
      FROM x CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
    ),
    wr AS (SELECT v, b, {_BOOT_W_SQL} AS w FROM reps),
    per AS (
      SELECT b, CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(CAST(w AS HUGEINT) * v) AS DOUBLE) AS swx
      FROM wr GROUP BY b
    ),
    means AS (
      SELECT b, swx / (100 * CAST(sw AS DOUBLE)) AS m FROM per
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS b_reps,
             sum(m) AS sm, sum(m * m) AS smm,
             list_sort(list(m)) AS ms
      FROM means
    )
    SELECT b_reps,
           round(sm / b_reps, 6) AS boot_mean,
           round(sqrt((smm - sm * sm / b_reps) / (b_reps - 1)), 6) AS boot_sd,
           ms[2] AS ci_lo,
           ms[31] AS ci_hi
    FROM s
    """,
)
def q_stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic hash bootstrap for the mean of events.value — the
    # online-bootstrap construction with NO RNG: replica b weights each
    # row Poisson(1)-distributed via exact integer thresholds on the
    # 60-bit md5(event_id:b) fold (so both engines assign IDENTICAL
    # weights), per-replica means are exact-moment divisions (cent-lane
    # decimal sums), and the 95% CI is the 2nd/31st order statistic of
    # the 32 sorted replica means — exact doubles, no rounding on the
    # CI bounds; boot_mean/sd round-6 (32-term float rollup). 100 TB:
    # the replica dimension is map-side (one explode ×B, then a 32-group
    # partial agg) — no extra shuffle over the plain mean, which is the
    # whole point of Poisson bootstrapping a distributed scan.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # spread the under-split scan: the 32-replica explode multiplies the
    # md5 work x32 INSIDE the scan-pipelined stage, so a single-split
    # local file would hash 3.2M rows on one core (io.spread_scan;
    # no-op at production split counts)
    x = spread_scan(
        ev.select(
            "event_id",
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
        ),
        "event_id",
    )
    reps = x.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        "event_id",
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    wr = reps.selectExpr("v", "b", f"{_BOOT_W_SQL} AS w")
    per = wr.groupBy("b").agg(
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("v")).cast("double").alias("swx"),
    )
    means = per.select(
        "b", (F.col("swx") / (100 * F.col("sw").cast("double"))).alias("m")
    )
    s = means.agg(
        F.count(F.lit(1)).cast("bigint").alias("b_reps"),
        F.sum("m").alias("sm"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sort_array(F.collect_list("m")).alias("ms"),
    )
    b = F.col("b_reps")
    return s.select(
        "b_reps",
        F.round(F.col("sm") / b, 6).alias("boot_mean"),
        F.round(
            F.sqrt((F.col("smm") - F.col("sm") * F.col("sm") / b) / (b - 1)), 6
        ).alias("boot_sd"),
        F.element_at("ms", 2).alias("ci_lo"),
        F.element_at("ms", 31).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Round-9 additions: classic single-pass ML / robust-stats building blocks.
# ---------------------------------------------------------------------------

_STUMP_SSE = (
    "(CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl)"
    " + (CAST(qt - ql AS DOUBLE)"
    " - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE) / (n - nl))"
)


@register(
    "q_ml_decision_stump",
    oracle=f"""
    WITH per AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS cnt,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS s,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS q
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT x,
             sum(cnt) OVER w AS nl,
             sum(s) OVER w AS sl,
             sum(q) OVER w AS ql
      FROM per WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (SELECT sum(cnt) AS n, sum(s) AS st, sum(q) AS qt FROM per),
    cand AS (
      SELECT x AS split_x,
             CAST(nl AS BIGINT) AS n_left,
             CAST(n - nl AS BIGINT) AS n_right,
             CAST(sl AS DOUBLE) / nl AS mean_left,
             CAST(st - sl AS DOUBLE) / (n - nl) AS mean_right,
             {_STUMP_SSE} AS sse
      FROM cum, tot WHERE nl < n
    )
    SELECT split_x, n_left, n_right, mean_left, mean_right,
           round(sqrt(sse / (n_left + n_right)), 6) AS rmse
    FROM cand ORDER BY sse, split_x LIMIT 1
    """,
)
def q_ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Regression decision stump (the GBDT/CART building block): the best
    # single split x <= t of l_extendedprice by l_quantity, by total
    # SSE = Σ(y-ŷ)² over both children, ŷ = child mean. One groupBy(x)
    # pass accumulates exact per-value (count, Σy, Σy²) in the decimal
    # lane; a distributed prefix sum (ranking.prefix_sum_multi — never a
    # global single-partition window) turns them into left-side sums per
    # candidate threshold; SSE_child = Q - S²/n needs only those. The
    # argmin is TakeOrdered(1) with the (sse, split_x) tie-break. Every
    # double transits the SAME formula text (_STUMP_SSE) on both engines
    # over exact integer/decimal inputs — bit-identical, so the argmin
    # winner matches without rounding. 100 TB: cost = the one scan +
    # a |distinct x|-row reduction; candidate thresholds are the
    # feature's value grid, the standard histogram-split trick.
    from trembita_spark.operators.ranking import prefix_sum_multi

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
    )
    per = li.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    )
    cum = prefix_sum_multi(
        per, ["cnt", "s", "q"], [F.col("x")], ["nl", "sl", "ql"]
    )
    tot = per.agg(
        F.sum("cnt").alias("n"), F.sum("s").alias("st"), F.sum("q").alias("qt")
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("n"))
        .selectExpr(
            "x AS split_x",
            "CAST(nl AS BIGINT) AS n_left",
            "CAST(n - nl AS BIGINT) AS n_right",
            "CAST(sl AS DOUBLE) / nl AS mean_left",
            "CAST(st - sl AS DOUBLE) / (n - nl) AS mean_right",
            f"{_STUMP_SSE} AS sse",
        )
    )
    # Output RMSE (round-6) rather than raw SSE: the Σy² moment exceeds
    # 2^53 raw decimal units, so each engine's decimal→double cast may
    # round a different way (±1 ulp on sse ≈ 5e12 — the only inexact
    # input here). The ARGMIN is unaffected (inter-candidate SSE gaps
    # are ~1e9 ulps); only the displayed magnitude needs the grid.
    return (
        cand.orderBy("sse", "split_x")
        .limit(1)
        .selectExpr(
            "split_x",
            "n_left",
            "n_right",
            "mean_left",
            "mean_right",
            "round(sqrt(sse / (n_left + n_right)), 6) AS rmse",
        )
    )


# Correlation-matrix entries from exact moment sums (n·Sjk − Sj·Sk forms),
# shared text so Spark and DuckDB run bit-identical double arithmetic.
def _pca_r(j: int, k: int) -> str:
    if j == k:
        return "CAST(1.0 AS DOUBLE)"
    a, b = min(j, k), max(j, k)
    return (
        f"(n * s{a}{b} - s{a} * s{b})"
        f" / sqrt((n * s{a}{a} - s{a} * s{a}) * (n * s{b}{b} - s{b} * s{b}))"
    )


_PCA_MOMENTS = """
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS s1,
             CAST(sum(x2) AS DOUBLE) AS s2,
             CAST(sum(x3) AS DOUBLE) AS s3,
             CAST(sum(x1 * x1) AS DOUBLE) AS s11,
             CAST(sum(x2 * x2) AS DOUBLE) AS s22,
             CAST(sum(x3 * x3) AS DOUBLE) AS s33,
             CAST(sum(x1 * x2) AS DOUBLE) AS s12,
             CAST(sum(x1 * x3) AS DOUBLE) AS s13,
             CAST(sum(x2 * x3) AS DOUBLE) AS s23
"""

_PCA_V1 = [
    "r11 + r12 + r13",
    "r12 + r22 + r23",
    "r13 + r23 + r33",
]
_PCA_V2 = [
    "r11 * w1 + r12 * w2 + r13 * w3",
    "r12 * w1 + r22 * w2 + r23 * w3",
    "r13 * w1 + r23 * w2 + r33 * w3",
]


@register(
    "q_ml_pca_power",
    oracle=f"""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS x2,
             CAST(round(l_discount * 100) AS BIGINT) AS x3
      FROM lineitem
    ),
    s AS ({_PCA_MOMENTS} FROM base),
    r AS (
      SELECT {_pca_r(1, 1)} AS r11, {_pca_r(1, 2)} AS r12,
             {_pca_r(1, 3)} AS r13, {_pca_r(2, 2)} AS r22,
             {_pca_r(2, 3)} AS r23, {_pca_r(3, 3)} AS r33,
             CAST(n AS BIGINT) AS n_rows
      FROM s
    ),
    p1 AS (
      SELECT {_PCA_V1[0]} AS w1, {_PCA_V1[1]} AS w2, {_PCA_V1[2]} AS w3,
             r11, r12, r13, r22, r23, r33, n_rows
      FROM r
    ),
    p2 AS (
      SELECT {_PCA_V2[0]} AS u1, {_PCA_V2[1]} AS u2, {_PCA_V2[2]} AS u3,
             sqrt(w1 * w1 + w2 * w2 + w3 * w3) AS nrm1, n_rows
      FROM p1
    )
    SELECT round(CASE WHEN u1 < 0 THEN -u1 ELSE u1 END
             / sqrt(u1 * u1 + u2 * u2 + u3 * u3), 12) AS v1,
           round((CASE WHEN u1 < 0 THEN -u2 ELSE u2 END)
             / sqrt(u1 * u1 + u2 * u2 + u3 * u3), 12) AS v2,
           round((CASE WHEN u1 < 0 THEN -u3 ELSE u3 END)
             / sqrt(u1 * u1 + u2 * u2 + u3 * u3), 12) AS v3,
           round(sqrt(u1 * u1 + u2 * u2 + u3 * u3) / nrm1, 12) AS lambda_est,
           n_rows
    FROM p2
    """,
)
def q_ml_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    # First principal component of the standardized (quantity, price,
    # discount-cents) features by TWO unrolled power-method steps on the
    # 3x3 CORRELATION matrix: one scan accumulates the 9 exact moment
    # sums (integer/decimal lane), the correlation entries and both
    # matrix-vector products are closed-form double expressions sharing
    # the exact formula TEXT with the oracle (the q_ml_linreg_multi
    # discipline) — bit-identical without rounding. v0 = (1,1,1); sign
    # fixed by forcing the first component non-negative; lambda_est =
    # |C²v0| / |C v0| (the power-method Rayleigh proxy). 100 TB: the
    # single scan is the entire data-proportional cost; the 3x3 solve is
    # O(1) on a 1-row frame — the same shape PCA-via-normal-equations
    # takes on any MPP engine.
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("x2"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x3"),
    )
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("x3").cast("double").alias("s3"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x3") * F.col("x3")).cast("double").alias("s33"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x1") * F.col("x3")).cast("double").alias("s13"),
        F.sum(F.col("x2") * F.col("x3")).cast("double").alias("s23"),
    )
    r = s.selectExpr(
        f"{_pca_r(1, 1)} AS r11",
        f"{_pca_r(1, 2)} AS r12",
        f"{_pca_r(1, 3)} AS r13",
        f"{_pca_r(2, 2)} AS r22",
        f"{_pca_r(2, 3)} AS r23",
        f"{_pca_r(3, 3)} AS r33",
        "CAST(n AS BIGINT) AS n_rows",
    )
    p1 = r.selectExpr(
        f"{_PCA_V1[0]} AS w1",
        f"{_PCA_V1[1]} AS w2",
        f"{_PCA_V1[2]} AS w3",
        "r11", "r12", "r13", "r22", "r23", "r33", "n_rows",
    )
    p2 = p1.selectExpr(
        f"{_PCA_V2[0]} AS u1",
        f"{_PCA_V2[1]} AS u2",
        f"{_PCA_V2[2]} AS u3",
        "sqrt(w1 * w1 + w2 * w2 + w3 * w3) AS nrm1",
        "n_rows",
    )
    # round-12 on the normalized outputs: the Σx2² moment exceeds 2^53
    # raw decimal units at sf0.1, so the decimal→double casts may round
    # differently per engine (±1 ulp into the correlation entries — the
    # q_ml_decision_stump lesson); components are O(1), so the 5e-13
    # half-grid dwarfs any amplified ulp while the formula text stays
    # shared.
    return p2.selectExpr(
        "round(CASE WHEN u1 < 0 THEN -u1 ELSE u1 END"
        " / sqrt(u1 * u1 + u2 * u2 + u3 * u3), 12) AS v1",
        "round((CASE WHEN u1 < 0 THEN -u2 ELSE u2 END)"
        " / sqrt(u1 * u1 + u2 * u2 + u3 * u3), 12) AS v2",
        "round((CASE WHEN u1 < 0 THEN -u3 ELSE u3 END)"
        " / sqrt(u1 * u1 + u2 * u2 + u3 * u3), 12) AS v3",
        "round(sqrt(u1 * u1 + u2 * u2 + u3 * u3) / nrm1, 12) AS lambda_est",
        "n_rows",
    )


_GRUBBS_SD = (
    "sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt)"
    " / (cnt - 1))"
)


@register(
    "q_stat_grubbs",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             CAST(count(*) AS BIGINT) AS cnt,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS q
      FROM events GROUP BY 1
    ),
    st AS (
      SELECT grp, cnt,
             CAST(s AS DOUBLE) / cnt AS mean,
             {_GRUBBS_SD} AS sd
      FROM g
    ),
    dev AS (
      SELECT e.event_type AS grp, st.cnt, st.mean, st.sd,
             CAST(e.value AS DOUBLE) AS v,
             abs(CAST(e.value AS DOUBLE) - st.mean) AS d
      FROM events e JOIN st ON e.event_type = st.grp
    ),
    mx AS (
      SELECT grp, cnt, mean, sd, max(d) AS maxdev
      FROM dev GROUP BY 1, 2, 3, 4
    )
    SELECT d.grp AS grp, d.cnt AS n, mx.maxdev / d.sd AS g_stat,
           min(d.v) AS suspect
    FROM dev d JOIN mx ON d.grp = mx.grp AND d.d = mx.maxdev
    GROUP BY 1, 2, 3
    """,
)
def q_stat_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grubbs' outlier statistic per event_type: G = max|x - mean| / sd,
    # plus the suspect value achieving the max (ties -> smallest value,
    # stated as min() over the argmax rows in BOTH engines — never an
    # engine-defined arg_max). Mean/sd come from exact decimal moment
    # sums; every double is the same formula text over those, so the
    # per-row deviations are bit-identical and the double-equality join
    # d = maxdev selects the same rows cross-engine. 100 TB: one groupBy
    # pass for moments, one broadcast join back (group stats are
    # |event_type| rows), one max aggregate, one argmax re-join — all
    # partial-aggregated, nothing driver-side.
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.sum(
            F.col("value").cast("decimal(18,2)")
            * F.col("value").cast("decimal(18,2)")
        ).alias("q"),
    )
    st = g.selectExpr(
        "grp", "cnt", "CAST(s AS DOUBLE) / cnt AS mean", f"{_GRUBBS_SD} AS sd"
    )
    dev = (
        ev.join(F.broadcast(st), ev.event_type == st.grp)
        .select(
            "grp",
            "cnt",
            "mean",
            "sd",
            F.col("value").cast("double").alias("v"),
            F.abs(F.col("value").cast("double") - F.col("mean")).alias("d"),
        )
    )
    mx = dev.groupBy("grp", "cnt", "mean", "sd").agg(F.max("d").alias("maxdev"))
    return (
        dev.join(
            F.broadcast(mx.select("grp", "maxdev")),
            ["grp"],
        )
        .where(F.col("d") == F.col("maxdev"))
        .groupBy(
            "grp",
            F.col("cnt").alias("n"),
            (F.col("maxdev") / F.col("sd")).alias("g_stat"),
        )
        .agg(F.min("v").alias("suspect"))
    )


_CONF_METRICS = [
    "CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy",
    "CAST(tp AS DOUBLE) / (tp + fp) AS precision_",
    "CAST(tp AS DOUBLE) / (tp + fn) AS recall_",
    # 2.0e0: a bare 2.0 parses as DECIMAL(2,1) in Spark SQL but DOUBLE
    # in DuckDB — the e-notation literal is double in both.
    "2.0e0 * tp / (2.0e0 * tp + fp + fn) AS f1",
]


@register(
    "q_eval_confusion",
    oracle=f"""
    WITH c AS (
      SELECT CAST(count(*) FILTER (WHERE value >= 10 AND event_type = 'purchase') AS BIGINT) AS tp,
             CAST(count(*) FILTER (WHERE value >= 10 AND event_type <> 'purchase') AS BIGINT) AS fp,
             CAST(count(*) FILTER (WHERE value < 10 AND event_type = 'purchase') AS BIGINT) AS fn,
             CAST(count(*) FILTER (WHERE value < 10 AND event_type <> 'purchase') AS BIGINT) AS tn
      FROM events
    )
    SELECT tp, fp, fn, tn, {', '.join(_CONF_METRICS)}
    FROM c
    """,
)
def q_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Binary-classifier evaluation: confusion matrix + accuracy /
    # precision / recall / F1 for the threshold rule "value >= 10
    # predicts purchase". The four cells are one conditional-count scan
    # (exact integers); every ratio is the same formula text over them
    # on both engines. This is the eval half every ML key needs — the
    # q_eval_ndcg/recall discipline applied to classification. 100 TB:
    # a single partial-aggregated scan, O(1) result.
    ev = table(spark, sf_dir, "events")
    pred = F.col("value") >= 10
    truth = F.col("event_type") == "purchase"
    cell = lambda p, t: F.sum(  # noqa: E731
        F.when(p & t, 1).otherwise(0)
    ).cast("bigint")
    c = ev.agg(
        cell(pred, truth).alias("tp"),
        cell(pred, ~truth).alias("fp"),
        cell(~pred, truth).alias("fn"),
        cell(~pred, ~truth).alias("tn"),
    )
    return c.selectExpr("tp", "fp", "fn", "tn", *_CONF_METRICS)


_ODDS_FIELDS = [
    "CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) AS odds_ratio",
    "round(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)), 12) AS log_or",
    "round(sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d), 12) AS se",
    "round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))"
    " - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 12) AS ci_lo",
    "round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))"
    " + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 12) AS ci_hi",
]


@register(
    "q_stat_odds_ratio",
    oracle=f"""
    WITH t AS (
      SELECT CAST(count(*) FILTER (WHERE hour(ts) >= 12 AND event_type = 'purchase') AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE hour(ts) >= 12 AND event_type <> 'purchase') AS BIGINT) AS b,
             CAST(count(*) FILTER (WHERE hour(ts) < 12 AND event_type = 'purchase') AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE hour(ts) < 12 AND event_type <> 'purchase') AS BIGINT) AS d
      FROM events
    )
    SELECT a, b, c, d, {', '.join(_ODDS_FIELDS)}
    FROM t
    """,
)
def q_stat_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 2x2 odds ratio with the Woolf logit 95% CI: exposure = afternoon
    # (hour >= 12), outcome = purchase. The four cells are exact
    # integers from one scan; OR, ln OR, SE = sqrt(Σ 1/cell) and the
    # exp(ln OR ± 1.96·SE) bounds are the same formula text both
    # engines (libm ln/exp are 1-ulp → round-12, the q_stat_psi
    # discipline). Epidemiology's workhorse effect-size test, missing
    # from the chi-square family until now.
    ev = table(spark, sf_dir, "events")
    exp_ = F.hour("ts") >= 12
    out_ = F.col("event_type") == "purchase"
    cell = lambda p, t: F.sum(  # noqa: E731
        F.when(p & t, 1).otherwise(0)
    ).cast("bigint")
    t = ev.agg(
        cell(exp_, out_).alias("a"),
        cell(exp_, ~out_).alias("b"),
        cell(~exp_, out_).alias("c"),
        cell(~exp_, ~out_).alias("d"),
    )
    return t.selectExpr("a", "b", "c", "d", *_ODDS_FIELDS)


_ESD_SD = (
    "sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt)"
    " / (cnt - 1))"
)


@register(
    "q_anomaly_esd",
    oracle=f"""
    WITH v AS (SELECT CAST(value AS DECIMAL(18,2)) AS x FROM events),
    m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS cnt, sum(x) AS s, sum(x * x) AS q FROM v
    ),
    st1 AS (SELECT cnt, CAST(s AS DOUBLE) / cnt AS mean, {_ESD_SD} AS sd FROM m1),
    d1 AS (
      SELECT v.x, abs(CAST(v.x AS DOUBLE) - st1.mean) AS d, st1.cnt, st1.mean, st1.sd
      FROM v, st1
    ),
    x1 AS (
      SELECT cnt, mean, sd, max(d) AS maxdev FROM d1 GROUP BY 1, 2, 3
    ),
    r1 AS (
      SELECT x1.cnt AS n1, x1.maxdev / x1.sd AS g1,
             min(CAST(d1.x AS DOUBLE)) AS suspect1, x1.maxdev AS maxdev1
      FROM d1 JOIN x1 ON d1.d = x1.maxdev GROUP BY 1, 2, 4
    ),
    v2 AS (
      SELECT d1.x FROM d1, r1 WHERE d1.d <> r1.maxdev1
    ),
    m2 AS (
      SELECT CAST(count(*) AS BIGINT) AS cnt, sum(x) AS s, sum(x * x) AS q FROM v2
    ),
    st2 AS (SELECT cnt, CAST(s AS DOUBLE) / cnt AS mean, {_ESD_SD} AS sd FROM m2),
    d2 AS (
      SELECT v2.x, abs(CAST(v2.x AS DOUBLE) - st2.mean) AS d, st2.cnt, st2.sd
      FROM v2, st2
    ),
    x2 AS (SELECT cnt, sd, max(d) AS maxdev FROM d2 GROUP BY 1, 2)
    SELECT r1.n1, round(r1.g1, 12) AS g1, r1.suspect1,
           x2.cnt AS n2, round(x2.maxdev / x2.sd, 12) AS g2,
           (SELECT min(CAST(d2.x AS DOUBLE)) FROM d2, x2 x WHERE d2.d = x.maxdev) AS suspect2
    FROM r1, x2
    """,
)
def q_anomaly_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-round generalized ESD (iterated Grubbs): round 1 computes
    # G1 = max|x-mean|/sd over all values; ALL rows at the maximal
    # deviation are removed (set semantics — deterministic under ties,
    # unlike "remove one observation"); round 2 recomputes G2 on the
    # remainder. suspect_k = min value among the argmax rows (the
    # q_stat_grubbs convention). Moments ride the exact decimal lane
    # each round, deviations are identical doubles, and the d <> maxdev
    # removal filter compares bit-identical doubles — the same
    # double-equality contract the Grubbs join relies on. round-12 on
    # the G statistics (sd's sqrt is 1-ulp). 100 TB: two scans + two
    # broadcast joins of 1-row stat frames; nothing driver-side.
    ev = table(spark, sf_dir, "events").select(
        F.col("value").cast("decimal(18,2)").alias("x")
    )
    ev = ev.localCheckpoint(eager=False)  # feeds both rounds

    def stats(df):
        m = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("q"),
        )
        return m.selectExpr(
            "cnt", "CAST(s AS DOUBLE) / cnt AS mean", f"{_ESD_SD} AS sd"
        )

    st1 = stats(ev)
    d1 = ev.crossJoin(F.broadcast(st1)).select(
        "x",
        F.abs(F.col("x").cast("double") - F.col("mean")).alias("d"),
        "cnt",
        "mean",
        "sd",
    )
    x1 = d1.groupBy("cnt", "mean", "sd").agg(F.max("d").alias("maxdev"))
    r1 = (
        d1.join(
            F.broadcast(x1.select("maxdev", F.col("cnt").alias("n1"))),
            d1.d == F.col("maxdev"),
        )
        .groupBy(
            "n1",
            F.round(F.col("maxdev") / d1.sd, 12).alias("g1"),
            F.col("maxdev").alias("maxdev1"),
        )
        .agg(F.min(F.col("x").cast("double")).alias("suspect1"))
    )
    v2 = d1.join(F.broadcast(r1.select("maxdev1")), d1.d == F.col("maxdev1"), "left_anti").select("x")
    st2 = stats(v2)
    d2 = v2.crossJoin(F.broadcast(st2)).select(
        "x",
        F.abs(F.col("x").cast("double") - F.col("mean")).alias("d"),
        "cnt",
        "sd",
    )
    x2 = d2.groupBy(F.col("cnt").alias("n2")).agg(F.max("d").alias("maxdev"))
    # r2 is a GROUPING-FREE 1-row aggregate (min over columns that are
    # constant across the argmax rows) rather than a keyed groupBy: the
    # final crossJoin broadcasts it, and the registry-wide BNLJ audit
    # only auto-accepts build sides provably bounded from the plan —
    # a keyed aggregate is data-sized as far as the plan can tell.
    r2 = d2.join(F.broadcast(x2), d2.d == x2.maxdev).agg(
        F.min("n2").alias("n2"),
        F.min(F.round(F.col("maxdev") / d2.sd, 12)).alias("g2"),
        F.min(F.col("x").cast("double")).alias("suspect2"),
    )
    return r1.select("n1", "g1", "suspect1").crossJoin(F.broadcast(r2))


@register(
    "q_eval_calibration",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor(CAST(value AS DECIMAL(18,2)) / 10) AS BIGINT), 9) AS bin,
             CAST(value AS DECIMAL(18,2)) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_bin,
           round(CAST(sum(least(v, 100.00)) AS DOUBLE) / (100 * count(*)), 12) AS conf,
           CAST(sum(y) AS DOUBLE) / count(*) AS acc,
           CAST(sum(y) AS BIGINT) AS n_pos
    FROM b GROUP BY 1
    """,
)
def q_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reliability (calibration) table for the naive probability score
    # p̂ = min(value, 100)/100 predicting purchase: 10 score bins, each
    # with its mean predicted probability (conf) and observed positive
    # rate (acc) — the table ECE/reliability-diagram tooling consumes,
    # completing the eval family (ranking: ndcg/recall/map; class:
    # confusion; probability: this). Bin ids floor exact decimals; conf
    # and acc are single double divisions over exact decimal/integer
    # sums — no rounding needed. 100 TB: one partial-aggregated scan,
    # 10-row result.
    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    b = ev.select(
        F.least(F.floor(v / 10).cast("bigint"), F.lit(9)).alias("bin"),
        v.alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bin"),
        # round-12: the engines' decimal→double conversion of the Σp̂
        # sum can differ by an ulp (Spark BigDecimal.doubleValue vs
        # DuckDB's scaled int128 division) — same lesson as
        # q_ml_decision_stump's RMSE.
        F.round(
            F.sum(F.least(F.col("v"), F.lit(100).cast("decimal(18,2)"))).cast(
                "double"
            )
            / (100 * F.count(F.lit(1))),
            12,
        ).alias("conf"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("acc"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )


@register(
    "q_stat_cvm",
    oracle="""
    WITH x AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(sum(is_a) AS BIGINT) AS na,
             CAST(sum(1 - is_a) AS BIGINT) AS nb
      FROM x GROUP BY v
    ),
    c AS (
      SELECT na, nb,
             CAST(sum(na) OVER w AS BIGINT) AS ca,
             CAST(sum(nb) OVER w AS BIGINT) AS cb
      FROM pv WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    t AS (
      SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b
      FROM pv
    ),
    s AS (
      SELECT n_a, n_b,
             sum(CAST(ca * n_b - cb * n_a AS DECIMAL(38,0))
                 * CAST(ca * n_b - cb * n_a AS DECIMAL(38,0))
                 * (na + nb)) AS u
      FROM c CROSS JOIN t GROUP BY n_a, n_b
    )
    SELECT n_a, n_b,
           round(CAST(u AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b)
                * (CAST(n_a AS DOUBLE) * n_b)), 12) AS cvm_t
    FROM s
    """,
)
def q_stat_cvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-sample Cramér–von Mises statistic (purchase vs click values):
    # T = n·m/(n+m)² · Σ_z (F_a(z) − F_b(z))² over the pooled sample
    # (tie-weighted: each distinct value contributes with multiplicity
    # na+nb). KS's max becomes an L2 sum — sensitive to distributional
    # differences everywhere, not just at the single worst point. The
    # squared ECDF gap is the EXACT integer cross-difference
    # (ca·n_b − cb·n_a)², accumulated in the decimal(38,0) lane
    # (na·nb ≈ 3.6e11 squared ≈ 1.3e23 × weight — far past BIGINT, the
    # q_stat_kruskal n³ lesson applied before it bites); one double
    # division at the end, round-12 (the >2^53 decimal→double cast).
    # Same single multi-column prefix sum as q_stat_ks — the two tests
    # share their entire physical shape. T = U/(n²·m²·(n+m)) where
    # U = Σ (ca·m − cb·n)²·w, algebraically identical to the
    # tie-weighted definition above.
    from trembita_spark.operators.ranking import prefix_sum_multi

    ev = table(spark, sf_dir, "events")
    x = ev.where(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    ).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
    )
    pv = x.groupBy("v").agg(
        F.sum("is_a").cast("bigint").alias("na"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("nb"),
    )
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    c = prefix_sum_multi(pv, ["na", "nb"], [F.col("v")], ["ca", "cb"])
    t = pv.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
    )
    j = c.crossJoin(F.broadcast(t))
    diff = (F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")).cast(
        "decimal(38,0)"
    )
    s = j.groupBy("n_a", "n_b").agg(
        F.sum(diff * diff * (F.col("na") + F.col("nb"))).alias("u")
    )
    return s.selectExpr(
        "n_a",
        "n_b",
        "round(CAST(u AS DOUBLE)"
        " / (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b)"
        "    * (CAST(n_a AS DOUBLE) * n_b)), 12) AS cvm_t",
    )


@register(
    "q_ml_auc",
    oracle="""
    WITH pv AS (
      SELECT value AS v,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS np,
             CAST(count(*) FILTER (WHERE event_type <> 'purchase') AS BIGINT) AS nn
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT np, nn,
             CAST(sum(nn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn
      FROM pv
    ),
    t AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg
      FROM pv
    )
    SELECT n_pos, n_neg,
           CAST(sum(np * (2 * (cumn - nn) + nn)) AS DOUBLE)
             / (2.0e0 * n_pos * n_neg) AS auc
    FROM c CROSS JOIN t GROUP BY n_pos, n_neg
    """,
)
def q_ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROC AUC of the raw score `value` predicting purchase, computed
    # EXACTLY by the rank-sum identity with the standard tie convention
    # (a tied positive-negative pair counts 1/2):
    # AUC·2PN = Σ_v np_v·(2·cumneg_below(v) + nn_v) — every term an
    # exact integer off the value-support frame and ONE distributed
    # prefix sum (the q_stat_ks shape; AUC IS Mann-Whitney U
    # normalized). The single division's operands stay far below 2^53,
    # so the double is identical cross-engine with no rounding. This is
    # the ranking-quality eval the confusion/calibration keys can't
    # express (threshold-free). 100 TB: one hash agg + one prefix sum
    # over the value support — same cost envelope as KS/CvM.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pv = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("np"),
        F.sum(F.when(F.col("event_type") != "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("nn"),
    )
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    c = prefix_sum(pv, "nn", order_by=[F.col("v")], name="cumn")
    t = pv.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
    )
    j = c.crossJoin(F.broadcast(t))
    return (
        j.groupBy("n_pos", "n_neg")
        .agg(
            F.sum(
                F.col("np") * (2 * (F.col("cumn") - F.col("nn")) + F.col("nn"))
            ).alias("s")
        )
        .selectExpr(
            "n_pos",
            "n_neg",
            "CAST(s AS DOUBLE) / (2.0e0 * n_pos * n_neg) AS auc",
        )
    )


@register(
    "q_ts_mann_kendall",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h,
             sum(CAST(value AS DECIMAL(18,2))) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN a.x < c.x THEN 1
                           WHEN a.x > c.x THEN -1 ELSE 0 END) AS BIGINT) AS mk_s
      FROM b a JOIN b c ON a.h < c.h
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_adj
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM b GROUP BY x HAVING count(*) > 1)
    )
    SELECT mk_s, n,
           round((mk_s - CASE WHEN mk_s > 0 THEN 1 WHEN mk_s < 0 THEN -1 ELSE 0 END)
             / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_adj) / 18.0e0), 12)
             AS mk_z
    FROM s, n, ties
    """,
)
def q_ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mann-Kendall trend test on the hourly-total series: S = Σ_{i<j}
    # sign(x_j − x_i) over all bucket pairs (exact decimal sums → exact
    # sign comparisons → exact integer S), normal approximation with
    # the standard tie correction, continuity-corrected z, round-12.
    # The pairwise join is over the BUCKET frame, whose size is bounded
    # by the TIME SPAN (720 hourly points here), not by row count —
    # doubling the data at fixed span changes nothing; a longer span
    # grows it quadratically, which is when you coarsen the bucket (the
    # m4-downsample rationale). Kendall-tau's trend-test sibling, the
    # monitoring question "is this metric drifting".
    ev = table(spark, sf_dir, "events")
    b = ev.groupBy(F.window("ts", "1 hour").getField("start").alias("h")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("x")
    )
    b = b.localCheckpoint(eager=False)  # feeds pairs + counts + ties
    a = b.select(F.col("h").alias("ha"), F.col("x").alias("xa"))
    c2 = b.select(F.col("h").alias("hc"), F.col("x").alias("xc"))
    s = (
        a.join(F.broadcast(c2), F.col("ha") < F.col("hc"))
        .agg(
            F.sum(
                F.when(F.col("xa") < F.col("xc"), 1)
                .when(F.col("xa") > F.col("xc"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("mk_s")
        )
    )
    n = b.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        b.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_adj")
        )
    )
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .selectExpr(
            "mk_s",
            "n",
            "round((mk_s - CASE WHEN mk_s > 0 THEN 1 WHEN mk_s < 0 THEN -1 ELSE 0 END)"
            " / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_adj)"
            " / 18.0e0), 12) AS mk_z",
        )
    )


@register(
    "q_ml_lift_deciles",
    oracle="""
    WITH r AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             ntile(10) OVER (ORDER BY value DESC, event_id) AS decile
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM r GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tot_pos,
                 CAST(sum(n) AS BIGINT) AS tot FROM d),
    c AS (
      SELECT decile, n, n_pos,
             CAST(sum(n_pos) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
             CAST(sum(n) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
      FROM d
    )
    SELECT decile, n, n_pos,
           CAST(cum_pos AS DOUBLE) / tot_pos AS capture,
           (CAST(cum_pos AS DOUBLE) / cum_n) / (CAST(tot_pos AS DOUBLE) / tot)
             AS cum_lift
    FROM c CROSS JOIN t
    """,
)
def q_ml_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gains/lift table: rank by score (value DESC, event_id tiebreak —
    # a unique total order, which ntile REQUIRES for determinism), cut
    # into 10 equal deciles, report each decile's positive capture and
    # cumulative lift vs the base rate — the campaign-targeting eval
    # that AUC's single number hides. Deciles come from
    # ranking.ntile_exact (distributed prefix-sum NTILE, bit-matching
    # SQL ntile without the single-partition global window); every
    # ratio is exact-int division. 100 TB: one range shuffle for the
    # decile cut + a 10-row reduction.
    from trembita_spark.operators.ranking import ntile_exact

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        "value",
        "event_id",
    )
    r = ntile_exact(
        base, [F.col("value").desc(), F.col("event_id")], 10, "decile"
    )
    d = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    d = d.localCheckpoint(eager=False)  # feeds prefix sum + totals (10 rows)
    from trembita_spark.operators.ranking import prefix_sum_multi

    c = prefix_sum_multi(
        d, ["n_pos", "n"], [F.col("decile")], ["cum_pos", "cum_n"]
    )
    t = d.agg(
        F.sum("n_pos").cast("bigint").alias("tot_pos"),
        F.sum("n").cast("bigint").alias("tot"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .selectExpr(
            "decile",
            "n",
            "n_pos",
            "CAST(cum_pos AS DOUBLE) / tot_pos AS capture",
            "(CAST(cum_pos AS DOUBLE) / cum_n)"
            " / (CAST(tot_pos AS DOUBLE) / tot) AS cum_lift",
        )
    )


_KFOLD_H60 = _H60.format(md5="md5('fold#' || CAST(event_id AS VARCHAR))")


@register(
    "q_ml_kfold_assign",
    oracle=f"""
    WITH f AS (
      SELECT ({_KFOLD_H60}) % 5 AS fold,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate
    FROM f GROUP BY 1
    """,
)
def q_ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic k-fold split assignment (k=5) by the salted-md5
    # 60-bit fold of the row id — RNG-free, reproducible across runs,
    # engines, and cluster sizes (every training pipeline's first step;
    # the md5-rank convention the sampling keys already use). Reported
    # as the per-fold balance sheet: size and positive rate, the
    # stratification-drift check you run before trusting a CV score.
    # One scan, |k| output rows; the label never influences the fold
    # (no leakage by construction).
    ev = table(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold#"), F.col("event_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    f = ev.select(
        fold.alias("fold"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    return f.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("pos_rate"),
    )


_WILSON = (
    "(phat + z * z / (2 * n) {sign} z * sqrt((phat * (1.0e0 - phat)"
    " + z * z / (4 * n)) / n)) / (1.0e0 + z * z / n)"
)


@register(
    "q_stat_wilson_ci",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE value >= 50) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    p AS (
      SELECT grp, n, x, CAST(x AS DOUBLE) / n AS phat, 1.96e0 AS z FROM g
    )
    SELECT grp, n, x, phat,
           round({_WILSON.format(sign='-')}, 12) AS ci_lo,
           round({_WILSON.format(sign='+')}, 12) AS ci_hi
    FROM p
    """,
)
def q_stat_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wilson score 95% interval for the proportion P(value >= 50) per
    # event_type — the small-sample-safe, never-outside-[0,1]
    # replacement for the Wald interval q_stat_proportion_z implies.
    # Counts are exact; phat is one exact division; both bounds share
    # the exact formula text with the oracle (sqrt is 1-ulp → round-12,
    # the q_stat_psi discipline). One conditional-count scan, |groups|
    # output rows.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    g = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") >= 50, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    p = g.selectExpr("grp", "n", "x", "CAST(x AS DOUBLE) / n AS phat", "1.96e0 AS z")
    return p.selectExpr(
        "grp",
        "n",
        "x",
        "phat",
        f"round({_WILSON.format(sign='-')}, 12) AS ci_lo",
        f"round({_WILSON.format(sign='+')}, 12) AS ci_hi",
    )


@register(
    "q_eval_brier",
    oracle="""
    WITH b AS (
      SELECT greatest(least(CAST(value AS DECIMAL(18,2)),
                            CAST(100 AS DECIMAL(18,2))),
                      CAST(0 AS DECIMAL(18,2))) AS p100,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             sum(CAST((p100 - 100 * y) * (p100 - 100 * y)
                      AS DECIMAL(38,4))) AS se2
      FROM b
    )
    SELECT n, n_pos,
           CAST(se2 AS DOUBLE) / (10000 * n) AS brier,
           (CAST(n_pos AS DOUBLE) / n) * (1 - CAST(n_pos AS DOUBLE) / n)
             AS uncertainty
    FROM s
    """,
)
def q_eval_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Brier score of the naive probability score p-hat = clip(value,
    # 0, 100)/100 predicting purchase — the probability-eval companion
    # to q_eval_calibration's reliability table. The per-row squared
    # error is kept on the EXACT lane: (p100 - 100y)^2 is a decimal
    # product of decimals (no doubles until the end), summed exactly,
    # then ONE double division — no rounding needed (parity rule 2).
    # The uncertainty term (base-rate variance, the floor of the
    # Murphy decomposition) is the same formula text over exact counts.
    # 100 TB: one partial-aggregated scan, 1-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = F.col("value").cast("decimal(18,2)")
    p100 = F.greatest(
        F.least(d, F.lit(100).cast("decimal(18,2)")),
        F.lit(0).cast("decimal(18,2)"),
    )
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    b = ev.select(p100.alias("p100"), y.alias("y"))
    s = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(
            ((F.col("p100") - 100 * F.col("y"))
             * (F.col("p100") - 100 * F.col("y"))).cast("decimal(38,4)")
        ).alias("se2"),
    )
    pr = F.col("n_pos").cast("double") / F.col("n")
    return s.select(
        "n",
        "n_pos",
        (F.col("se2").cast("double") / (10000 * F.col("n"))).alias("brier"),
        (pr * (1 - pr)).alias("uncertainty"),
    )


@register(
    "q_eval_logloss",
    oracle="""
    WITH b AS (
      SELECT least(greatest(CAST(floor(CAST(value AS DECIMAL(18,2)))
                                 AS BIGINT), 1), 99) AS pc,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT pc,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(1 - y) AS BIGINT) AS neg
      FROM b GROUP BY pc
    ),
    t AS (SELECT CAST(sum(pos) + sum(neg) AS BIGINT) AS n FROM g)
    SELECT n,
           round(sum(-(pos * ln(CAST(pc AS DOUBLE) / 100)
                       + neg * ln(1 - CAST(pc AS DOUBLE) / 100))) / n, 12)
             AS logloss
    FROM g CROSS JOIN t GROUP BY n
    """,
)
def q_eval_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mean binary cross-entropy of the integer-percent score
    # p-hat = clip(floor(value), 1, 99)/100 predicting purchase. The
    # percent clip bounds the score support at 99 distinct levels, so
    # the -[y ln p + (1-y) ln(1-p)] fold runs over AT MOST 99 grouped
    # exact-count terms at any data scale — the q_agg_entropy shape
    # (bounded-support contingency first, tiny libm fold second).
    # ln is libm (1-ulp engine skew) and the 99-term sum merges in
    # partial-agg order -> round-12 (parity rule 5; error ~1e-14 vs a
    # 5e-13 half-grid). 100 TB: one partial-aggregated scan to the
    # 99-row contingency; the fold is constant-size.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pc = F.least(
        F.greatest(
            F.floor(F.col("value").cast("decimal(18,2)")).cast("bigint"),
            F.lit(1),
        ),
        F.lit(99),
    )
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    g = ev.select(pc.alias("pc"), y.alias("y")).groupBy("pc").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
    )
    t = g.agg((F.sum("pos") + F.sum("neg")).cast("bigint").alias("n"))
    p = F.col("pc").cast("double") / 100
    return (
        g.crossJoin(F.broadcast(t))
        .groupBy("n")
        .agg(
            F.round(
                F.sum(-(F.col("pos") * F.log(p) + F.col("neg") * F.log(1 - p)))
                / F.col("n"),
                12,
            ).alias("logloss")
        )
    )


_MCC_FIELDS = [
    "round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)"
    " / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn)),"
    " 12) AS mcc",
    "CAST(tp AS DOUBLE) / (tp + fn) + CAST(tn AS DOUBLE) / (tn + fp) - 1.0e0"
    " AS youden_j",
]


@register(
    "q_eval_mcc",
    oracle=f"""
    WITH c AS (
      SELECT CAST(count(*) FILTER (WHERE value >= 10 AND event_type = 'purchase') AS BIGINT) AS tp,
             CAST(count(*) FILTER (WHERE value >= 10 AND event_type <> 'purchase') AS BIGINT) AS fp,
             CAST(count(*) FILTER (WHERE value < 10 AND event_type = 'purchase') AS BIGINT) AS fn,
             CAST(count(*) FILTER (WHERE value < 10 AND event_type <> 'purchase') AS BIGINT) AS tn
      FROM events
    )
    SELECT tp, fp, fn, tn, {', '.join(_MCC_FIELDS)}
    FROM c
    """,
)
def q_eval_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Matthews correlation coefficient + Youden's J for the same
    # threshold rule as q_eval_confusion ("value >= 10 predicts
    # purchase") — the balanced-classes-free summary the accuracy/F1
    # pair cannot give. The four cells are exact integers from one
    # scan; the marginal products are forced to DOUBLE before
    # multiplying (at 100 TB each marginal is ~1e12, so the 4-way
    # product overflows BIGINT — the q_stat_odds_ratio lesson), and
    # sqrt is 1-ulp libm -> round-12. Youden's J is two exact
    # divisions in fixed formula-text order, no rounding.
    ev = table(spark, sf_dir, "events")
    pred = F.col("value") >= 10
    truth = F.col("event_type") == "purchase"
    cell = lambda p, t: F.sum(  # noqa: E731
        F.when(p & t, 1).otherwise(0)
    ).cast("bigint")
    c = ev.agg(
        cell(pred, truth).alias("tp"),
        cell(pred, ~truth).alias("fp"),
        cell(~pred, truth).alias("fn"),
        cell(~pred, ~truth).alias("tn"),
    )
    return c.selectExpr("tp", "fp", "fn", "tn", *_MCC_FIELDS)


_F1M_PRED = (
    "CASE WHEN v < 20 THEN 'view' WHEN v < 40 THEN 'click'"
    " WHEN v < 60 THEN 'signup' WHEN v < 80 THEN 'purchase'"
    " ELSE 'error' END"
)


@register(
    "q_eval_f1_macro",
    oracle=f"""
    WITH b AS (
      SELECT {_F1M_PRED.replace('v ', 'CAST(value AS DECIMAL(18,2)) ')} AS pred,
             event_type AS truth
      FROM events WHERE value IS NOT NULL
    ),
    tp AS (
      SELECT truth AS cls, CAST(count(*) FILTER (WHERE pred = truth) AS BIGINT) AS tp,
             CAST(count(*) AS BIGINT) AS truth_n
      FROM b GROUP BY truth
    ),
    pn AS (SELECT pred AS cls, CAST(count(*) AS BIGINT) AS pred_n FROM b GROUP BY pred),
    per AS (
      SELECT tp.cls, tp.tp, tp.truth_n,
             COALESCE(pn.pred_n, CAST(0 AS BIGINT)) AS pred_n,
             2.0e0 * tp.tp / (COALESCE(pn.pred_n, 0) + tp.truth_n) AS f1
      FROM tp LEFT JOIN pn ON tp.cls = pn.cls
    ),
    mac AS (
      SELECT CAST(sum(CAST(round(f1, 12) AS DECIMAL(14,12))) AS DOUBLE)
               / count(*) AS macro_f1
      FROM per
    )
    SELECT cls, tp, pred_n, truth_n, f1, macro_f1
    FROM per CROSS JOIN mac
    """,
)
def q_eval_f1_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-class F1 (per class + macro average) for the value-bucket
    # predictor CASE(v<20 view, <40 click, <60 signup, <80 purchase,
    # else error) against the true event_type. Per-class F1 =
    # 2*tp/(pred_n + truth_n) is a single exact-integer division (the
    # support-weighted harmonic-mean identity — no separate P/R
    # divisions to accumulate error). The macro average routes each F1
    # through round-12 -> DECIMAL(14,12) and sums EXACTLY, so the
    # 5-term fold is order-independent by construction rather than by
    # rounding (the class count is data-bounded, but the decimal lane
    # makes the fold safe at any class cardinality). 100 TB: two
    # partial-aggregated scans (truth cells need pred=truth counts;
    # pred marginals are a second pass over the same shuffle key),
    # |classes|-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = F.col("value").cast("decimal(18,2)")
    pred = (
        F.when(v < 20, "view")
        .when(v < 40, "click")
        .when(v < 60, "signup")
        .when(v < 80, "purchase")
        .otherwise("error")
    )
    b = ev.select(pred.alias("pred"), F.col("event_type").alias("truth"))
    b = b.localCheckpoint(eager=False)  # feeds truth cells + pred marginals
    tp = b.groupBy(F.col("truth").alias("cls")).agg(
        F.sum(F.when(F.col("pred") == F.col("truth"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.count(F.lit(1)).cast("bigint").alias("truth_n"),
    )
    pn = b.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("pred_n")
    )
    per = (
        tp.join(F.broadcast(pn), "cls", "left")
        .select(
            "cls",
            "tp",
            F.coalesce("pred_n", F.lit(0).cast("bigint")).alias("pred_n"),
            "truth_n",
        )
        .selectExpr(
            "cls", "tp", "pred_n", "truth_n",
            "2.0e0 * tp / (pred_n + truth_n) AS f1",
        )
    )
    per = per.localCheckpoint(eager=False)  # feeds rows + macro
    mac = per.agg(
        (
            F.sum(F.round(F.col("f1"), 12).cast("decimal(14,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("macro_f1")
    )
    return per.crossJoin(F.broadcast(mac))


_COHEN_SD = (
    "sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)"
    " + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2))"
    " / (n1 + n2 - 2))"
)
_COHEN_D = f"(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / {_COHEN_SD}"


@register(
    "q_stat_cohens_d",
    oracle=f"""
    WITH m AS (
      SELECT CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n1,
             sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS s1,
             sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
               FILTER (WHERE event_type = 'purchase') AS q1,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n2,
             sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS s2,
             sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
               FILTER (WHERE event_type = 'click') AS q2
      FROM events WHERE value IS NOT NULL
    )
    SELECT n1, n2,
           round({_COHEN_D}, 12) AS cohens_d,
           round({_COHEN_D}
                 * (1.0e0 - 3.0e0 / (4.0e0 * (n1 + n2) - 9)), 12) AS hedges_g
    FROM m
    """,
)
def q_stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohen's d (pooled-SD standardized mean difference, purchase vs
    # click values) with the Hedges' g small-sample correction — the
    # effect SIZE the q_stat_ttest family's p-values deliberately
    # don't report. Both group moments come from ONE conditional-
    # aggregate scan on the exact decimal lane; d and g share formula
    # text with the oracle (sqrt is 1-ulp libm -> round-12, the
    # q_stat_psi discipline). 100 TB: one partial-aggregated scan,
    # 1-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = F.col("value").cast("decimal(18,2)")
    is1 = F.col("event_type") == "purchase"
    is2 = F.col("event_type") == "click"
    m = ev.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, d)).alias("s1"),
        F.sum(F.when(is1, d * d)).alias("q1"),
        F.sum(F.when(is2, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(is2, d)).alias("s2"),
        F.sum(F.when(is2, d * d)).alias("q2"),
    )
    return m.selectExpr(
        "n1",
        "n2",
        f"round({_COHEN_D}, 12) AS cohens_d",
        f"round({_COHEN_D} * (1.0e0 - 3.0e0 / (4.0e0 * (n1 + n2) - 9)), 12)"
        " AS hedges_g",
    )


_CA_Z = (
    "(CAST(swa AS DOUBLE) - CAST(a AS DOUBLE) * swn / n)"
    " / sqrt((CAST(a AS DOUBLE) / n) * (1 - CAST(a AS DOUBLE) / n)"
    " * (CAST(sw2n AS DOUBLE) - CAST(swn AS DOUBLE) * swn / n))"
)


@register(
    "q_stat_cochran_armitage",
    oracle=f"""
    WITH b AS (
      SELECT CAST(hour(ts) // 6 AS BIGINT) AS w,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS a,
             CAST(sum(w * y) AS BIGINT) AS swa,
             CAST(sum(w) AS BIGINT) AS swn,
             CAST(sum(w * w) AS BIGINT) AS sw2n
      FROM b
    )
    SELECT n, a, swa,
           round({_CA_Z}, 12) AS z_trend
    FROM m
    """,
)
def q_stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cochran-Armitage trend test: is the purchase rate monotone in
    # time-of-day? Exposure scores w = hour div 6 (0..3, the four
    # six-hour dayparts); Z = (sum w*y - p_hat * sum w)
    # / sqrt(p_hat (1-p_hat) (sum w^2 - (sum w)^2/N)). Every moment is
    # an exact integer from ONE scan (scores are tiny ints, so w*y and
    # w*w sums stay on the integer lane); Z shares formula text with
    # the oracle (sqrt -> round-12). The ORDERED-categories companion
    # to q_stat_chisq, which ignores category order. 100 TB: one
    # partial-aggregated scan, 1-row result.
    ev = table(spark, sf_dir, "events")
    w = F.expr("hour(ts) div 6").cast("bigint")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    b = ev.select(w.alias("w"), y.alias("y"))
    m = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("a"),
        F.sum(F.col("w") * F.col("y")).cast("bigint").alias("swa"),
        F.sum("w").cast("bigint").alias("swn"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sw2n"),
    )
    return m.selectExpr("n", "a", "swa", f"round({_CA_Z}, 12) AS z_trend")


@register(
    "q_mining_assoc_rules",
    oracle="""
    WITH bask AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_bask FROM bask),
    supp1 AS (SELECT part, CAST(count(*) AS BIGINT) AS s FROM bask GROUP BY 1),
    pairs AS (
      SELECT a.part AS part_a, b.part AS part_b,
             CAST(count(*) AS BIGINT) AS support
      FROM bask a JOIN bask b ON a.okey = b.okey AND a.part < b.part
      GROUP BY 1, 2
    ),
    top AS (
      SELECT * FROM pairs ORDER BY support DESC, part_a, part_b LIMIT 10
    ),
    rules AS (
      SELECT part_a AS antecedent, part_b AS consequent, support FROM top
      UNION ALL
      SELECT part_b, part_a, support FROM top
    )
    SELECT antecedent, consequent, support,
           CAST(support AS DOUBLE) / sa.s AS confidence,
           CAST(support AS DOUBLE) * n_bask / (sa.s * sc.s) AS lift,
           (CAST(support AS DOUBLE) - CAST(sa.s AS DOUBLE) * sc.s / n_bask)
             / n_bask AS leverage
    FROM rules r
    JOIN supp1 sa ON sa.part = r.antecedent
    JOIN supp1 sc ON sc.part = r.consequent
    CROSS JOIN n
    """,
)
def q_mining_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Association rules over the q_mining_copair baskets: the top-10
    # pairs by support expand to both directed rules, each scored with
    # confidence = supp(a,b)/supp(a), lift, and leverage
    # (supp - expected co-rate under independence). The pair
    # generation is the same co-partitioned basket self-join (fan-out
    # bounded by basket size, never |parts|^2); the top-10 is a
    # TakeOrderedAndProject with the unique (support desc, a, b)
    # order; per-part supports join back BROADCAST. Every score is
    # exact-integer ratio arithmetic in shared formula text — no
    # rounding (parity rule 2). 100 TB: one basket shuffle, 20-row
    # result.
    bask = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds pairs (twice) + supports + N
    )
    n = bask.agg(F.countDistinct("okey").alias("n_bask"))
    supp1 = bask.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    a = bask.select("okey", F.col("part").alias("part_a"))
    b = bask.select("okey", F.col("part").alias("part_b"))
    top = (
        a.join(b, "okey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(10)
    )
    rules = top.selectExpr(
        "part_a AS antecedent", "part_b AS consequent", "support"
    ).unionAll(
        top.selectExpr("part_b AS antecedent", "part_a AS consequent", "support")
    )
    sa = supp1.selectExpr("part AS antecedent", "s AS s_a")
    sc = supp1.selectExpr("part AS consequent", "s AS s_c")
    return (
        rules.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "support",
            (F.col("support").cast("double") / F.col("s_a")).alias("confidence"),
            (
                F.col("support").cast("double") * F.col("n_bask")
                / (F.col("s_a") * F.col("s_c"))
            ).alias("lift"),
            (
                (
                    F.col("support").cast("double")
                    - F.col("s_a").cast("double") * F.col("s_c") / F.col("n_bask")
                )
                / F.col("n_bask")
            ).alias("leverage"),
        )
    )


@register(
    "q_recsys_itemknn",
    oracle="""
    WITH bask AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    supp1 AS (SELECT part, CAST(count(*) AS BIGINT) AS s FROM bask GROUP BY 1),
    heads AS (
      SELECT part, s FROM supp1 ORDER BY s DESC, part LIMIT 20
    ),
    co AS (
      SELECT h.part AS item, b2.part AS neighbor, h.s AS s_i,
             CAST(count(*) AS BIGINT) AS co
      FROM heads h
      JOIN bask b1 ON b1.part = h.part
      JOIN bask b2 ON b2.okey = b1.okey AND b2.part <> h.part
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT item, neighbor, co,
             CAST(co AS DOUBLE) * co / (s_i * sn.s) AS cos2,
             CAST(row_number() OVER (
               PARTITION BY item
               ORDER BY CAST(co AS DOUBLE) * co / (s_i * sn.s) DESC, neighbor
             ) AS INT) AS rk
      FROM co JOIN supp1 sn ON sn.part = co.neighbor
    )
    SELECT item, neighbor, co, round(sqrt(cos2), 12) AS cosine, rk
    FROM scored WHERE rk <= 3
    """,
)
def q_recsys_itemknn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Item-item collaborative filtering: for the 20 highest-support
    # parts, the top-3 most-similar parts by co-occurrence cosine
    # cos(i,j) = co(i,j)/sqrt(s_i*s_j) over order baskets. The
    # similarity RANK key is cos^2 = co^2/(s_i*s_j) — an exact-integer
    # ratio whose single division is correctly rounded on both engines,
    # so the ordering never depends on libm sqrt; sqrt only appears in
    # the REPORTED cosine (round-12). Head-items join the basket frame
    # broadcast, co-occurrence is the co-partitioned basket self-join
    # (fan-out bounded by basket size), and the per-item top-3 is a
    # WindowGroupLimit-pruned row_number over the high-cardinality
    # item key. 100 TB: one basket shuffle + one bounded window,
    # 60-row result.
    from pyspark.sql.window import Window

    bask = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds supports + both join sides
    )
    supp1 = bask.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    supp1 = supp1.localCheckpoint(eager=False)  # feeds heads + neighbor supports
    heads = supp1.orderBy(F.col("s").desc(), "part").limit(20)
    b1 = bask.select("okey", F.col("part").alias("h_part"))
    b2 = bask.select("okey", F.col("part").alias("neighbor"))
    co = (
        heads.selectExpr("part AS h_part", "s AS s_i")
        .join(b1, "h_part")
        .join(b2, "okey")
        .where(F.col("neighbor") != F.col("h_part"))
        .groupBy(
            F.col("h_part").alias("item"), F.col("neighbor"), F.col("s_i")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    sn = supp1.selectExpr("part AS neighbor", "s AS s_n")
    cos2 = F.col("co").cast("double") * F.col("co") / (F.col("s_i") * F.col("s_n"))
    scored = (
        co.join(F.broadcast(sn), "neighbor")
        .withColumn("cos2", cos2)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("item").orderBy(
                    F.col("cos2").desc(), F.col("neighbor")
                )
            ).cast("int"),
        )
    )
    return scored.where(F.col("rk") <= 3).select(
        "item",
        "neighbor",
        "co",
        F.round(F.sqrt(F.col("cos2")), 12).alias("cosine"),
        "rk",
    )


@register(
    "q_agg_trimmed_multi_k",
    oracle="""
    WITH pv AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM pv
    ),
    t AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt) // 20 AS BIGINT) AS k5,
             CAST(sum(cnt) // 4 AS BIGINT) AS k25
      FROM pv
    ),
    s AS (
      SELECT n, k5, k25,
             CAST(sum(v * greatest(least(cum, n - k5) - greatest(cum - cnt, k5),
                                   0)) AS BIGINT) AS tsum5,
             CAST(sum(v * greatest(least(cum, n - k25) - greatest(cum - cnt, k25),
                                   0)) AS BIGINT) AS tsum25,
             CAST(sum(CASE WHEN cum - cnt <= k5 AND cum >= k5 + 1
                      THEN v ELSE 0 END) AS BIGINT) AS v_lo5,
             CAST(sum(CASE WHEN cum - cnt < n - k5 AND cum >= n - k5
                      THEN v ELSE 0 END) AS BIGINT) AS v_hi5
      FROM c CROSS JOIN t GROUP BY n, k5, k25
    )
    SELECT n, k5, k25,
           CAST(tsum5 AS DOUBLE) / CAST((n - 2 * k5) * 100 AS DOUBLE)
             AS trimmed_5,
           CAST(tsum5 + k5 * v_lo5 + k5 * v_hi5 AS DOUBLE)
             / CAST(n * 100 AS DOUBLE) AS winsor_5,
           CAST(tsum25 AS DOUBLE) / CAST((n - 2 * k25) * 100 AS DOUBLE)
             AS midmean
    FROM s
    """,
)
def q_agg_trimmed_multi_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The k-percent PARAMETERIZED generalization of q_agg_trimmed_mean
    # (roadmap_r10 #6): 5%-trimmed mean, 5%-winsorized mean, and the
    # 25% midmean from ONE prefix-sum pass — each trim level is just
    # another interval predicate over the same rank frame, so adding a
    # k costs two expressions, not a pass. Identical exact-integer
    # machinery: the cent-lane value-support contingency, one
    # distributed prefix sum for rank intervals, interval-membership
    # reads for the winsor boundary values; the three means are single
    # double divisions, NO rounding (parity rule 2). 100 TB: one hash
    # agg + one prefix sum over the value support, constant extra cost
    # per additional k.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    pv = ev.groupBy(v100.alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    t = pv.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr("sum(cnt) div 20").cast("bigint").alias("k5"),
        F.expr("sum(cnt) div 4").cast("bigint").alias("k25"),
    )
    j = c.crossJoin(F.broadcast(t))
    n, cum, cnt = F.col("n"), F.col("cum"), F.col("cnt")

    def interior(k):
        return F.greatest(
            F.least(cum, n - k) - F.greatest(cum - cnt, k), F.lit(0)
        )

    k5, k25 = F.col("k5"), F.col("k25")
    s = j.groupBy("n", "k5", "k25").agg(
        F.sum(F.col("v") * interior(k5)).cast("bigint").alias("tsum5"),
        F.sum(F.col("v") * interior(k25)).cast("bigint").alias("tsum25"),
        F.sum(
            F.when((cum - cnt <= k5) & (cum >= k5 + 1), F.col("v")).otherwise(0)
        ).cast("bigint").alias("v_lo5"),
        F.sum(
            F.when((cum - cnt < n - k5) & (cum >= n - k5), F.col("v")).otherwise(0)
        ).cast("bigint").alias("v_hi5"),
    )
    return s.select(
        "n",
        "k5",
        "k25",
        (
            F.col("tsum5").cast("double")
            / ((F.col("n") - 2 * F.col("k5")) * 100).cast("double")
        ).alias("trimmed_5"),
        (
            (F.col("tsum5") + F.col("k5") * F.col("v_lo5")
             + F.col("k5") * F.col("v_hi5")).cast("double")
            / (F.col("n") * 100).cast("double")
        ).alias("winsor_5"),
        (
            F.col("tsum25").cast("double")
            / ((F.col("n") - 2 * F.col("k25")) * 100).cast("double")
        ).alias("midmean"),
    )


_TUKEY_Q = (
    "abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)"
    " / sqrt(mse / 2 * (1.0e0 / na + 1.0e0 / nb))"
)


@register(
    "q_stat_tukey_hsd",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS q
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    p AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
             round(sum(CAST(q AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6) AS ssw
      FROM g
    ),
    m AS (SELECT nn, k, ssw / (nn - k) AS mse FROM p)
    SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS na, b.n AS nb,
           CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n AS mean_diff,
           round({_TUKEY_Q.replace('sa', 'a.s').replace('na', 'a.n')
                          .replace('sb', 'b.s').replace('nb', 'b.n')}, 12)
             AS q_stat
    FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN m
    """,
)
def q_stat_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tukey HSD pairwise comparisons after q_stat_anova's omnibus F:
    # for every unordered pair of event types, the studentized-range
    # statistic q = |m_a - m_b| / sqrt(MSE/2 * (1/n_a + 1/n_b)) with
    # MSE the pooled within-group variance. Group moments are exact
    # decimals from ONE scan; the within-group sum-of-squares fold runs
    # over |groups| terms (merge-order doubles -> round-6 on ssw, whose
    # ~1e8 magnitude needs the coarser grid; the q_eval_forecast
    # lesson), and each pair's q shares formula text (sqrt -> round-12,
    # magnitude O(10)). The pair join is group-frame x group-frame —
    # |event_type|^2 rows, config-bounded at any data scale (BNLJ
    # allowlisted with that bound). 100 TB: one partial-aggregated
    # scan, k(k-1)/2-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d).alias("s"),
        F.sum(d * d).alias("q"),
    )
    g = g.localCheckpoint(eager=False)  # feeds pooled MSE + both pair sides
    p = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.round(
            F.sum(
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
            ),
            6,
        ).alias("ssw"),
    )
    m = p.select("nn", "k", (F.col("ssw") / (F.col("nn") - F.col("k"))).alias("mse"))
    a = g.selectExpr("grp AS grp_a", "n AS na", "s AS sa")
    b = g.selectExpr("grp AS grp_b", "n AS nb", "s AS sb")
    return (
        a.join(b, F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(m))
        .selectExpr(
            "grp_a",
            "grp_b",
            "na",
            "nb",
            "CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS mean_diff",
            f"round({_TUKEY_Q}, 12) AS q_stat",
        )
    )


@register(
    "q_geo_grid_density",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST((c_custkey * 37) % 160 - 80 AS DOUBLE) + 0.5 AS lat,
             CAST((c_custkey * 73) % 360 - 180 AS DOUBLE) + 0.5 AS lon
      FROM customer
    ),
    cells AS (
      SELECT CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
             CAST(floor(lon / 10) AS BIGINT) AS cell_lon,
             CAST(count(*) AS BIGINT) AS n_pts
      FROM pts GROUP BY 1, 2
    ),
    t AS (SELECT CAST(sum(n_pts) AS BIGINT) AS total FROM cells)
    SELECT cell_lat, cell_lon, n_pts,
           CAST(n_pts AS DOUBLE) / total AS share
    FROM cells CROSS JOIN t
    """,
)
def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spatial grid aggregation (the geohash-rollup shape): customer
    # points binned to 10-degree x 10-degree cells, per-cell count and
    # global share — the density heat-map every geo pipeline computes
    # before any pairwise work, and the missing AGGREGATION member of
    # the geo family (knn/nearest/radius are all join-shaped). Cell ids
    # floor exact lattice coordinates (the synthetic grid's +0.5 keeps
    # every point strictly inside a cell, so floor never sits on an
    # engine-rounding boundary); counts are exact, share is one double
    # division. 100 TB: one partial-aggregated scan; the cell frame is
    # bounded by the grid (16 x 36 cells), not the data.
    pts = table(spark, sf_dir, "customer").select(
        (((F.col("c_custkey") * 37) % 160 - 80).cast("double") + 0.5).alias("lat"),
        (((F.col("c_custkey") * 73) % 360 - 180).cast("double") + 0.5).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 10).cast("bigint").alias("cell_lat"),
        F.floor(F.col("lon") / 10).cast("bigint").alias("cell_lon"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pts"))
    t = cells.agg(F.sum("n_pts").cast("bigint").alias("total"))
    return cells.crossJoin(F.broadcast(t)).select(
        "cell_lat",
        "cell_lon",
        "n_pts",
        (F.col("n_pts").cast("double") / F.col("total")).alias("share"),
    )


_PERM_U_SQL = (
    "list_reduce(list_transform("
    "string_split_regex(substr(md5(concat(CAST(event_id AS VARCHAR), ':', "
    "CAST(b AS VARCHAR))), 1, 15), ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
    "(a, b2) -> a * 16 + b2)"
)


@register(
    "q_stat_permutation_test",
    oracle=f"""
    WITH x AS (
      SELECT event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    obs AS (
      SELECT CAST(sum(v * grp) AS DOUBLE) / (100 * sum(grp))
             - CAST(sum(v * (1 - grp)) AS DOUBLE) / (100 * sum(1 - grp))
               AS obs_diff
      FROM x
    ),
    reps AS (
      SELECT v, b, CAST({_PERM_U_SQL} % 2 AS BIGINT) AS pg
      FROM x CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS b)
    ),
    per AS (
      SELECT b,
             CAST(sum(v * pg) AS DOUBLE) / (100 * sum(pg))
             - CAST(sum(v * (1 - pg)) AS DOUBLE) / (100 * sum(1 - pg))
               AS d
      FROM reps GROUP BY b
    )
    SELECT CAST(count(*) AS BIGINT) AS b_reps,
           obs.obs_diff,
           CAST(sum(CASE WHEN abs(per.d) >= abs(obs.obs_diff)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
           (1.0e0 + sum(CASE WHEN abs(per.d) >= abs(obs.obs_diff)
                        THEN 1 ELSE 0 END)) / (count(*) + 1.0e0) AS p_value
    FROM per CROSS JOIN obs GROUP BY obs.obs_diff
    """,
)
def q_stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic-hash permutation test for the purchase-vs-click
    # mean difference — the EXACT-null companion to q_stat_ttest (no
    # normality assumption) using q_stat_bootstrap_ci's RNG-free
    # resampling: permutation b relabels each row by the parity of the
    # 60-bit md5(event_id:b) fold, so both engines generate IDENTICAL
    # label assignments. Every per-permutation mean difference is an
    # exact cent-lane moment division (deterministic doubles — the
    # |d| >= |obs| comparisons cannot straddle an ulp), and the
    # add-one p-value is exact integer arithmetic over B=64 replicas.
    # NO rounding anywhere. 100 TB: the replica dimension is map-side
    # (explode ×B then a 64-group partial agg) — same single-scan shape
    # as the bootstrap.
    ev = (
        table(spark, sf_dir, "events")
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
    )
    x = ev.select(
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
    )
    x = x.localCheckpoint(eager=False)  # feeds observed diff + replicas
    g = F.col("grp")
    obs = x.agg(
        (
            F.sum(F.col("v") * g).cast("double") / (100 * F.sum(g))
            - F.sum(F.col("v") * (1 - g)).cast("double") / (100 * F.sum(1 - g))
        ).alias("obs_diff")
    )
    reps = x.select(
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("b"),
        "event_id",
    ).select(
        "v",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"),
                            F.lit(":"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("pg"),
    )
    pg = F.col("pg")
    per = reps.groupBy("b").agg(
        (
            F.sum(F.col("v") * pg).cast("double") / (100 * F.sum(pg))
            - F.sum(F.col("v") * (1 - pg)).cast("double") / (100 * F.sum(1 - pg))
        ).alias("d")
    )
    ge = F.when(F.abs(F.col("d")) >= F.abs(F.col("obs_diff")), 1).otherwise(0)
    return (
        per.crossJoin(F.broadcast(obs))
        .groupBy("obs_diff")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("b_reps"),
            F.sum(ge).cast("bigint").alias("n_ge"),
            ((1.0 + F.sum(ge)) / (F.count(F.lit(1)) + 1.0)).alias("p_value"),
        )
        .select("b_reps", "obs_diff", "n_ge", "p_value")
    )


_LRF_SSE = "(syy - ({d0}) / ({det}) * sy - ({d1}) / ({det}) * s1y - ({d2}) / ({det}) * s2y)".format(
    d0=_LR3_DET0, d1=_LR3_DET1, d2=_LR3_DET2, det=_LR3_DET
)
_LRF_SST = "(syy - sy * sy / n)"


@register(
    "q_ml_linreg_fit_stats",
    oracle=f"""
    WITH s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS s1,
             CAST(sum(x2) AS DOUBLE) AS s2,
             CAST(sum(x1 * x1) AS DOUBLE) AS s11,
             CAST(sum(x2 * x2) AS DOUBLE) AS s22,
             CAST(sum(x1 * x2) AS DOUBLE) AS s12,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x1 * y) AS DOUBLE) AS s1y,
             CAST(sum(x2 * y) AS DOUBLE) AS s2y,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM (
        SELECT CAST(hour(ts) AS BIGINT) AS x1,
               CAST(dayofweek(ts) AS BIGINT) AS x2,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
      )
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           1.0e0 - {_LRF_SSE} / {_LRF_SST} AS r2,
           1.0e0 - ({_LRF_SSE} / {_LRF_SST}) * (n - 1) / (n - 3) AS adj_r2,
           (({_LRF_SST}) - ({_LRF_SSE})) / 2 / (({_LRF_SSE}) / (n - 3)) AS f_stat
    FROM s
    """,
)
def q_ml_linreg_fit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Goodness-of-fit for q_ml_linreg_multi's normal-equations model
    # (value ~ hour + day-of-week): R^2, adjusted R^2, and the omnibus
    # F statistic — the is-this-model-any-good readout the coefficient
    # key deliberately omits. Everything derives from the SAME one-scan
    # exact moment sums plus syy: SSE = syy - b.(X'y) expands to pure
    # formula text over the Cramer determinants, so every output is a
    # deterministic double with NO rounding (no libm anywhere; parity
    # rule 2). Spark dayofweek is 1..7 Sunday-first; DuckDB 0..6 — the
    # Spark side subtracts 1 (the q_ml_linreg_multi convention).
    # 100 TB: one partial-aggregated scan, 1-row result.
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("bigint").alias("x1"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("x2"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    s = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_rows",
        f"1.0e0 - {_LRF_SSE} / {_LRF_SST} AS r2",
        f"1.0e0 - ({_LRF_SSE} / {_LRF_SST}) * (n - 1) / (n - 3) AS adj_r2",
        f"(({_LRF_SST}) - ({_LRF_SSE})) / 2 / (({_LRF_SSE}) / (n - 3)) AS f_stat",
    )


@register(
    "q_ts_durbin_watson",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS st,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(t * t) AS BIGINT) AS stt,
             CAST(sum(t * y) AS BIGINT) AS sty
      FROM d
    ),
    fit AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b,
             (CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) * st)
               / n AS a
      FROM m
    ),
    e AS (
      SELECT d.t, d.y - fit.a - fit.b * d.t AS e, fit.n, fit.b
      FROM d CROSS JOIN fit
    ),
    j AS (
      SELECT cur.e AS e1, prv.e AS e0, cur.n, cur.b
      FROM e cur LEFT JOIN e prv ON prv.t = cur.t - 1
    )
    SELECT max(n) AS n_days, max(b) AS slope,
           round(sum(CASE WHEN e0 IS NOT NULL
                          THEN (e1 - e0) * (e1 - e0) ELSE 0 END)
                 / sum(e1 * e1), 9) AS dw
    FROM j
    """,
)
def q_ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Durbin-Watson first-order autocorrelation test on the residuals
    # of the daily-count linear trend: DW = sum (e_t - e_{t-1})^2 /
    # sum e_t^2 (≈2 independent, <2 positively autocorrelated) — the
    # residual-diagnostics companion to q_ts_ljung_box (which tests the
    # raw series). The OLS line comes from exact integer moments
    # (closed form, deterministic doubles); residuals are fixed formula
    # text; the two quadratic folds run over calendar-many terms →
    # round-9 (the q_ts_hurst grid). The lag join is day-spine
    # self-join on t-1, calendar-bounded. 100 TB: one fact-table
    # groupBy to daily counts, everything after is spine-sized.
    ev = table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("t")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=False)  # feeds moments + both lag sides
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
    )
    bexpr = (
        "(CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)"
        " / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)"
    )
    fit = m.selectExpr(
        "n",
        f"{bexpr} AS b",
        f"(CAST(sy AS DOUBLE) - {bexpr} * st) / n AS a",
    )
    e = d.crossJoin(F.broadcast(fit)).select(
        "t",
        (F.col("y") - F.col("a") - F.col("b") * F.col("t")).alias("e"),
        "n",
        "b",
    )
    cur = e.select(
        F.col("t"), F.col("e").alias("e1"), "n", "b"
    )
    prv = e.select((F.col("t") + 1).alias("t"), F.col("e").alias("e0"))
    j = cur.join(prv, "t", "left")
    return j.agg(
        F.max("n").alias("n_days"),
        F.max("b").alias("slope"),
        F.round(
            F.sum(
                F.when(
                    F.col("e0").isNotNull(),
                    (F.col("e1") - F.col("e0")) * (F.col("e1") - F.col("e0")),
                ).otherwise(0.0)
            )
            / F.sum(F.col("e1") * F.col("e1")),
            9,
        ).alias("dw"),
    )


_PC_R = (
    "(n * s{a}{b} - s{a} * s{b})"
    " / sqrt((n * s{a}{a} - s{a} * s{a}) * (n * s{b}{b} - s{b} * s{b}))"
)
_PC_RXY = _PC_R.format(a="x", b="y")
_PC_RXZ = _PC_R.format(a="x", b="z")
_PC_RYZ = _PC_R.format(a="y", b="z")
_PC_PARTIAL = (
    f"(({_PC_RXY}) - ({_PC_RXZ}) * ({_PC_RYZ}))"
    f" / sqrt((1 - ({_PC_RXZ}) * ({_PC_RXZ})) * (1 - ({_PC_RYZ}) * ({_PC_RYZ})))"
)


@register(
    "q_stat_partial_corr",
    oracle=f"""
    WITH b AS (
      SELECT CAST(value AS DECIMAL(18,2)) AS x,
             CAST(hour(ts) AS BIGINT) AS y,
             CAST(dayofweek(ts) AS BIGINT) AS z
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(z) AS DOUBLE) AS sz,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(z * z) AS DOUBLE) AS szz,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * z) AS DOUBLE) AS sxz,
             CAST(sum(y * z) AS DOUBLE) AS syz
      FROM b
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round({_PC_RXY}, 12) AS r_xy,
           round({_PC_PARTIAL}, 12) AS r_xy_given_z
    FROM m
    """,
)
def q_stat_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # First-order partial correlation: corr(value, hour) CONTROLLING
    # for day-of-week — r_xy.z = (r_xy - r_xz r_yz)/sqrt((1-r_xz²)
    # (1-r_yz²)), the does-the-association-survive-the-confounder
    # readout q_agg_corr can't give. All three pairwise r's come from
    # ONE exact-moment scan (decimal target, integer features) and the
    # whole expression is shared formula text (sqrt -> round-12).
    # Spark dayofweek is 1..7, DuckDB 0..6: the Spark side subtracts 1
    # so the z MOMENTS feeding the shared formula are bit-identical
    # (the q_ml_linreg_multi convention — r is shift-invariant
    # mathematically, but the intermediate doubles are not). 100 TB:
    # one partial-aggregated scan, 1-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.select(
        F.col("value").cast("decimal(18,2)").alias("x"),
        F.hour("ts").cast("bigint").alias("y"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("z"),
    )
    m = b.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("double").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("double").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("double").alias("syz"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_rows",
        f"round({_PC_RXY}, 12) AS r_xy",
        f"round({_PC_PARTIAL}, 12) AS r_xy_given_z",
    )


@register(
    "q_stat_cronbach_alpha",
    oracle="""
    WITH peru AS (
      SELECT user_id,
             CAST(count(*) FILTER (WHERE hour(ts) < 6) AS BIGINT) AS i1,
             CAST(count(*) FILTER (WHERE hour(ts) >= 6 AND hour(ts) < 12) AS BIGINT) AS i2,
             CAST(count(*) FILTER (WHERE hour(ts) >= 12 AND hour(ts) < 18) AS BIGINT) AS i3,
             CAST(count(*) FILTER (WHERE hour(ts) >= 18) AS BIGINT) AS i4
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(i1) AS BIGINT) AS s1, CAST(sum(i1 * i1) AS BIGINT) AS q1,
             CAST(sum(i2) AS BIGINT) AS s2, CAST(sum(i2 * i2) AS BIGINT) AS q2,
             CAST(sum(i3) AS BIGINT) AS s3, CAST(sum(i3 * i3) AS BIGINT) AS q3,
             CAST(sum(i4) AS BIGINT) AS s4, CAST(sum(i4 * i4) AS BIGINT) AS q4,
             CAST(sum(i1 + i2 + i3 + i4) AS BIGINT) AS st,
             CAST(sum((i1 + i2 + i3 + i4) * (i1 + i2 + i3 + i4)) AS BIGINT) AS qt
      FROM peru
    )
    SELECT n,
           (4.0e0 / 3.0e0) * (1.0e0 -
             ((q1 - CAST(s1 AS DOUBLE) * s1 / n)
              + (q2 - CAST(s2 AS DOUBLE) * s2 / n)
              + (q3 - CAST(s3 AS DOUBLE) * s3 / n)
              + (q4 - CAST(s4 AS DOUBLE) * s4 / n))
             / (qt - CAST(st AS DOUBLE) * st / n)) AS alpha
    FROM m
    """,
)
def q_stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cronbach's alpha internal-consistency coefficient treating each
    # user's four daypart activity counts as k=4 "items": alpha =
    # k/(k-1) * (1 - sum item variances / variance of item totals) —
    # the do-these-features-measure-one-construct readout behind every
    # engagement-score design. One user-keyed conditional-count
    # aggregate, then one moment scan; all sums exact integers, every
    # variance the closed form over them, and the 4-item fold is FIXED
    # formula text (addition order in the expression) -> deterministic
    # doubles, NO rounding (parity rule 2). 100 TB: two partial-agg
    # passes (user cells, then moments), 1-row result.
    ev = table(spark, sf_dir, "events")
    h = F.hour("ts")
    cell = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    peru = ev.groupBy("user_id").agg(
        cell(h < 6).alias("i1"),
        cell((h >= 6) & (h < 12)).alias("i2"),
        cell((h >= 12) & (h < 18)).alias("i3"),
        cell(h >= 18).alias("i4"),
    )
    tot = F.col("i1") + F.col("i2") + F.col("i3") + F.col("i4")
    m = peru.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            agg
            for i in (1, 2, 3, 4)
            for agg in (
                F.sum(f"i{i}").cast("bigint").alias(f"s{i}"),
                F.sum(F.col(f"i{i}") * F.col(f"i{i}")).cast("bigint").alias(f"q{i}"),
            )
        ],
        F.sum(tot).cast("bigint").alias("st"),
        F.sum(tot * tot).cast("bigint").alias("qt"),
    )
    return m.selectExpr(
        "n",
        "(4.0e0 / 3.0e0) * (1.0e0 - "
        "((q1 - CAST(s1 AS DOUBLE) * s1 / n) "
        "+ (q2 - CAST(s2 AS DOUBLE) * s2 / n) "
        "+ (q3 - CAST(s3 AS DOUBLE) * s3 / n) "
        "+ (q4 - CAST(s4 AS DOUBLE) * s4 / n)) "
        "/ (qt - CAST(st AS DOUBLE) * st / n)) AS alpha",
    )


@register(
    "q_ml_mutual_info",
    oracle="""
    WITH b AS (
      SELECT event_type AS f,
             least(CAST(floor(CAST(value AS DECIMAL(18,2))) AS BIGINT) // 50, 5) AS v
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT f, v, CAST(count(*) AS DOUBLE) AS c FROM b GROUP BY 1, 2
    ),
    mf AS (SELECT f, sum(c) AS cf FROM cells GROUP BY 1),
    mv AS (SELECT v, sum(c) AS cv FROM cells GROUP BY 1),
    t AS (SELECT sum(c) AS n FROM cells)
    SELECT CAST(t.n AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((c / t.n) * ln((c * t.n) / (cf * cv))), 12) AS mi_nats
    FROM cells JOIN mf USING (f) JOIN mv USING (v) CROSS JOIN t
    GROUP BY t.n
    """,
)
def q_ml_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mutual information I(event_type; value-bucket) in nats — the
    # feature-selection score (how much does knowing the type tell you
    # about the value band?) that chi-square's significance can't
    # rank by. Buckets are exact integer halves-of-hundred (floor of
    # the truncated decimal, capped at 5 -> at most 6 x |types| cells);
    # cell/margin counts are exact, and the sum p*ln(p/(pq)) folds over
    # the BOUNDED cell frame (q_agg_entropy shape: libm ln + tiny
    # merge-order fold -> round-12). 100 TB: one partial-aggregated
    # scan to the cell contingency; margins re-aggregate the cells.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.select(
        F.col("event_type").alias("f"),
        F.least(
            F.expr("CAST(floor(CAST(value AS DECIMAL(18,2))) AS BIGINT) div 50"),
            F.lit(5).cast("bigint"),
        ).alias("v"),
    )
    cells = b.groupBy("f", "v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    cells = cells.localCheckpoint(eager=False)  # feeds margins + total + MI
    mf = cells.groupBy("f").agg(F.sum("c").alias("cf"))
    mv = cells.groupBy("v").agg(F.sum("c").alias("cv"))
    t = cells.agg(F.sum("c").alias("n"))
    return (
        cells.join(F.broadcast(mf), "f")
        .join(F.broadcast(mv), "v")
        .crossJoin(F.broadcast(t))
        .groupBy(F.col("n"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.round(
                F.sum(
                    (F.col("c") / F.col("n"))
                    * F.log((F.col("c") * F.col("n")) / (F.col("cf") * F.col("cv")))
                ),
                12,
            ).alias("mi_nats"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_rows"), "n_cells", "mi_nats"
        )
    )


@register(
    "q_ml_pr_curve",
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    th AS (SELECT unnest(generate_series(1, 9)) * 2000 AS thr),
    pts AS (
      SELECT thr,
             CAST(count(*) FILTER (WHERE s >= thr AND y = 1) AS BIGINT) AS tp,
             CAST(count(*) FILTER (WHERE s >= thr AND y = 0) AS BIGINT) AS fp,
             CAST(count(*) FILTER (WHERE y = 1) AS BIGINT) AS pos
      FROM x CROSS JOIN th GROUP BY thr
    )
    SELECT thr, tp, fp,
           CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
           CAST(tp AS DOUBLE) / pos AS recall_
    FROM pts WHERE tp + fp > 0
    """,
)
def q_ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Precision-recall curve at nine fixed score thresholds (value >=
    # 20, 40, ... 180 predicting purchase) — the operating-point table
    # q_ml_auc's single scalar summarizes away, and the right curve for
    # the rare-positive regimes LLM-data filters live in. Thresholds
    # are exact cent-lane integers; the threshold dimension rides ONE
    # map-side explode (like the bootstrap's replica dimension), so the
    # scan stays single-pass with a 9-group partial agg; precision and
    # recall are exact-integer divisions — NO rounding. 100 TB: one
    # scan, 9-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    pts = (
        x.select(
            "s", "y", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("k")
        )
        .select("s", "y", (F.col("k") * 2000).alias("thr"))
        .groupBy("thr")
        .agg(
            F.sum(F.when((F.col("s") >= F.col("thr")) & (F.col("y") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when((F.col("s") >= F.col("thr")) & (F.col("y") == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("bigint").alias("pos"),
        )
    )
    return pts.where(F.col("tp") + F.col("fp") > 0).select(
        "thr",
        "tp",
        "fp",
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias("precision_"),
        (F.col("tp").cast("double") / F.col("pos")).alias("recall_"),
    )


@register(
    "q_stat_qq_deciles",
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    pv AS (
      SELECT is_a, v, CAST(count(*) AS BIGINT) AS cnt
      FROM x GROUP BY 1, 2
    ),
    c AS (
      SELECT is_a, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY is_a ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pv
    ),
    t AS (
      SELECT is_a, CAST(sum(cnt) AS BIGINT) AS n FROM pv GROUP BY 1
    ),
    q AS (SELECT unnest(generate_series(1, 9)) AS d),
    sel AS (
      SELECT q.d, c.is_a,
             max(CASE WHEN c.cum - c.cnt < (q.d * t.n + 9) // 10
                      AND c.cum >= (q.d * t.n + 9) // 10
                 THEN c.v END) AS qv
      FROM c JOIN t USING (is_a) CROSS JOIN q
      GROUP BY 1, 2
    )
    SELECT d,
           CAST(max(CASE WHEN is_a = 1 THEN qv END) AS DOUBLE) / 100 AS q_purchase,
           CAST(max(CASE WHEN is_a = 0 THEN qv END) AS DOUBLE) / 100 AS q_click
    FROM sel GROUP BY d
    """,
)
def q_stat_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-sample Q-Q table: the nine decile order statistics of the
    # purchase and click value distributions side by side — the
    # where-do-the-distributions-diverge readout behind every Q-Q plot,
    # complementing q_stat_ks's single worst-point max. Each decile is
    # an EXACT order statistic (rank ceil(d*n/10) selected via the
    # per-arm value-support prefix sum and interval membership — the
    # trimmed-mean machinery; no percentile interpolation crosses
    # engines). Cent-lane values, exact ranks, one double division per
    # cell at the end. 100 TB: one contingency aggregate per arm + one
    # prefix sum over the value support; the decile dimension is a
    # 9-row broadcast.
    from trembita_spark.operators.ranking import prefix_sum

    ev = (
        table(spark, sf_dir, "events")
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
    )
    x = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
    )
    pv = x.groupBy("is_a", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    # per-arm prefix sum: order by (is_a, v) and subtract the other
    # arm's total would break per-arm cum; instead run prefix_sum per
    # arm via the partitioned window equivalent — the arm key bounds
    # partitions at 2, but the INPUT is the value-support contingency
    # (aggregate-sized), the same exemption as the chi-sq family.
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("is_a")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = pv.withColumn("cum", F.sum("cnt").over(w).cast("bigint"))
    t = pv.groupBy("is_a").agg(F.sum("cnt").cast("bigint").alias("n"))
    q = spark.range(1, 10).select(F.col("id").alias("d"))
    r = F.expr("(d * n + 9) div 10")
    sel = (
        c.join(F.broadcast(t), "is_a")
        .crossJoin(F.broadcast(q))
        .groupBy("d", "is_a")
        .agg(
            F.max(
                F.when(
                    (F.col("cum") - F.col("cnt") < r) & (F.col("cum") >= r),
                    F.col("v"),
                )
            ).alias("qv")
        )
    )
    return sel.groupBy("d").agg(
        (
            F.max(F.when(F.col("is_a") == 1, F.col("qv"))).cast("double") / 100
        ).alias("q_purchase"),
        (
            F.max(F.when(F.col("is_a") == 0, F.col("qv"))).cast("double") / 100
        ).alias("q_click"),
    )


@register(
    "q_stat_ancova",
    oracle="""
    WITH b AS (
      SELECT event_type AS grp,
             CAST(hour(ts) AS BIGINT) AS x,
             CAST(value AS DECIMAL(18,2)) AS y
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             sum(y) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             sum(x * y) AS sxy
      FROM b GROUP BY 1
    ),
    p AS (
      SELECT round(sum(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n), 6) AS wxy,
             round(sum(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n), 6) AS wxx,
             CAST(sum(sx) AS BIGINT) AS tx,
             CAST(sum(n) AS BIGINT) AS tn
      FROM g
    ),
    bw AS (SELECT wxy / wxx AS b_w, CAST(tx AS DOUBLE) / tn AS xbar FROM p)
    SELECT g.grp, g.n,
           CAST(g.sy AS DOUBLE) / g.n AS raw_mean,
           round(CAST(g.sy AS DOUBLE) / g.n
                 - bw.b_w * (CAST(g.sx AS DOUBLE) / g.n - bw.xbar), 9)
             AS adjusted_mean
    FROM g CROSS JOIN bw
    """,
)
def q_stat_ancova(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ANCOVA adjusted group means: each event type's mean value after
    # removing the hour-of-day covariate — adj_mean_g = ybar_g -
    # b_w (xbar_g - xbar), with b_w the pooled WITHIN-group slope
    # (sum_g Sxy_g / sum_g Sxx_g). The would-the-groups-still-differ-
    # at-the-same-hour question a raw group-mean comparison conflates.
    # Group moments are exact (integer covariate, decimal target) from
    # ONE scan; the pooled within-group sums fold over |groups| doubles
    # -> round-6 (their ~1e7 magnitude, the q_stat_tukey_hsd grid);
    # adjusted means re-derive from exact per-group moments and the
    # shared b_w -> round-9. 100 TB: one partial-aggregated scan,
    # |groups|-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.select(
        F.col("event_type").alias("grp"),
        F.hour("ts").cast("bigint").alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    g = b.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    g = g.localCheckpoint(eager=False)  # feeds pooled slope + output rows
    p = g.agg(
        F.round(
            F.sum(
                F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double") / F.col("n")
            ),
            6,
        ).alias("wxy"),
        F.round(
            F.sum(
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx") / F.col("n")
            ),
            6,
        ).alias("wxx"),
        F.sum("sx").cast("bigint").alias("tx"),
        F.sum("n").cast("bigint").alias("tn"),
    )
    bw = p.select(
        (F.col("wxy") / F.col("wxx")).alias("b_w"),
        (F.col("tx").cast("double") / F.col("tn")).alias("xbar"),
    )
    return g.crossJoin(F.broadcast(bw)).select(
        "grp",
        "n",
        (F.col("sy").cast("double") / F.col("n")).alias("raw_mean"),
        F.round(
            F.col("sy").cast("double") / F.col("n")
            - F.col("b_w")
            * (F.col("sx").cast("double") / F.col("n") - F.col("xbar")),
            9,
        ).alias("adjusted_mean"),
    )


@register(
    "q_stat_sign_test",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             sum(CAST(value AS DECIMAL(18,2))) AS rev
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.rev AS cur, b.rev AS prev
      FROM d a JOIN d b
        ON b.event_type = a.event_type AND b.day = a.day - 7
    ),
    s AS (
      SELECT CAST(count(*) FILTER (WHERE cur <> prev) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE cur > prev) AS BIGINT) AS n_pos
      FROM j
    )
    SELECT n, n_pos,
           round((n_pos - CAST(n AS DOUBLE) / 2) / sqrt(CAST(n AS DOUBLE) / 4),
                 12) AS z
    FROM s
    """,
)
def q_stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Paired sign test for week-over-week revenue movement: each
    # (type, day) cell pairs with its value 7 days earlier; under H0
    # increases and decreases are equally likely, so z = (n_pos - n/2)
    # / sqrt(n/4) over the non-tied pairs. The assumption-free paired
    # companion to q_stat_wilcoxon (which needs magnitudes) — signs
    # compare EXACT decimals, counts are exact integers from one
    # calendar-bounded self-join, z shares formula text (sqrt ->
    # round-12). 100 TB: one fact-table groupBy to (type, day); the
    # lag join is spine-sized.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = (
        ev.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("day"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
        .localCheckpoint(eager=False)  # feeds both lag sides
    )
    prev = d.select(
        "event_type", (F.col("day") + 7).alias("day"), F.col("rev").alias("prev")
    )
    j = d.join(prev, ["event_type", "day"]).select(
        F.col("rev").alias("cur"), "prev"
    )
    s = j.agg(
        F.sum(F.when(F.col("cur") != F.col("prev"), 1).otherwise(0))
        .cast("bigint")
        .alias("n"),
        F.sum(F.when(F.col("cur") > F.col("prev"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    return s.selectExpr(
        "n",
        "n_pos",
        "round((n_pos - CAST(n AS DOUBLE) / 2) / sqrt(CAST(n AS DOUBLE) / 4), 12) AS z",
    )


@register(
    "q_ml_target_encoding",
    oracle="""
    WITH g AS (
      SELECT event_type AS cat,
             CAST(count(*) AS BIGINT) AS n_c,
             sum(CAST(value AS DECIMAL(18,2))) AS s_c
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(n_c) AS BIGINT) AS n, sum(s_c) AS s FROM g
    )
    SELECT cat, n_c,
           CAST(s_c AS DOUBLE) / n_c AS raw_mean,
           (CAST(s_c AS DOUBLE) + 20 * (CAST(s AS DOUBLE) / n))
             / (n_c + 20) AS encoded
    FROM g CROSS JOIN t
    """,
)
def q_ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Smoothed (m-estimate, m=20) target encoding of event_type against
    # value — the leakage-resistant categorical feature every tabular
    # pipeline computes: encoded = (sum_c + m*global_mean)/(n_c + m),
    # shrinking rare categories toward the prior. One exact-moment
    # scan; global mean re-aggregates the category frame; both outputs
    # are pure exact-division formula text — NO rounding (parity rule
    # 2). 100 TB: one partial-aggregated scan, |categories|-row result
    # broadcast back to whatever training join needs it.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    g = ev.groupBy(F.col("event_type").alias("cat")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s_c"),
    )
    g = g.localCheckpoint(eager=False)  # feeds the prior + output rows
    t = g.agg(
        F.sum("n_c").cast("bigint").alias("n"), F.sum("s_c").alias("s")
    )
    return g.crossJoin(F.broadcast(t)).select(
        "cat",
        "n_c",
        (F.col("s_c").cast("double") / F.col("n_c")).alias("raw_mean"),
        (
            (F.col("s_c").cast("double") + 20 * (F.col("s").cast("double") / F.col("n")))
            / (F.col("n_c") + 20)
        ).alias("encoded"),
    )


@register(
    "q_agg_geometric_mean",
    oracle="""
    WITH pv AS (
      SELECT event_type AS grp,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND value > 0
      GROUP BY 1, 2
    ),
    t AS (
      SELECT grp, CAST(sum(c) AS BIGINT) AS n,
             round(sum(c * ln(CAST(v AS DOUBLE) / 100)), 6) AS slog
      FROM pv GROUP BY grp
    )
    SELECT grp, n, round(exp(slog / n), 9) AS geo_mean
    FROM t
    """,
)
def q_agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Geometric mean of value per event type — the right average for
    # multiplicative quantities (growth factors, latencies), missing
    # from the q_agg_basic/rms/mode family. exp(mean(ln x)) folds ln
    # over the VALUE-SUPPORT contingency (cent-lane groupBy first, so
    # the libm fold runs over the bounded distinct-value frame, not the
    # data — the q_agg_entropy shape); the support is data-bounded but
    # its ~49k-level ceiling outgrows round-12 → round-6 on the ln
    # rollup, round-9 on the exp (the q_ts_hurst grids). 100 TB: one
    # partial-aggregated scan to the contingency, |groups| rows out.
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    pv = ev.groupBy(
        F.col("event_type").alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    t = pv.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("c") * F.log(F.col("v").cast("double") / 100)), 6
        ).alias("slog"),
    )
    return t.select(
        "grp", "n", F.round(F.exp(F.col("slog") / F.col("n")), 9).alias("geo_mean")
    )


@register(
    "q_ml_woe_iv",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor(CAST(value AS DECIMAL(18,2))) AS BIGINT) // 50, 5) AS band,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT band, CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(1 - y) AS BIGINT) AS neg
      FROM b GROUP BY band
    ),
    t AS (
      SELECT CAST(sum(pos) AS BIGINT) AS tp, CAST(sum(neg) AS BIGINT) AS tn
      FROM g
    ),
    w AS (
      SELECT band, pos, neg,
             round(ln((CAST(pos AS DOUBLE) / tp) / (CAST(neg AS DOUBLE) / tn)),
                   12) AS woe,
             (CAST(pos AS DOUBLE) / tp - CAST(neg AS DOUBLE) / tn)
               * ln((CAST(pos AS DOUBLE) / tp) / (CAST(neg AS DOUBLE) / tn)) AS ivc
      FROM g CROSS JOIN t
    ),
    iv AS (SELECT round(sum(ivc), 12) AS iv FROM w)
    SELECT band, pos, neg, woe, iv
    FROM w CROSS JOIN iv
    """,
)
def q_ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weight-of-evidence binning + information value for the value-band
    # feature against purchase — the credit-scoring/feature-screening
    # standard (IV < 0.02 useless, > 0.3 strong). Bands reuse
    # q_ml_mutual_info's explicit-floor lanes (≤6 cells); WoE =
    # ln(band pos-share / band neg-share) shares formula text (libm ln
    # → round-12), and IV folds ≤6 deterministic contribution terms
    # (round-12, entropy shape). 100 TB: one partial-aggregated scan
    # to the band cells.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.select(
        F.least(
            F.expr("CAST(floor(CAST(value AS DECIMAL(18,2))) AS BIGINT) div 50"),
            F.lit(5).cast("bigint"),
        ).alias("band"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = b.groupBy("band").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
    )
    g = g.localCheckpoint(eager=False)  # feeds totals + WoE rows
    t = g.agg(
        F.sum("pos").cast("bigint").alias("tp"),
        F.sum("neg").cast("bigint").alias("tn"),
    )
    ps = F.col("pos").cast("double") / F.col("tp")
    ns = F.col("neg").cast("double") / F.col("tn")
    w = g.crossJoin(F.broadcast(t)).select(
        "band",
        "pos",
        "neg",
        F.round(F.log(ps / ns), 12).alias("woe"),
        ((ps - ns) * F.log(ps / ns)).alias("ivc"),
    )
    w = w.localCheckpoint(eager=False)  # feeds IV + output rows
    iv = w.agg(F.round(F.sum("ivc"), 12).alias("iv"))
    return w.select("band", "pos", "neg", "woe").crossJoin(F.broadcast(iv))


@register(
    "q_eval_ece",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor(CAST(value AS DECIMAL(18,2)) / 10) AS BIGINT), 9) AS bin,
             CAST(value AS DECIMAL(18,2)) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT bin,
             CAST(count(*) AS BIGINT) AS n_bin,
             sum(least(v, 100.00)) AS sconf,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM b GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n_bin) AS BIGINT) AS n FROM g)
    SELECT max(t.n) AS n,
           CAST(count(*) AS BIGINT) AS n_bins,
           round(sum((CAST(n_bin AS DOUBLE) / t.n)
                 * abs(CAST(n_pos AS DOUBLE) / n_bin
                       - CAST(sconf AS DOUBLE) / (100 * n_bin))), 12) AS ece
    FROM g CROSS JOIN t
    """,
)
def q_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Expected calibration error — the scalar q_eval_calibration's
    # reliability table plots: ECE = Σ_bins (n_bin/n)·|acc − conf|
    # over the same 10 score bins (p̂ = min(v,100)/100 vs purchase).
    # Per-bin acc/conf are exact-moment divisions (decimal Σp̂, integer
    # counts); the 10-term weighted fold merges in partial-agg order →
    # round-12 (entropy shape, no libm). 100 TB: one partial-aggregated
    # scan to the 10-bin frame, 1-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = F.col("value").cast("decimal(18,2)")
    b = ev.select(
        F.least(F.floor(v / 10).cast("bigint"), F.lit(9)).alias("bin"),
        v.alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bin"),
        F.sum(F.least(F.col("v"), F.lit(100).cast("decimal(18,2)"))).alias("sconf"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    g = g.localCheckpoint(eager=False)  # feeds total + the fold
    t = g.agg(F.sum("n_bin").cast("bigint").alias("n"))
    return (
        g.crossJoin(F.broadcast(t))
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.round(
                F.sum(
                    (F.col("n_bin").cast("double") / F.col("n"))
                    * F.abs(
                        F.col("n_pos").cast("double") / F.col("n_bin")
                        - F.col("sconf").cast("double") / (100 * F.col("n_bin"))
                    )
                ),
                12,
            ).alias("ece"),
        )
    )


# Abramowitz-Stegun 7.1.26 erf approximation (|err| <= 1.5e-7), staged
# as column text so BOTH engines run the identical op sequence: the
# z-family keys stop at statistics because neither engine exposes erf
# portably — this fragment unlocks calibrated p-values as checked
# outputs (round-6: far above the ~1e-16 exp/ulp skew AND honest about
# the 1.5e-7 approximation floor).
_ERF_T = "1.0e0 / (1.0e0 + 0.3275911e0 * xh)"
_ERF_POLY = (
    "((((1.061405429e0 * th - 1.453152027e0) * th + 1.421413741e0) * th"
    " - 0.284496736e0) * th + 0.254829592e0) * th"
)
_P_TWO_SIDED = f"({_ERF_POLY.replace('th', f'({_ERF_T})')}) * exp(-xh * xh)"


@register(
    "q_stat_bh_fdr",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE value >= 50) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(x) AS BIGINT) AS tx,
             CAST(count(*) AS BIGINT) AS m
      FROM g
    ),
    z AS (
      SELECT grp, n, x, m,
             (CAST(x AS DOUBLE) / n - CAST(tx AS DOUBLE) / tn)
               / sqrt((CAST(tx AS DOUBLE) / tn) * (1 - CAST(tx AS DOUBLE) / tn) / n)
               AS zval
      FROM g CROSS JOIN t
    ),
    xh_ AS (SELECT grp, n, x, m, zval, abs(zval) / sqrt(2.0e0) AS xh FROM z),
    p AS (
      SELECT grp, n, x, m, round(zval, 6) AS z,
             round({_P_TWO_SIDED}, 6) AS p_value
      FROM xh_
    ),
    r AS (
      SELECT *, CAST(row_number() OVER (ORDER BY p_value, grp) AS BIGINT) AS rk
      FROM p
    ),
    cut AS (
      SELECT COALESCE(max(CASE WHEN p_value * m <= rk * 0.05e0
                           THEN rk END), 0) AS k
      FROM r
    )
    SELECT grp, n, x, z, p_value, rk,
           rk * 0.05e0 / m AS bh_critical,
           rk <= cut.k AS rejected
    FROM r CROSS JOIN cut
    """,
)
def q_stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benjamini-Hochberg FDR correction over a real hypothesis FAMILY:
    # per event type, H0 "P(value >= 50 | type) = the global rate",
    # two-sided p from the one-sample proportion z via the shared
    # Abramowitz-Stegun erf fragment (p = 1 - erf(|z|/sqrt 2); max
    # approximation error 1.5e-7, so p rounds to 6), then the step-up
    # rule: reject every hypothesis ranked at or below the LARGEST i
    # with p_(i) <= i*alpha/m. Ranks order by (round-6 p, grp) — a
    # unique total order over pre-rounded values, so the cutoff index
    # is bit-stable cross-engine. The multiple-testing guard every
    # per-segment metrics sweep needs before declaring winners.
    # 100 TB: one conditional-count scan; everything after lives on
    # the |groups| frame.
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    g = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") >= 50, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    g = g.localCheckpoint(eager=False)  # feeds totals + per-group rows
    t = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("x").cast("bigint").alias("tx"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    p0 = F.col("tx").cast("double") / F.col("tn")
    z = g.crossJoin(F.broadcast(t)).select(
        "grp",
        "n",
        "x",
        "m",
        (
            (F.col("x").cast("double") / F.col("n") - p0)
            / F.sqrt(p0 * (1 - p0) / F.col("n"))
        ).alias("zval"),
    )
    xh_ = z.withColumn("xh", F.abs(F.col("zval")) / F.sqrt(F.lit(2.0)))
    p = xh_.selectExpr(
        "grp",
        "n",
        "x",
        "m",
        "round(zval, 6) AS z",
        f"round({_P_TWO_SIDED}, 6) AS p_value",
    )
    r = p.withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy("p_value", "grp"))
        .cast("bigint"),
    )
    r = r.localCheckpoint(eager=False)  # feeds the cutoff + output rows
    cut = r.agg(
        F.coalesce(
            F.max(
                F.when(F.col("p_value") * F.col("m") <= F.col("rk") * 0.05, F.col("rk"))
            ),
            F.lit(0).cast("bigint"),
        ).alias("k")
    )
    return r.crossJoin(F.broadcast(cut)).select(
        "grp",
        "n",
        "x",
        "z",
        "p_value",
        "rk",
        (F.col("rk") * 0.05 / F.col("m")).alias("bh_critical"),
        (F.col("rk") <= F.col("k")).alias("rejected"),
    )


@register(
    "q_stat_ks_normal",
    oracle=f"""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    pv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY v),
    c AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM pv
    ),
    m AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(v * cnt) AS BIGINT) AS s,
             CAST(sum(v * v * cnt) AS BIGINT) AS q
      FROM pv
    ),
    st AS (
      SELECT n, CAST(s AS DOUBLE) / n AS mu,
             sqrt(CAST(q AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS sd
      FROM m
    ),
    zc AS (
      SELECT c.v, c.cnt, c.cum, st.n,
             (c.v - st.mu) / st.sd AS zv
      FROM c CROSS JOIN st
    ),
    ph AS (
      SELECT v, cnt, cum, n, zv, abs(zv) / sqrt(2.0e0) AS xh FROM zc
    ),
    phi AS (
      SELECT v, cnt, cum, n,
             CASE WHEN zv >= 0
                  THEN 1.0e0 - ({_P_TWO_SIDED}) / 2
                  ELSE ({_P_TWO_SIDED}) / 2 END AS fz
      FROM ph
    )
    SELECT max(n) AS n,
           round(max(greatest(
             abs(CAST(cum AS DOUBLE) / n - fz),
             abs(CAST(cum - cnt AS DOUBLE) / n - fz))), 6) AS ks_d
    FROM phi GROUP BY n
    """,
)
def q_stat_ks_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lilliefors-style normality check: one-sample KS distance between
    # the value ECDF and the Normal(mu-hat, sd-hat) FITTED to the same
    # data — the is-it-even-normal gate before any t/z-family key. The
    # ECDF rides the value-support prefix sum (exact integers, both
    # sides of every jump); mu/sd are exact-moment fits; Phi evaluates
    # per SUPPORT row through the shared erf fragment (Phi(z) =
    # 1 - p_two(|z|)/2 for z >= 0, mirrored below) — libm exp/sqrt +
    # the 1.5e-7 approximation floor -> round-6 on D. 100 TB: one
    # partial agg + one support-sized prefix sum; the erf column work
    # is support-bounded, never per-row.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v")
    )
    pv = x.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + moments
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    m = pv.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v") * F.col("cnt")).cast("bigint").alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    st = m.select(
        "n",
        mu.alias("mu"),
        F.sqrt(F.col("q").cast("double") / F.col("n") - mu * mu).alias("sd"),
    )
    zc = c.crossJoin(F.broadcast(st)).select(
        "v", "cnt", "cum", "n", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("zv")
    )
    ph = zc.withColumn("xh", F.abs(F.col("zv")) / F.sqrt(F.lit(2.0)))
    phi = ph.selectExpr(
        "v",
        "cnt",
        "cum",
        "n",
        f"CASE WHEN zv >= 0 THEN 1.0e0 - ({_P_TWO_SIDED}) / 2"
        f" ELSE ({_P_TWO_SIDED}) / 2 END AS fz",
    )
    dev = F.greatest(
        F.abs(F.col("cum").cast("double") / F.col("n") - F.col("fz")),
        F.abs((F.col("cum") - F.col("cnt")).cast("double") / F.col("n") - F.col("fz")),
    )
    return phi.groupBy("n").agg(F.round(F.max(dev), 6).alias("ks_d")).select(
        F.col("n"), "ks_d"
    )


@register(
    "q_stat_anderson_darling",
    oracle=f"""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    pv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY v),
    c AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM pv
    ),
    m AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(v * cnt) AS BIGINT) AS s,
             CAST(sum(v * v * cnt) AS BIGINT) AS q
      FROM pv
    ),
    st AS (
      SELECT n, CAST(s AS DOUBLE) / n AS mu,
             sqrt(CAST(q AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS sd
      FROM m
    ),
    zc AS (
      SELECT c.cnt, c.cum, st.n, (c.v - st.mu) / st.sd AS zv
      FROM c CROSS JOIN st
    ),
    ph AS (
      SELECT cnt, cum, n, zv, abs(zv) / sqrt(2.0e0) AS xh FROM zc
    ),
    pp AS (
      SELECT cnt, cum, n, zv, ({_P_TWO_SIDED}) AS p2 FROM ph
    ),
    lg AS (
      SELECT cnt, cum, n,
             CASE WHEN zv >= 0 THEN ln(1.0e0 - p2 / 2)
                  ELSE ln(p2 / 2) END AS lnphi,
             CASE WHEN zv >= 0 THEN ln(p2 / 2)
                  ELSE ln(1.0e0 - p2 / 2) END AS ln1m
      FROM pp
    ),
    tm AS (
      SELECT n,
             CAST((2.0e0 * CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE))
                    * CAST(cnt AS DOUBLE) * lnphi
                  + (2.0e0 * CAST(n AS DOUBLE) * CAST(cnt AS DOUBLE)
                     - (2.0e0 * CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE))
                       * CAST(cnt AS DOUBLE)) * ln1m
                  AS DECIMAL(38,12)) AS term
      FROM lg
    )
    SELECT n,
           round(-CAST(n AS DOUBLE) - CAST(sum(term) AS DOUBLE) / n, 6) AS a2,
           round((-CAST(n AS DOUBLE) - CAST(sum(term) AS DOUBLE) / n)
                 * (1.0e0 + 0.75e0 / n
                    + 2.25e0 / (CAST(n AS DOUBLE) * n)), 6) AS a2_star
    FROM tm GROUP BY n
    """,
)
def q_stat_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One-sample Anderson-Darling normality statistic on the fitted
    # Normal(mu-hat, sd-hat) — the tail-weighted companion to
    # q_stat_ks_normal's worst-point ECDF distance (AD's 1/[F(1-F)]
    # weight makes it the standard test when tail departures matter).
    # A2 = -n - (1/n) SUM_j [(2j-1) ln PHI(z_j) + (2n+1-2j) ln(1-PHI(z_j))]
    # over the SORTED sample; a tied run occupying positions a..b
    # compresses to exact integer weight sums (SUM(2j-1) = (2cum-cnt)cnt,
    # SUM(2n+1-2j) = 2n cnt - (2cum-cnt)cnt), so the whole statistic
    # rides the value-support prefix sum — never a per-row sort. Each
    # log picks the well-conditioned branch of the shared erf fragment
    # (ln PHI from 1-p/2, ln(1-PHI) from p/2 directly — no cancellation
    # in the far tail). The support-row terms carry ~n-magnitude partial
    # sums that cancel to an O(1..100) statistic, so a float sum in
    # engine order would lose the round-6 grid; instead each term is
    # quantized to DECIMAL(38,12) and summed EXACTLY (the Fisher lnfact
    # lane), making the fold order-insensitive. a2_star applies the
    # (1 + 0.75/n + 2.25/n^2) finite-sample correction. round-6: libm
    # ln/exp skew ~n*1e-16*|ln| stays below half-grid through 8x.
    # 100 TB: one partial agg + one support-sized prefix sum; all
    # per-support column work, exact-decimal reduce.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v")
    )
    pv = x.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + moments
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    m = pv.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v") * F.col("cnt")).cast("bigint").alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    st = m.select(
        "n",
        mu.alias("mu"),
        F.sqrt(F.col("q").cast("double") / F.col("n") - mu * mu).alias("sd"),
    )
    zc = c.crossJoin(F.broadcast(st)).select(
        "cnt", "cum", "n", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("zv")
    )
    ph = zc.withColumn("xh", F.abs(F.col("zv")) / F.sqrt(F.lit(2.0)))
    pp = ph.selectExpr("cnt", "cum", "n", "zv", f"({_P_TWO_SIDED}) AS p2")
    lg = pp.selectExpr(
        "cnt",
        "cum",
        "n",
        "CASE WHEN zv >= 0 THEN ln(1.0e0 - p2 / 2) ELSE ln(p2 / 2) END AS lnphi",
        "CASE WHEN zv >= 0 THEN ln(p2 / 2) ELSE ln(1.0e0 - p2 / 2) END AS ln1m",
    )
    tm = lg.selectExpr(
        "n",
        "CAST((2.0e0 * CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE))"
        "       * CAST(cnt AS DOUBLE) * lnphi"
        "     + (2.0e0 * CAST(n AS DOUBLE) * CAST(cnt AS DOUBLE)"
        "        - (2.0e0 * CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE))"
        "          * CAST(cnt AS DOUBLE)) * ln1m"
        "     AS DECIMAL(38,12)) AS term",
    )
    return tm.groupBy("n").agg(
        F.expr(
            "round(-CAST(n AS DOUBLE) - CAST(sum(term) AS DOUBLE) / n, 6)"
        ).alias("a2"),
        F.expr(
            "round((-CAST(n AS DOUBLE) - CAST(sum(term) AS DOUBLE) / n)"
            " * (1.0e0 + 0.75e0 / n"
            "    + 2.25e0 / (CAST(n AS DOUBLE) * n)), 6)"
        ).alias("a2_star"),
    )


@register(
    "q_stat_power_sample_size",
    oracle="""
    WITH c AS (
      SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND event_type = 'purchase') AS BIGINT) AS x1,
             CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE user_id % 2 = 1 AND event_type = 'purchase') AS BIGINT) AS x2,
             CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS n2
      FROM events
    ),
    p AS (
      SELECT x1, n1, x2, n2,
             CAST(x1 AS DOUBLE) / n1 AS p1,
             CAST(x2 AS DOUBLE) / n2 AS p2
      FROM c
    )
    SELECT x1, n1, x2, n2, p1, p2,
           CAST(ceil((1.959964e0 + 0.841621e0) * (1.959964e0 + 0.841621e0)
                * (p1 * (1 - p1) + p2 * (1 - p2))
                / ((p1 - p2) * (p1 - p2))) AS BIGINT) AS n_per_arm_80pct
    FROM p
    """,
)
def q_stat_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A/B-test power planning: given the OBSERVED conversion rates of
    # the even/odd user-id arms, the per-arm sample size needed to
    # detect that difference at alpha=0.05 two-sided with 80% power —
    # n = (z_{a/2}+z_b)^2 (p1 q1 + p2 q2) / (p1-p2)^2 with the normal
    # quantiles as LITERALS (1.959964, 0.841621), so the whole key is
    # exact counts + one shared-text double expression + ceil: NO
    # rounding, no libm. The how-long-must-this-experiment-run readout
    # q_stat_proportion_z's significance can't give. 100 TB: one
    # conditional-count scan, 1-row result.
    ev = table(spark, sf_dir, "events")
    arm1 = F.col("user_id") % 2 == 0
    purch = F.col("event_type") == "purchase"
    cell = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    c = ev.agg(
        cell(arm1 & purch).alias("x1"),
        cell(arm1).alias("n1"),
        cell(~arm1 & purch).alias("x2"),
        cell(~arm1).alias("n2"),
    )
    p = c.selectExpr(
        "x1", "n1", "x2", "n2",
        "CAST(x1 AS DOUBLE) / n1 AS p1",
        "CAST(x2 AS DOUBLE) / n2 AS p2",
    )
    return p.selectExpr(
        "x1", "n1", "x2", "n2", "p1", "p2",
        "CAST(ceil((1.959964e0 + 0.841621e0) * (1.959964e0 + 0.841621e0)"
        " * (p1 * (1 - p1) + p2 * (1 - p2))"
        " / ((p1 - p2) * (p1 - p2))) AS BIGINT) AS n_per_arm_80pct",
    )


@register(
    "q_agg_tail_ratio",
    oracle="""
    WITH pv AS (
      SELECT event_type AS grp,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    c AS (
      SELECT grp, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pv
    ),
    t AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM pv GROUP BY 1),
    sel AS (
      SELECT c.grp, t.n,
             CAST(sum(CASE WHEN cum - cnt < (50 * n + 99) // 100
                           AND cum >= (50 * n + 99) // 100 THEN v ELSE 0 END)
                  AS BIGINT) AS p50,
             CAST(sum(CASE WHEN cum - cnt < (90 * n + 99) // 100
                           AND cum >= (90 * n + 99) // 100 THEN v ELSE 0 END)
                  AS BIGINT) AS p90,
             CAST(sum(CASE WHEN cum - cnt < (99 * n + 99) // 100
                           AND cum >= (99 * n + 99) // 100 THEN v ELSE 0 END)
                  AS BIGINT) AS p99
      FROM c JOIN t USING (grp) GROUP BY 1, 2
    )
    SELECT grp, n,
           CAST(p50 AS DOUBLE) / 100 AS p50,
           CAST(p90 AS DOUBLE) / 100 AS p90,
           CAST(p99 AS DOUBLE) / 100 AS p99,
           CAST(p99 AS DOUBLE) / p50 AS tail_99_50,
           CAST(p90 AS DOUBLE) / p50 AS tail_90_50
    FROM sel
    """,
)
def q_agg_tail_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SLO tail ratios per event type: exact p50/p90/p99 order
    # statistics (rank ceil(q*n), selected on the per-group value-
    # support prefix sum — the trimmed-mean machinery partitioned by
    # group) and the p99/p50, p90/p50 tail-heaviness ratios every
    # latency dashboard leads with. The per-group window runs on the
    # (group x support) CONTINGENCY — aggregate-sized by construction,
    # the qq_deciles exemption; selections and ratios are exact-integer
    # arithmetic with two final double divisions each — NO rounding.
    # 100 TB: one partial agg + one contingency-sized window.
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pv = ev.groupBy(
        F.col("event_type").alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pv = pv.localCheckpoint(eager=False)  # feeds window + totals
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = pv.withColumn("cum", F.sum("cnt").over(w).cast("bigint"))
    t = pv.groupBy("grp").agg(F.sum("cnt").cast("bigint").alias("n"))

    def pick(q):
        r = F.expr(f"({q} * n + 99) div 100")
        return F.sum(
            F.when(
                (F.col("cum") - F.col("cnt") < r) & (F.col("cum") >= r), F.col("v")
            ).otherwise(0)
        ).cast("bigint")

    sel = (
        c.join(F.broadcast(t), "grp")
        .groupBy("grp", "n")
        .agg(
            pick(50).alias("p50c"),
            pick(90).alias("p90c"),
            pick(99).alias("p99c"),
        )
    )
    return sel.select(
        "grp",
        "n",
        (F.col("p50c").cast("double") / 100).alias("p50"),
        (F.col("p90c").cast("double") / 100).alias("p90"),
        (F.col("p99c").cast("double") / 100).alias("p99"),
        (F.col("p99c").cast("double") / F.col("p50c")).alias("tail_99_50"),
        (F.col("p90c").cast("double") / F.col("p50c")).alias("tail_90_50"),
    )


@register(
    "q_stat_rank_biserial",
    oracle="""
    WITH x AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(sum(is_a) AS BIGINT) AS na,
             CAST(sum(1 - is_a) AS BIGINT) AS nb
      FROM x GROUP BY v
    ),
    c AS (
      SELECT na, nb, na + nb AS n,
             CAST(sum(na + nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn
      FROM pv
    ),
    s AS (
      SELECT CAST(sum(na) AS BIGINT) AS n_a,
             CAST(sum(nb) AS BIGINT) AS n_b,
             CAST(sum(na * (2 * (cumn - n) + n + 1)) AS BIGINT) AS r2a
      FROM c
    )
    SELECT n_a, n_b,
           CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2 AS u_stat,
           (CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2) / (n_a * n_b) AS cles,
           1.0e0 - (CAST(r2a - n_a * (n_a + 1) AS DOUBLE)) / (n_a * n_b)
             AS rank_biserial
    FROM s
    """,
)
def q_stat_rank_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Effect sizes for the Mann-Whitney comparison (purchase vs click):
    # CLES = U/(n_a n_b) — the probability a random purchase value
    # exceeds a random click value (ties half-credited) — and the
    # rank-biserial correlation r = 1 - 2U/(n_a n_b); the
    # HOW-DIFFERENT companion to q_stat_mannwhitney's is-it-different
    # z (the q_stat_cohens_d pairing, nonparametric edition). Same
    # exact tied-rank lane (value contingency + ONE prefix sum);
    # every output is exact-integer ratio arithmetic — NO rounding.
    # 100 TB: one value-level hash agg + the prefix sum.
    from trembita_spark.operators.stats import _arm_counts
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    pv = _arm_counts(ev, "value", F.col("event_type") == "purchase")
    c = prefix_sum(
        pv.withColumn("n", F.col("na") + F.col("nb")),
        "n",
        order_by=[F.col("v")],
        name="cumn",
    )
    s = c.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
        F.sum(
            F.col("na") * (2 * (F.col("cumn") - F.col("n")) + F.col("n") + 1)
        ).cast("bigint").alias("r2a"),
    )
    return s.selectExpr(
        "n_a",
        "n_b",
        "CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2 AS u_stat",
        "(CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2) / (n_a * n_b) AS cles",
        "1.0e0 - (CAST(r2a - n_a * (n_a + 1) AS DOUBLE)) / (n_a * n_b)"
        " AS rank_biserial",
    )


_WELCH_W = "(CAST(n{g} AS DOUBLE) * (n{g} - 1)) / (q{g} - CAST(s{g} AS DOUBLE) * s{g} / n{g})"


@register(
    "q_stat_welch_anova",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS q
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    w AS (
      SELECT grp, n,
             (CAST(n AS DOUBLE) * (n - 1)) / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS wt,
             CAST(s AS DOUBLE) / n AS m
      FROM g
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             round(sum(wt), 9) AS sw,
             round(sum(wt * m), 9) AS swm
      FROM w
    ),
    num AS (
      SELECT k, sw,
             round(sum(wt * (m - swm / sw) * (m - swm / sw)), 9) AS ss_b,
             round(sum((1 - wt / sw) * (1 - wt / sw) / (n - 1)), 9) AS lam
      FROM w CROSS JOIN t GROUP BY k, sw
    )
    SELECT k, sw,
           round((ss_b / (k - 1))
                 / (1 + 2.0e0 * (k - 2) / (k * k - 1) * lam), 9) AS f_welch,
           round((CAST(k AS DOUBLE) * k - 1) / (3 * lam), 9) AS df2
    FROM num
    """,
)
def q_stat_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Welch's heteroscedastic one-way ANOVA (value across event types):
    # the equal-variances assumption q_stat_anova makes — and
    # q_stat_levene tests — dropped, via precision weights w_g =
    # n_g/s_g². F* = [Σw(m−m̄w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Λ] with
    # Λ = Σ(1−w/Σw)²/(n_g−1), plus the Welch-Satterthwaite df2. Group
    # moments are exact decimals from ONE scan; every |groups|-term
    # fold routes through round-9 before reuse (~1e2-1e4 magnitudes,
    # the q_ts_hurst grid), and the final statistics share formula
    # text. 100 TB: one partial-aggregated scan, 1-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d).alias("s"),
        F.sum(d * d).alias("q"),
    )
    w = g.select(
        "grp",
        "n",
        (
            (F.col("n").cast("double") * (F.col("n") - 1))
            / (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        ).alias("wt"),
        (F.col("s").cast("double") / F.col("n")).alias("m"),
    )
    w = w.localCheckpoint(eager=False)  # feeds totals + the two folds
    t = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.round(F.sum("wt"), 9).alias("sw"),
        F.round(F.sum(F.col("wt") * F.col("m")), 9).alias("swm"),
    )
    mw = F.col("swm") / F.col("sw")
    num = (
        w.crossJoin(F.broadcast(t))
        .groupBy("k", "sw")
        .agg(
            F.round(F.sum(F.col("wt") * (F.col("m") - mw) * (F.col("m") - mw)), 9).alias("ss_b"),
            F.round(
                F.sum(
                    (1 - F.col("wt") / F.col("sw"))
                    * (1 - F.col("wt") / F.col("sw"))
                    / (F.col("n") - 1)
                ),
                9,
            ).alias("lam"),
        )
    )
    return num.selectExpr(
        "k",
        "sw",
        "round((ss_b / (k - 1))"
        " / (1 + 2.0e0 * (k - 2) / (k * k - 1) * lam), 9) AS f_welch",
        "round((CAST(k AS DOUBLE) * k - 1) / (3 * lam), 9) AS df2",
    )


_CVBC_PHI2T = "greatest(chi2 / n - CAST(r1 AS DOUBLE) * c1 / (n - 1), 0.0e0)"
_CVBC_RT = "(r1 + 1 - CAST(r1 AS DOUBLE) * r1 / (n - 1))"
_CVBC_CT = "(c1 + 1 - CAST(c1 AS DOUBLE) * c1 / (n - 1))"


@register(
    "q_stat_cramers_v_corrected",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT c.event_type, c.dow, c.o,
             sum(c.o) OVER (PARTITION BY c.event_type) AS rt,
             sum(c.o) OVER (PARTITION BY c.dow) AS ct,
             sum(c.o) OVER () AS n
      FROM cells c
    ),
    contrib AS (
      SELECT event_type, dow, o,
             pow(o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE), 2)
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) AS x,
             n
      FROM tot
    ),
    s AS (
      SELECT list_reduce(list(x ORDER BY event_type, dow), (a, b) -> a + b) AS chi2,
             CAST(count(DISTINCT event_type) - 1 AS BIGINT) AS r1,
             CAST(count(DISTINCT dow) - 1 AS BIGINT) AS c1,
             CAST(any_value(n) AS BIGINT) AS n
      FROM contrib
    )
    SELECT chi2, n,
           round(sqrt({_CVBC_PHI2T}
                 / least({_CVBC_RT} - 1, {_CVBC_CT} - 1)), 12) AS cramers_v_bc
    FROM s
    """,
)
def q_stat_cramers_v_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bergsma-Wicher bias-corrected Cramér's V: the raw V is biased
    # upward under independence (E[chi2] = (r-1)(c-1) even with NO
    # association, and at 100 TB that bias is the whole reading for
    # weak effects) — the correction subtracts it: phi2~ = max(0,
    # chi2/n - r1*c1/(n-1)), with shrunken r~/c~ in the denominator.
    # Rides the identical ordered contingency fold as q_stat_cramers_v
    # (_chisq_event_dow); the correction is one extra shared-text
    # expression (sqrt -> round-12). 100 TB: one data-touching groupBy.
    folded = _chisq_event_dow(spark, sf_dir)
    return folded.selectExpr(
        "chi2",
        "n",
        f"round(sqrt({_CVBC_PHI2T}"
        f" / least({_CVBC_RT} - 1, {_CVBC_CT} - 1)), 12) AS cramers_v_bc",
    )


@register(
    "q_agg_harmonic_mean",
    oracle="""
    WITH pv AS (
      SELECT event_type AS grp,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND value > 0
      GROUP BY 1, 2
    ),
    t AS (
      SELECT grp, CAST(sum(c) AS BIGINT) AS n,
             round(sum(CAST(c AS DOUBLE) * 100 / v), 9) AS sinv
      FROM pv GROUP BY grp
    )
    SELECT grp, n, round(n / sinv, 9) AS harmonic_mean
    FROM t
    """,
)
def q_agg_harmonic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Harmonic mean of value per event type — the right average for
    # rates (speeds, prices-per-unit, F1 is one) and the third
    # Pythagorean mean alongside q_agg_basic's arithmetic and
    # q_agg_geometric_mean: H = n / sum(1/x). The reciprocal fold runs
    # over the cent-lane VALUE-SUPPORT contingency (same shape as the
    # geometric key: the libm-free but merge-order-sensitive sum over
    # the support-bounded frame -> round-9 before the final division,
    # round-9 after). 100 TB: one partial-aggregated scan to the
    # contingency, |groups| rows out.
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    pv = ev.groupBy(
        F.col("event_type").alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    t = pv.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.round(F.sum(F.col("c").cast("double") * 100 / F.col("v")), 9).alias("sinv"),
    )
    return t.select(
        "grp", "n", F.round(F.col("n") / F.col("sinv"), 9).alias("harmonic_mean")
    )


# D'Agostino-Pearson omnibus: shared formula-text stages over the raw
# power sums (skew/kurt are scale-invariant, so the cent lane's x100
# cancels). Every fragment is used verbatim by BOTH engines.
_DAG_M = "CAST(s1 AS DOUBLE) / n"
_DAG_M2 = f"(CAST(s2 AS DOUBLE) / n - ({_DAG_M}) * ({_DAG_M}))"
_DAG_M3 = (
    f"(CAST(s3 AS DOUBLE) / n - 3 * ({_DAG_M}) * (CAST(s2 AS DOUBLE) / n)"
    f" + 2 * ({_DAG_M}) * ({_DAG_M}) * ({_DAG_M}))"
)
_DAG_M4 = (
    f"(CAST(s4 AS DOUBLE) / n - 4 * ({_DAG_M}) * (CAST(s3 AS DOUBLE) / n)"
    f" + 6 * ({_DAG_M}) * ({_DAG_M}) * (CAST(s2 AS DOUBLE) / n)"
    f" - 3 * ({_DAG_M}) * ({_DAG_M}) * ({_DAG_M}) * ({_DAG_M}))"
)
_DAG_Z1 = (
    "dd * ln(y / al + sqrt((y / al) * (y / al) + 1))"
)
_DAG_Z2 = (
    "((1 - 2.0e0 / (9 * aa))"
    " - cbrt((1 - 2.0e0 / aa) / (1 + xx * sqrt(2.0e0 / (aa - 4)))))"
    " / sqrt(2.0e0 / (9 * aa))"
)


@register(
    "q_stat_dagostino_k2",
    oracle=f"""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(CAST(c AS HUGEINT)) AS s1,
             sum(CAST(c AS HUGEINT) * c) AS s2,
             sum(CAST(c AS HUGEINT) * c * c) AS s3,
             sum(CAST(c AS HUGEINT) * c * c * c) AS s4
      FROM x
    ),
    mom AS (
      SELECT n,
             ({_DAG_M3}) / (({_DAG_M2}) * sqrt({_DAG_M2})) AS g1,
             ({_DAG_M4}) / (({_DAG_M2}) * ({_DAG_M2})) AS b2
      FROM s
    ),
    sk AS (
      SELECT n, g1, b2,
             g1 * sqrt((n + 1) * (n + 3) / (6 * (n - 2))) AS y,
             3.0e0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
               / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2
      FROM mom
    ),
    sk2 AS (
      SELECT *, -1 + sqrt(2 * (beta2 - 1)) AS w2 FROM sk
    ),
    sk3 AS (
      SELECT *, 1.0e0 / sqrt(ln(sqrt(w2))) AS dd,
             sqrt(2.0e0 / (w2 - 1)) AS al
      FROM sk2
    ),
    ku AS (
      SELECT n, b2, {_DAG_Z1} AS z1,
             (b2 - 3.0e0 * (n - 1) / (n + 1))
               / sqrt(24.0e0 * n * (n - 2) * (n - 3)
                      / ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS xx,
             6.0e0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
               * sqrt(6.0e0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))) AS sb
      FROM sk3
    ),
    ku2 AS (
      SELECT *, 6.0e0 + 8.0e0 / sb * (2.0e0 / sb + sqrt(1 + 4.0e0 / (sb * sb))) AS aa
      FROM ku
    ),
    fin AS (SELECT n, z1, {_DAG_Z2} AS z2 FROM ku2)
    SELECT CAST(n AS BIGINT) AS n, round(z1, 6) AS z_skew,
           round(z2, 6) AS z_kurt, round(z1 * z1 + z2 * z2, 6) AS k2
    FROM fin
    """,
)
def q_stat_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D'Agostino-Pearson K² omnibus normality test: the skewness z
    # (D'Agostino 1970 Johnson-SU transform) and kurtosis z
    # (Anscombe-Glynn cube-root transform) from ONE scan's exact raw
    # power sums on the cent lane (skew/kurt are scale-invariant, so
    # the ×100 cancels; S3/S4 overflow BIGINT at data scale -> the
    # oracle rides HUGEINT, Spark decimal(38,0)). K² = z1² + z2² is
    # the moment-based complement to q_stat_ks_normal's ECDF distance
    # and q_stat_jarque_bera's asymptotic version — these finite-n
    # transforms are what statsmodels/scipy normaltest actually run.
    # S3/S4 exceed 2^53 raw units, so their double conversions carry
    # the decimal->double ulp lesson + heavy ln/sqrt/cbrt chains ->
    # round-6 on all three outputs. 100 TB: one partial-aggregated
    # scan, 1-row result.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c")
    )
    cd = F.col("c").cast("decimal(38,0)")
    s = x.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(cd).alias("s1"),
        F.sum(cd * F.col("c")).alias("s2"),
        F.sum(cd * F.col("c") * F.col("c")).alias("s3"),
        F.sum(cd * F.col("c") * F.col("c") * F.col("c")).alias("s4"),
    )
    mom = s.selectExpr(
        "n",
        f"({_DAG_M3}) / (({_DAG_M2}) * sqrt({_DAG_M2})) AS g1",
        f"({_DAG_M4}) / (({_DAG_M2}) * ({_DAG_M2})) AS b2",
    )
    sk = mom.selectExpr(
        "n", "g1", "b2",
        "g1 * sqrt((n + 1) * (n + 3) / (6 * (n - 2))) AS y",
        "3.0e0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)"
        " / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2",
    )
    sk2 = sk.selectExpr("*", "-1 + sqrt(2 * (beta2 - 1)) AS w2")
    sk3 = sk2.selectExpr(
        "*",
        "1.0e0 / sqrt(ln(sqrt(w2))) AS dd",
        "sqrt(2.0e0 / (w2 - 1)) AS al",
    )
    ku = sk3.selectExpr(
        "n", "b2", f"{_DAG_Z1} AS z1",
        "(b2 - 3.0e0 * (n - 1) / (n + 1))"
        " / sqrt(24.0e0 * n * (n - 2) * (n - 3)"
        " / ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS xx",
        "6.0e0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))"
        " * sqrt(6.0e0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))) AS sb",
    )
    ku2 = ku.selectExpr(
        "*",
        "6.0e0 + 8.0e0 / sb * (2.0e0 / sb + sqrt(1 + 4.0e0 / (sb * sb))) AS aa",
    )
    fin = ku2.selectExpr("n", "z1", f"{_DAG_Z2} AS z2")
    return fin.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "round(z1, 6) AS z_skew",
        "round(z2, 6) AS z_kurt",
        "round(z1 * z1 + z2 * z2, 6) AS k2",
    )


@register(
    "q_stat_ansari_bradley",
    oracle="""
    WITH x AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(sum(is_a) AS BIGINT) AS na,
             CAST(sum(1 - is_a) AS BIGINT) AS nb
      FROM x GROUP BY v
    ),
    c AS (
      SELECT na, nb, na + nb AS n,
             CAST(sum(na + nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn
      FROM pv
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM c),
    m AS (
      SELECT CAST(sum(na) AS BIGINT) AS n_a,
             CAST(sum(nb) AS BIGINT) AS n_b,
             max(n_tot) AS n_tot,
             sum(CAST(na AS HUGEINT)
                 * least(2 * (cumn - n) + n + 1,
                         2 * (n_tot + 1) - (2 * (cumn - n) + n + 1))) AS ab2,
             sum(CAST(n AS HUGEINT)
                 * least(2 * (cumn - n) + n + 1,
                         2 * (n_tot + 1) - (2 * (cumn - n) + n + 1))) AS s1_2,
             sum(CAST(n AS HUGEINT)
                 * least(2 * (cumn - n) + n + 1,
                         2 * (n_tot + 1) - (2 * (cumn - n) + n + 1))
                 * least(2 * (cumn - n) + n + 1,
                         2 * (n_tot + 1) - (2 * (cumn - n) + n + 1))) AS fac4
      FROM c, tot
    )
    SELECT n_a, n_b,
           CAST(ab2 AS DOUBLE) / 2 AS ab_stat,
           (CAST(ab2 AS DOUBLE) / 2
              - CAST(CAST(n_a AS HUGEINT) * s1_2 AS DOUBLE)
                / (2 * CAST(n_tot AS DOUBLE)))
           / sqrt(
               CAST(CAST(n_a AS HUGEINT) * n_b
                    * (CAST(n_tot AS HUGEINT) * fac4 - s1_2 * s1_2) AS DOUBLE)
               / CAST(4 * CAST(n_tot AS HUGEINT) * n_tot * (n_tot - 1) AS DOUBLE)
             ) AS z_stat
    FROM m
    """,
)
def q_stat_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ansari-Bradley two-sample SCALE test (purchase vs click values):
    # do the two arms differ in dispersion around a common center? The
    # missing member of the nonparametric family next to Mann-Whitney
    # (location) and KS (shape) — same value-support prefix-sum lane,
    # new score function min(r, N+1-r) with the finite-sampling
    # tie-robust variance (operators/stats.py: ansari_bradley). Every
    # moment is an exact integer in the decimal(38,0)/HUGEINT lane;
    # the z is one identical double expression tree on both engines
    # (no rounding — the t-test discipline). At 100 TB: one value-level
    # hash agg + the range-partitioned prefix sum + a scalar rollup.
    from trembita_spark.operators.stats import ansari_bradley

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    return ansari_bradley(ev, "value", F.col("event_type") == "purchase")


@register(
    "q_stat_brunner_munzel",
    oracle="""
    WITH x AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    pv AS (
      SELECT v, CAST(sum(is_a) AS BIGINT) AS na,
             CAST(sum(1 - is_a) AS BIGINT) AS nb
      FROM x GROUP BY v
    ),
    c AS (
      SELECT na, nb, na + nb AS n,
             CAST(sum(na + nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn,
             CAST(sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
             CAST(sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
      FROM pv
    ),
    m AS (
      SELECT CAST(sum(na) AS BIGINT) AS n_a,
             CAST(sum(nb) AS BIGINT) AS n_b,
             sum(CAST(na AS HUGEINT) * (2 * cumn - n + 1)) AS rca2,
             sum(CAST(nb AS HUGEINT) * (2 * cumn - n + 1)) AS rcb2,
             sum(CAST(na AS HUGEINT) * (2 * (cumn - cuma) - nb)) AS sa1,
             sum(CAST(na AS HUGEINT) * (2 * (cumn - cuma) - nb)
                 * (2 * (cumn - cuma) - nb)) AS sa2,
             sum(CAST(nb AS HUGEINT) * (2 * (cumn - cumb) - na)) AS sb1,
             sum(CAST(nb AS HUGEINT) * (2 * (cumn - cumb) - na)
                 * (2 * (cumn - cumb) - na)) AS sb2
      FROM c
    ),
    v AS (
      SELECT n_a, n_b,
             CAST(rca2 AS DOUBLE) / (2 * n_a) AS rc_mean_a,
             CAST(rcb2 AS DOUBLE) / (2 * n_b) AS rc_mean_b,
             CAST(CAST(n_a AS HUGEINT) * sa2 - sa1 * sa1 AS DOUBLE)
               / CAST(4 * n_a * (n_a - 1) AS DOUBLE) AS s_a,
             CAST(CAST(n_b AS HUGEINT) * sb2 - sb1 * sb1 AS DOUBLE)
               / CAST(4 * n_b * (n_b - 1) AS DOUBLE) AS s_b
      FROM m
    )
    SELECT n_a, n_b,
           (rc_mean_b - CAST(n_b + 1 AS DOUBLE) / 2) / CAST(n_a AS DOUBLE) AS p_hat,
           CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             * (rc_mean_b - rc_mean_a)
             / CAST(n_a + n_b AS DOUBLE)
             / sqrt(n_a * s_a + n_b * s_b) AS w_stat,
           (n_a * s_a + n_b * s_b) * (n_a * s_a + n_b * s_b)
             / ((n_a * s_a) * (n_a * s_a) / CAST(n_a - 1 AS DOUBLE)
                + (n_b * s_b) * (n_b * s_b) / CAST(n_b - 1 AS DOUBLE)) AS df_bm
    FROM v
    """,
)
def q_stat_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Brunner-Munzel heteroscedastic rank test (purchase vs click
    # values): tests P(A<B)+P(A=B)/2 = 1/2 WITHOUT Mann-Whitney's
    # equal-shape assumption — the recommended default when the two
    # arms may differ in variance (operators/stats.py: brunner_munzel).
    # Placement algebra on the value-support frame: ONE
    # prefix_sum_multi pass carries all three running counts
    # (pooled + both arms), so per-value doubled placements are exact
    # integers; moments ride the decimal(38,0)/HUGEINT lane and the
    # final W / Satterthwaite-df / p-hat are identical double trees on
    # both engines. At 100 TB: one value-level hash agg + one range
    # shuffle + a scalar rollup — no row-level sort anywhere.
    from trembita_spark.operators.stats import brunner_munzel

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    return brunner_munzel(ev, "value", F.col("event_type") == "purchase")


@register(
    "q_agg_group_tail_ratio",
    oracle="""
    WITH pv AS (
      SELECT event_type, value AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM pv
    ),
    m AS (
      SELECT event_type,
             max(n) AS n,
             min(CASE WHEN cum >= CAST(floor(0.5e0 * (n - 1)) AS BIGINT) + 1
                      THEN v END) AS v1_50,
             min(CASE WHEN cum >= CAST(floor(0.5e0 * (n - 1)) AS BIGINT) + 2
                      THEN v END) AS v2_50,
             min(CASE WHEN cum >= CAST(floor(0.99e0 * (n - 1)) AS BIGINT) + 1
                      THEN v END) AS v1_99,
             min(CASE WHEN cum >= CAST(floor(0.99e0 * (n - 1)) AS BIGINT) + 2
                      THEN v END) AS v2_99
      FROM c GROUP BY 1
    )
    SELECT event_type, n,
           v1_50 + (COALESCE(v2_50, v1_50) - v1_50)
                 * (0.5e0 * (n - 1) - floor(0.5e0 * (n - 1))) AS p50,
           v1_99 + (COALESCE(v2_99, v1_99) - v1_99)
                 * (0.99e0 * (n - 1) - floor(0.99e0 * (n - 1))) AS p99,
           (v1_99 + (COALESCE(v2_99, v1_99) - v1_99)
                 * (0.99e0 * (n - 1) - floor(0.99e0 * (n - 1))))
           / (v1_50 + (COALESCE(v2_50, v1_50) - v1_50)
                 * (0.5e0 * (n - 1) - floor(0.5e0 * (n - 1)))) AS tail_ratio
    FROM m
    """,
)
def q_agg_group_tail_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group tail ratio p99/p50 — the SLO-reporting shape ("how much
    # worse is the tail than the median, per event type"), with EXACT
    # linearly-interpolated percentiles computed on the VALUE-SUPPORT
    # lane instead of a per-group sort: one hash agg to
    # (group, value, count), ONE composite-key (group, value) range
    # shuffle for the global prefix sum, per-group offsets recovered
    # arithmetically (group cum = global cum − group start, where the
    # start is max(global cum) − n of the group — a |groups|-row
    # broadcast, NO low-cardinality data-bearing window), then one
    # conditional-min aggregate picks the two bracketing order
    # statistics per percentile and interpolates with the identical
    # p·(n−1) definition both engines use. At 100 TB: work scales with
    # the value support, parallelism with the range partitioning —
    # never with 5 group partitions.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events")
    pv = (
        ev.where(F.col("value").isNotNull())
        .select("event_type", F.col("value").alias("v"))
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    c = prefix_sum(pv, "cnt", order_by=[F.col("event_type"), F.col("v")], name="cumg")
    tot = c.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.max("cumg").cast("bigint").alias("cum_end"),
    )
    offs = tot.select(
        "event_type", "n", (F.col("cum_end") - F.col("n")).alias("off")
    )
    j = c.join(F.broadcast(offs), "event_type").withColumn(
        "cum", (F.col("cumg") - F.col("off")).cast("bigint")
    )
    n = F.col("n")
    def brackets(p: float, name: str):
        idx = F.lit(p) * (n - 1)
        k1 = F.floor(idx).cast("bigint") + 1
        return [
            F.min(F.when(F.col("cum") >= k1, F.col("v"))).alias(f"v1_{name}"),
            F.min(F.when(F.col("cum") >= k1 + 1, F.col("v"))).alias(f"v2_{name}"),
        ]
    m = j.groupBy("event_type").agg(
        F.max("n").alias("n"), *brackets(0.5, "50"), *brackets(0.99, "99")
    )
    def interp(p: float, name: str):
        idx = F.lit(p) * (n - 1)
        frac = idx - F.floor(idx)
        v1, v2 = F.col(f"v1_{name}"), F.col(f"v2_{name}")
        return v1 + (F.coalesce(v2, v1) - v1) * frac
    return m.select(
        "event_type",
        "n",
        interp(0.5, "50").alias("p50"),
        interp(0.99, "99").alias("p99"),
        (interp(0.99, "99") / interp(0.5, "50")).alias("tail_ratio"),
    )


_MOOD_TYPES = ("click", "error", "purchase", "signup", "view")


def _mood_chi2_text() -> str:
    # fixed 10-term chain over the pivoted scalar row — addition order
    # is part of the expression, so chi2 is bit-deterministic on both
    # engines (the ljung_box convention).
    terms = []
    for i in range(len(_MOOD_TYPES)):
        ni = f"(a{i} + b{i})"
        ea = f"(CAST(ta AS DOUBLE) * {ni} / nn)"
        eb = f"(CAST(tb AS DOUBLE) * {ni} / nn)"
        terms.append(f"(a{i} - {ea}) * (a{i} - {ea}) / {ea}")
        terms.append(f"(b{i} - {eb}) * (b{i} - {eb}) / {eb}")
    return " + ".join(terms)


@register(
    "q_stat_mood_median",
    oracle=f"""
    WITH x AS (
      SELECT event_type, value AS v FROM events WHERE value IS NOT NULL
    ),
    pv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY v),
    c AS (
      SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pv
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM x),
    med AS (
      SELECT min(v) AS gm FROM c, tot WHERE cum >= (nn + 1) // 2
    ),
    piv AS (
      SELECT
        {", ".join(
            f"CAST(count(*) FILTER (WHERE event_type = '{t}' AND v > gm) AS BIGINT) AS a{i}, "
            f"CAST(count(*) FILTER (WHERE event_type = '{t}' AND v <= gm) AS BIGINT) AS b{i}"
            for i, t in enumerate(_MOOD_TYPES))}
      FROM x, med
    ),
    m AS (
      SELECT *,
             {" + ".join(f"a{i}" for i in range(5))} AS ta,
             {" + ".join(f"b{i}" for i in range(5))} AS tb,
             {" + ".join(f"a{i} + b{i}" for i in range(5))} AS nn,
             (SELECT gm FROM med) AS gm
      FROM piv
    )
    SELECT nn AS n, gm AS grand_median,
           {_mood_chi2_text()} AS chi2
    FROM m
    """,
)
def q_stat_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mood's median test across the five event types: is the median of
    # `value` the same in every group? Grand LOWER median (the
    # ceil(N/2)-th order statistic — a data value, no interpolation)
    # from the value-support prefix-sum lane, then a 2xk contingency of
    # above/at-or-below counts per group and the chi-square statistic
    # as ONE fixed 10-term expression chain over the pivoted scalar row
    # (generated once, used verbatim by both engines — bit-exact, no
    # rounding). The k-sample location test that is robust where ANOVA
    # is not. At 100 TB: one value-support agg + prefix sum + one
    # conditional-count pivot — no per-group sort.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select("event_type", F.col("value").alias("v"))
    pv = x.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    tot = x.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    med = (
        c.crossJoin(F.broadcast(tot))
        .where(F.col("cum") >= F.expr("(nn + 1) div 2"))
        .agg(F.min("v").alias("gm"))
    )
    piv = x.crossJoin(F.broadcast(med)).agg(
        *[
            agg
            for i, t in enumerate(_MOOD_TYPES)
            for agg in (
                F.sum(
                    F.when(
                        (F.col("event_type") == t) & (F.col("v") > F.col("gm")), 1
                    ).otherwise(0)
                ).cast("bigint").alias(f"a{i}"),
                F.sum(
                    F.when(
                        (F.col("event_type") == t) & (F.col("v") <= F.col("gm")), 1
                    ).otherwise(0)
                ).cast("bigint").alias(f"b{i}"),
            )
        ],
        F.min("gm").alias("gm"),
    )
    m = piv.selectExpr(
        "*",
        " + ".join(f"a{i}" for i in range(5)) + " AS ta",
        " + ".join(f"b{i}" for i in range(5)) + " AS tb",
        " + ".join(f"a{i} + b{i}" for i in range(5)) + " AS nn",
    )
    return m.selectExpr(
        "nn AS n", "gm AS grand_median", _mood_chi2_text() + " AS chi2"
    )


_JT_TYPES = ("click", "error", "purchase", "signup", "view")


def _jt_moments(big: str) -> list[str]:
    # shared post-aggregate algebra: group-size moments (fixed 5-term
    # chains), tie moments, mean and the tie-corrected variance of the
    # Jonckheere-Terpstra statistic (Hollander & Wolfe 6.19–6.21).
    # ``big`` is the engine's exact wide-integer type (DECIMAL(38,0) on
    # Spark, HUGEINT on DuckDB) — same op sequence, bit-identical
    # doubles at the end. Returned as a LIST of column expressions
    # (joined for SQL, passed one-per-column to selectExpr).
    n = lambda i: f"CAST(n{i} AS {big})"  # noqa: E731
    gt1 = " + ".join(f"{n(i)} * (n{i} - 1) * (2 * n{i} + 5)" for i in range(5))
    gt2 = " + ".join(f"{n(i)} * (n{i} - 1) * (n{i} - 2)" for i in range(5))
    gt3 = " + ".join(f"{n(i)} * (n{i} - 1)" for i in range(5))
    sq = " + ".join(f"{n(i)} * n{i}" for i in range(5))
    return [
        "n0 + n1 + n2 + n3 + n4 AS nn",
        f"({gt1}) AS gt1",
        f"({gt2}) AS gt2",
        f"({gt3}) AS gt3",
        f"({sq}) AS nsq",
    ]


_JT_FINAL = """
    CAST(nn AS BIGINT) AS n,
    CAST(jt2 AS DOUBLE) / 2 AS jt_stat,
    (CAST(jt2 AS DOUBLE) / 2
       - CAST(CAST(nn AS {big}) * nn - nsq AS DOUBLE) / 4)
      / sqrt(
          CAST(CAST(nn AS {big}) * (nn - 1) * (2 * nn + 5) - gt1 - vt1 AS DOUBLE) / 72
          + CAST(gt2 * vt2 AS DOUBLE)
            / (36.0e0 * nn * (nn - 1.0e0) * (nn - 2.0e0))
          + CAST(gt3 * vt3 AS DOUBLE) / (8.0e0 * nn * (nn - 1.0e0))
        ) AS z_stat
"""


@register(
    "q_stat_jonckheere",
    oracle=f"""
    WITH x AS (
      SELECT event_type, value AS v FROM events
      WHERE value IS NOT NULL
    ),
    pv AS (
      SELECT v,
             {", ".join(
                 f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS c{i}"
                 for i, t in enumerate(_JT_TYPES))}
      FROM x GROUP BY v
    ),
    c AS (
      SELECT *,
             {", ".join(
                 f"CAST(sum(c{i}) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m{i}"
                 for i in range(5))}
      FROM pv
    ),
    agg AS (
      SELECT
        {", ".join(f"CAST(sum(c{i}) AS BIGINT) AS n{i}" for i in range(5))},
        sum({" + ".join(
            "CAST(c%d AS HUGEINT) * (2 * (%s) + (%s))" % (
                j,
                " + ".join(f"(m{i} - c{i})" for i in range(j)),
                " + ".join(f"c{i}" for i in range(j)),
            ) for j in range(1, 5))}) AS jt2,
        sum(CAST(c0 + c1 + c2 + c3 + c4 AS HUGEINT)
            * (c0 + c1 + c2 + c3 + c4 - 1)
            * (2 * (c0 + c1 + c2 + c3 + c4) + 5)) AS vt1,
        sum(CAST(c0 + c1 + c2 + c3 + c4 AS HUGEINT)
            * (c0 + c1 + c2 + c3 + c4 - 1)
            * (c0 + c1 + c2 + c3 + c4 - 2)) AS vt2,
        sum(CAST(c0 + c1 + c2 + c3 + c4 AS HUGEINT)
            * (c0 + c1 + c2 + c3 + c4 - 1)) AS vt3
      FROM c
    ),
    m AS (SELECT *, {", ".join(_jt_moments("HUGEINT"))} FROM agg)
    SELECT {_JT_FINAL.format(big="HUGEINT")} FROM m
    """,
)
def q_stat_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Jonckheere-Terpstra trend test: are `value` distributions
    # stochastically ORDERED along the (alphabetically ordered) event
    # types? The ordered-alternative k-sample test — strictly more
    # powerful than Kruskal-Wallis when the alternative is monotone.
    # JT = Σ_{{i<j}} U_ij, computed WITHOUT any pairwise group joins:
    # ONE prefix_sum_multi pass carries all five per-group running
    # counts over the shared value order, so each value row contributes
    # its below-pairs and tie-pairs to every ordered group pair in a
    # single fixed expression; tie and group moments feed the
    # tie-corrected normal variance (Hollander & Wolfe). Doubled-JT
    # stays an exact HUGEINT/decimal integer; the z is one shared
    # formula text instantiated per engine with its exact wide-int cast
    # — identical op sequence, no rounding. At 100 TB: one value-level
    # hash agg + one range shuffle + a scalar rollup.
    from trembita_spark.operators.ranking import prefix_sum_multi

    dec = "DECIMAL(38,0)"
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select("event_type", F.col("value").alias("v"))
    pv = x.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i}")
            for i, t in enumerate(_JT_TYPES)
        ]
    )
    c = prefix_sum_multi(
        pv,
        [f"c{i}" for i in range(5)],
        order_by=[F.col("v")],
        names=[f"m{i}" for i in range(5)],
    )
    jt_term = " + ".join(
        "CAST(c%d AS %s) * (2 * (%s) + (%s))"
        % (
            j,
            dec,
            " + ".join(f"(m{i} - c{i})" for i in range(j)),
            " + ".join(f"c{i}" for i in range(j)),
        )
        for j in range(1, 5)
    )
    t5 = "c0 + c1 + c2 + c3 + c4"
    agg = c.selectExpr(
        "*",
        f"({jt_term}) AS jt_term",
        f"CAST({t5} AS {dec}) * ({t5} - 1) * (2 * ({t5}) + 5) AS vt1_term",
        f"CAST({t5} AS {dec}) * ({t5} - 1) * ({t5} - 2) AS vt2_term",
        f"CAST({t5} AS {dec}) * ({t5} - 1) AS vt3_term",
    ).agg(
        *[F.sum(f"c{i}").cast("bigint").alias(f"n{i}") for i in range(5)],
        F.sum("jt_term").cast(dec.lower()).alias("jt2"),
        F.sum("vt1_term").cast(dec.lower()).alias("vt1"),
        F.sum("vt2_term").cast(dec.lower()).alias("vt2"),
        F.sum("vt3_term").cast(dec.lower()).alias("vt3"),
    )
    m = agg.selectExpr("*", *_jt_moments(dec))
    final = [p.strip() for p in _JT_FINAL.format(big=dec).split(",\n") if p.strip()]
    return m.selectExpr(*final)


@register(
    "q_ts_pettitt",
    oracle="""
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    pv AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY x),
    rk AS (
      SELECT x,
             2 * (CAST(sum(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  - cnt) + cnt + 1 AS r2
      FROM pv
    ),
    s AS (
      SELECT hr,
             CAST(sum(r2) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s2,
             CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS t,
             CAST(count(*) OVER () AS BIGINT) AS nn
      FROM c JOIN rk USING (x)
    ),
    u AS (
      SELECT hr, t, nn, s2 - t * (nn + 1) AS ut
      FROM s WHERE t < nn
    ),
    k AS (SELECT max(abs(ut)) AS k_stat FROM u),
    f AS (
      SELECT k_stat,
             max(nn) AS n,
             min(CASE WHEN abs(ut) = k_stat THEN hr END) AS change_hr
      FROM u, k
      GROUP BY k_stat
    )
    SELECT n, k_stat, change_hr,
           round(2 * exp(CAST(-6 AS DOUBLE) * (CAST(k_stat AS HUGEINT) * k_stat)
                         / (CAST(n AS HUGEINT) * n * n
                            + CAST(n AS HUGEINT) * n)), 6) AS p_approx
    FROM f
    """,
)
def q_ts_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pettitt single-changepoint test on the hourly event-count series:
    # nonparametric "did the level shift, and when" — the rank-based
    # companion to q_ts_changepoint's CUSUM. U_t = 2·Σ_{i<=t} r_i −
    # t(N+1) with midranks, so with doubled ranks (the mann_whitney
    # lane) every U_t is an EXACT integer from two prefix-sum passes:
    # one over the count-value support for tied ranks, one over time
    # for the running rank sum; K = max|U_t| and the change hour is the
    # earliest argmax (unique total order). Approximate significance
    # 2·exp(−6K²/(N³+N²)) is the standard Pettitt tail bound — exp is
    # libm (1-ulp cross-engine risk) → round-6 on p only (parity rule
    # 5); n, K, change_hr stay exact. At 100 TB: the series is a
    # calendar-spine aggregate; both prefix sums are the distributed
    # range-partition kind — no O(n²) pair scan (the naive definition
    # is Σ_j>t sign pairs).
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events")
    c = (
        ev.select(F.expr("unix_micros(ts) div 3600000000").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)  # feeds rank support + time spine
    )
    pv = c.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    rkv = prefix_sum(pv, "cnt", order_by=[F.col("x")], name="cum").select(
        "x", (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1).alias("r2")
    )
    joined = c.join(F.broadcast(rkv), "x")
    from trembita_spark.operators.ranking import prefix_sum_multi

    s = prefix_sum_multi(
        joined.withColumn("one", F.lit(1)),
        ["r2", "one"],
        order_by=[F.col("hr")],
        names=["s2", "t"],
    )
    tot = s.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    u = (
        s.crossJoin(F.broadcast(tot))
        .where(F.col("t") < F.col("nn"))
        .select(
            "hr",
            "nn",
            (F.col("s2") - F.col("t") * (F.col("nn") + 1)).alias("ut"),
        )
    )
    k = u.agg(F.max(F.abs(F.col("ut"))).alias("k_stat"))
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    out = (
        u.crossJoin(F.broadcast(k))
        .groupBy("k_stat")
        .agg(
            F.max("nn").alias("n"),
            F.min(
                F.when(F.abs(F.col("ut")) == F.col("k_stat"), F.col("hr"))
            ).alias("change_hr"),
        )
    )
    n, ks = F.col("n"), F.col("k_stat")
    return out.select(
        "n",
        ks.alias("k_stat"),
        "change_hr",
        F.round(
            2
            * F.exp(
                F.lit(-6).cast("double")
                * (dec(ks) * ks).cast("double")
                / (dec(n) * n * n + dec(n) * n).cast("double")
            ),
            6,
        ).alias("p_approx"),
    )


@register(
    "q_stat_kendall_w",
    oracle="""
    WITH us AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ),
    full_blocks AS (
      SELECT user_id FROM us GROUP BY user_id HAVING count(*) = 5
    ),
    cb AS (SELECT us.* FROM us JOIN full_blocks USING (user_id)),
    r AS (
      SELECT a.user_id, a.event_type,
             CAST(2 * sum(CASE WHEN b.t < a.t THEN 1 ELSE 0 END)
                  + sum(CASE WHEN b.t = a.t THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS r2
      FROM cb a JOIN cb b USING (user_id)
      GROUP BY a.user_id, a.event_type
    ),
    pt AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_t FROM r
      GROUP BY event_type
    ),
    gs AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(r2_t AS HUGEINT) * CAST(r2_t AS HUGEINT))
                  AS HUGEINT) AS ssr2
      FROM pt
    ),
    nb AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_blocks FROM r
    ),
    f AS (
      SELECT n_blocks, k,
             3.0 * CAST(ssr2 AS DOUBLE)
               / CAST(n_blocks * k * (k + 1) AS DOUBLE)
             - CAST(3 * n_blocks * (k + 1) AS DOUBLE) AS chi2
      FROM gs CROSS JOIN nb
    )
    SELECT n_blocks, k, chi2,
           chi2 / CAST(n_blocks * (k - 1) AS DOUBLE) AS w_concordance
    FROM f
    """,
)
def q_stat_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Kendall's coefficient of concordance W — "how much do the blocks
    # (users) agree on the ranking of the 5 event types by spend?"
    # W = chi2_F / (m(k-1)), the [0,1]-normalized companion the
    # Friedman statistic is usually reported WITH (W is the effect
    # size, chi2 the test). Identical doubled-midrank lane as
    # q_stat_friedman (ties averaged in the ranks; classic uncorrected
    # denominator — the friedman_test convention, documented); one
    # extra division on the final scalar row, bit-exact both engines.
    from trembita_spark.operators.stats import friedman_test

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    us = ev.groupBy("user_id", "event_type").agg(
        F.sum(v100).cast("bigint").alias("t")
    )
    us = us.localCheckpoint(eager=False)
    full_blocks = (
        us.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__k"))
        .where(F.col("__k") == 5)
        .select("user_id")
    )
    cb = us.join(full_blocks, "user_id")
    f = friedman_test(cb, "user_id", "event_type", "t")
    return f.select(
        "n_blocks",
        "k",
        "chi2",
        (
            F.col("chi2") / (F.col("n_blocks") * (F.col("k") - 1)).cast("double")
        ).alias("w_concordance"),
    )


@register(
    "q_stat_icc",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS ni,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS si,
             CAST(sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                           AS HUGEINT)
                      * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS HUGEINT) AS ssi
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS gg,
             CAST(sum(ni) AS BIGINT) AS nn,
             CAST(sum(CAST(ni AS HUGEINT) * ni) AS HUGEINT) AS sn2,
             CAST(sum(si) AS BIGINT) AS s_tot,
             CAST(sum(ssi) AS HUGEINT) AS ss_tot,
             sum(CAST(CAST(si AS HUGEINT) * si AS DOUBLE) / ni) AS t2
      FROM g
    ),
    v AS (
      SELECT gg, nn,
             (t2 - CAST(CAST(s_tot AS HUGEINT) * s_tot AS DOUBLE) / nn)
               / CAST(gg - 1 AS DOUBLE) AS msb,
             (CAST(ss_tot AS DOUBLE) - t2) / CAST(nn - gg AS DOUBLE) AS msw,
             (nn - CAST(sn2 AS DOUBLE) / nn) / CAST(gg - 1 AS DOUBLE) AS k0
      FROM m
    )
    SELECT gg AS n_groups, nn AS n,
           round(msb, 2) AS msb, round(msw, 2) AS msw,
           round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
    FROM v
    """,
)
def q_stat_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Intraclass correlation ICC(1,1) — one-way random effects with
    # users as groups: what fraction of `value` variance is BETWEEN
    # users (reliability of the user as a unit of analysis — the
    # clustered-experiment design-effect input). Values enter as exact
    # cent integers; the only order-sensitive moment is
    # T2 = Σ_i S_i²/n_i (a sum of per-group rationals over thousands of
    # groups — engine-ordered double addition), so icc1 carries round-6
    # and the cent²-scale msb/msw carry round-2 — absolute grids sized
    # so the half-grid dwarfs the ~1e-13-relative order error at each
    # magnitude (parity rule 5); counts stay exact. Unequal group sizes
    # use the standard k0 = (N − Σn_i²/N)/(G−1) correction. At 100 TB:
    # one user-keyed hash agg + a scalar rollup.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ni"),
        F.sum(v100).cast("bigint").alias("si"),
        F.sum(dec(v100) * v100).cast("decimal(38,0)").alias("ssi"),
    )
    m = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("gg"),
        F.sum("ni").cast("bigint").alias("nn"),
        F.sum(dec(F.col("ni")) * F.col("ni")).cast("decimal(38,0)").alias("sn2"),
        F.sum("si").cast("bigint").alias("s_tot"),
        F.sum("ssi").cast("decimal(38,0)").alias("ss_tot"),
        F.sum((dec(F.col("si")) * F.col("si")).cast("double") / F.col("ni")).alias(
            "t2"
        ),
    )
    gg, nn = F.col("gg"), F.col("nn")
    msb = (
        F.col("t2") - (dec(F.col("s_tot")) * F.col("s_tot")).cast("double") / nn
    ) / (gg - 1).cast("double")
    msw = (F.col("ss_tot").cast("double") - F.col("t2")) / (nn - gg).cast("double")
    k0 = (nn - F.col("sn2").cast("double") / nn) / (gg - 1).cast("double")
    v = m.select(
        gg.alias("n_groups"),
        nn.alias("n"),
        msb.alias("msb_raw"),
        msw.alias("msw_raw"),
        k0.alias("k0"),
    )
    return v.select(
        "n_groups",
        "n",
        F.round("msb_raw", 2).alias("msb"),
        F.round("msw_raw", 2).alias("msw"),
        F.round(
            (F.col("msb_raw") - F.col("msw_raw"))
            / (F.col("msb_raw") + (F.col("k0") - 1) * F.col("msw_raw")),
            6,
        ).alias("icc1"),
    )


# ADF shares the LR3 Cramer fragments; the extra pieces are the RSS
# identity and the (1,1) inverse-Gram cofactor for Var(b1) — shared
# text, identical trees on both engines.
_ADF_B = [
    f"{_LR3_DET0} / {_LR3_DET} AS b0",
    f"{_LR3_DET1} / {_LR3_DET} AS b1",
    f"{_LR3_DET2} / {_LR3_DET} AS b2",
]
_ADF_T = (
    "b1 / sqrt(((syy - b0 * sy - b1 * s1y - b2 * s2y) / (n - 3))"
    f" * ((n * s22 - s2 * s2) / {_LR3_DET})) AS t_adf"
)


@register(
    "q_ts_adf",
    oracle=f"""
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM c),
                                    (SELECT max(hr) FROM c))) AS hr
    ),
    d AS (
      SELECT spine.hr, COALESCE(c.x, 0) AS x
      FROM spine LEFT JOIN c USING (hr)
    ),
    r AS (
      SELECT CAST(d0.x - d1.x AS BIGINT) AS y,
             CAST(d1.x AS BIGINT) AS x1,
             CAST(d1.x - d2.x AS BIGINT) AS x2
      FROM d d0
      JOIN d d1 ON d1.hr = d0.hr - 1
      JOIN d d2 ON d2.hr = d0.hr - 2
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS s1,
             CAST(sum(x2) AS DOUBLE) AS s2,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM r
    ),
    b AS (
      SELECT *, {", ".join(_ADF_B)} FROM s
    )
    SELECT CAST(n AS BIGINT) AS n, b1 AS gamma, {_ADF_T}
    FROM b
    """,
)
def q_ts_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Augmented Dickey-Fuller unit-root test (one augmentation lag,
    # constant, no trend) on the hourly event-count series:
    # Δx_t = b0 + γ·x_{{t-1}} + b2·Δx_{{t-1}} + ε, H0: γ = 0 (unit
    # root). The is-this-series-stationary gate every forecasting
    # pipeline runs first. Lags come from the DENSE calendar spine
    # (hr-1/hr-2 equi-joins, no window over a single partition); all
    # ten regression moments are exact integers cast to double once;
    # the OLS solve reuses the shared 3x3 Cramer fragments
    # (q_ml_linreg_multi), and the t-statistic closes the form with the
    # RSS identity and the (1,1) inverse-Gram cofactor — one shared
    # expression text per engine, bit-exact, NO rounding. Compare t to
    # the Dickey-Fuller critical values (-2.86 at 5%), not the normal.
    # At 100 TB: one fact-table groupBy to the hour contingency +
    # spine joins; the fit is O(1) after the moment scan.
    ev = table(spark, sf_dir, "events")
    c = (
        ev.select(F.expr("unix_micros(ts) div 3600000000").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)  # spine bounds + three join sides
    )
    spine = c.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    d = spine.join(c, "hr", "left").select(
        "hr", F.coalesce("x", F.lit(0)).alias("x")
    ).localCheckpoint(eager=False)
    d0 = d.select(F.col("hr"), F.col("x").alias("x0"))
    d1 = d.select((F.col("hr") + 1).alias("hr"), F.col("x").alias("xl1"))
    d2 = d.select((F.col("hr") + 2).alias("hr"), F.col("x").alias("xl2"))
    r = (
        d0.join(d1, "hr")
        .join(d2, "hr")
        .select(
            (F.col("x0") - F.col("xl1")).cast("bigint").alias("y"),
            F.col("xl1").cast("bigint").alias("x1"),
            (F.col("xl1") - F.col("xl2")).cast("bigint").alias("x2"),
        )
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    s = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(dec(F.col("x1")) * F.col("x1")).cast("double").alias("s11"),
        F.sum(dec(F.col("x2")) * F.col("x2")).cast("double").alias("s22"),
        F.sum(dec(F.col("x1")) * F.col("x2")).cast("double").alias("s12"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(dec(F.col("x1")) * F.col("y")).cast("double").alias("s1y"),
        F.sum(dec(F.col("x2")) * F.col("y")).cast("double").alias("s2y"),
        F.sum(dec(F.col("y")) * F.col("y")).cast("double").alias("syy"),
    )
    b = s.selectExpr("*", *_ADF_B)
    return b.selectExpr("CAST(n AS BIGINT) AS n", "b1 AS gamma", _ADF_T)


@register(
    "q_stat_ordinal_assoc",
    oracle="""
    WITH cells AS (
      SELECT l_quantity AS x, l_linenumber AS y, CAST(count(*) AS BIGINT) AS c
      FROM lineitem
      -- same y-domain restriction the operator enforces (y IN y_values);
      -- the fixture's domain happens to be exactly 1..7, but the oracle
      -- must not rely on that accident (ADVICE r11)
      WHERE l_quantity IS NOT NULL AND l_linenumber IN (1, 2, 3, 4, 5, 6, 7)
      GROUP BY 1, 2
    ),
    p AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS HUGEINT) AS cc,
        CAST(coalesce(sum(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS HUGEINT) AS dd
      FROM cells a JOIN cells b ON a.x < b.x
    ),
    mx AS (SELECT x, CAST(sum(c) AS HUGEINT) AS nx FROM cells GROUP BY x),
    my AS (SELECT y, CAST(sum(c) AS HUGEINT) AS ny FROM cells GROUP BY y),
    m AS (
      SELECT CAST(sum(nx) AS HUGEINT) AS n,
             CAST(sum(nx * (nx - 1)) AS HUGEINT) AS tx2
      FROM mx
    ),
    m2 AS (SELECT CAST(sum(ny * (ny - 1)) AS HUGEINT) AS ty2 FROM my)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(cc AS BIGINT) AS concordant,
           CAST(dd AS BIGINT) AS discordant,
           CAST(cc - dd AS DOUBLE) / CAST(cc + dd AS DOUBLE) AS gamma,
           CAST(cc - dd AS DOUBLE) * 2
             / CAST(n * (n - 1) - tx2 AS DOUBLE) AS somers_d_yx,
           CAST(cc - dd AS DOUBLE) * 2
             / CAST(n * (n - 1) - ty2 AS DOUBLE) AS somers_d_xy
    FROM p, m, m2
    """,
)
def q_stat_ordinal_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Goodman-Kruskal gamma + both Somers' D asymmetries of quantity vs
    # line number — the ordinal-association family around Kendall's
    # tau-b (operators/stats.py: ordinal_association): gamma drops all
    # tied pairs, Somers' D_yx divides by pairs untied on x only (the
    # AUC identity D = 2·AUC−1 statistic), D_xy mirrors. Identical
    # contingency-cell + bounded-pivot + one-prefix-sum lane as
    # q_stat_kendall — never O(n²) pairs; the oracle replays from the
    # quadratic CELL join (350 rows). Exact decimal pair moments; the
    # three ratios are single double trees (no rounding).
    from trembita_spark.operators.stats import ordinal_association

    li = table(spark, sf_dir, "lineitem")
    return ordinal_association(
        li, "l_quantity", "l_linenumber", [1, 2, 3, 4, 5, 6, 7]
    )


@register(
    "q_stat_median_ci",
    oracle="""
    WITH x AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
    pv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY v),
    c AS (
      SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pv
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM pv),
    r AS (
      SELECT n,
             greatest(1, CAST(floor((n - 1.959963984540054e0 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT)) AS lo_rank,
             least(n, CAST(ceil((n + 1.959963984540054e0 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) + 1) AS hi_rank,
             (n + 1) // 2 AS med_rank
      FROM t
    )
    SELECT max(n) AS n,
           min(CASE WHEN cum >= med_rank THEN v END) AS median,
           min(CASE WHEN cum >= lo_rank THEN v END) AS ci_lo,
           min(CASE WHEN cum >= hi_rank THEN v END) AS ci_hi
    FROM c, r
    GROUP BY n
    """,
)
def q_stat_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distribution-free 95% confidence interval for the median of
    # `value`: the sign-test inversion — CI endpoints are the order
    # statistics at ranks (n ± z·√n)/2 (normal approximation to the
    # Binomial(n, ½) counting bound, z = 1.95996...; floor/ceil+1
    # convention documented here, clamped to [1, n]), median is the
    # lower (ceil(n/2)-th) order statistic. All three are
    # conditional-min selections over the value-support prefix-sum lane
    # — no sort, no interpolation, exact data values out (the ranks are
    # integers from one identical double expression, so both engines
    # select the same rows; no rounding anywhere). The uncertainty
    # companion every median report should carry. At 100 TB: one
    # value-support agg + prefix sum + one scalar filter-aggregate.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pv = ev.select(F.col("value").alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    t = pv.agg(F.sum("cnt").cast("bigint").alias("n"))
    z = F.lit(1.959963984540054)
    nd = F.col("n").cast("double")
    r = t.select(
        "n",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor((F.col("n") - z * F.sqrt(nd)) / 2).cast("bigint"),
        ).alias("lo_rank"),
        F.least(
            F.col("n"),
            F.ceil((F.col("n") + z * F.sqrt(nd)) / 2).cast("bigint") + 1,
        ).alias("hi_rank"),
        F.expr("(n + 1) div 2").alias("med_rank"),
    )
    j = c.crossJoin(F.broadcast(r))
    return j.groupBy("n").agg(
        F.min(F.when(F.col("cum") >= F.col("med_rank"), F.col("v"))).alias("median"),
        F.min(F.when(F.col("cum") >= F.col("lo_rank"), F.col("v"))).alias("ci_lo"),
        F.min(F.when(F.col("cum") >= F.col("hi_rank"), F.col("v"))).alias("ci_hi"),
    )


_BENFORD_P = {
    1: "0.3010299956639812e0", 2: "0.17609125905568124e0",
    3: "0.12493873660829992e0", 4: "0.09691001300805642e0",
    5: "0.07918124604762482e0", 6: "0.06694678963061322e0",
    7: "0.05799194697768673e0", 8: "0.05115252244738129e0",
    9: "0.04575749056067514e0",
}


def _benford_chi2_text() -> str:
    # fixed 9-term chain over the pivoted digit counts; the Benford
    # probabilities are DOUBLE LITERALS (not log10 calls), so no libm
    # enters and the chi2 is bit-exact on both engines.
    terms = []
    for d, p in _BENFORD_P.items():
        e = f"(nn * {p})"
        terms.append(f"(o{d} - {e}) * (o{d} - {e}) / {e}")
    return " + ".join(terms)


@register(
    "q_quality_benford",
    oracle=f"""
    WITH x AS (
      SELECT CAST(substring(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM events WHERE value IS NOT NULL AND value >= 1
    ),
    piv AS (
      SELECT
        {", ".join(f"CAST(count(*) FILTER (WHERE d = {d}) AS BIGINT) AS o{d}" for d in range(1, 10))},
        CAST(count(*) AS BIGINT) AS nn
      FROM x
    )
    SELECT nn AS n,
           {", ".join(f"o{d}" for d in range(1, 10))},
           {_benford_chi2_text()} AS chi2
    FROM piv
    """,
)
def q_quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford's-law first-digit audit of `value` — the classic
    # fabricated-data / corruption screen: natural multi-scale
    # magnitudes follow P(d) = log10(1+1/d), so a chi-square against
    # the Benford distribution flags synthetic or truncated feeds
    # (here it FIRES, correctly: the fixture's uniform-ish values are
    # not Benford — the audit's job is to measure, not to pass). First
    # significant digit via integer floor + string head (exact, no
    # float log); the nine Benford probabilities are hardcoded double
    # literals so no libm call enters either engine, and the chi2 is
    # one fixed 9-term chain over the pivoted counts — bit-exact, NO
    # rounding. At 100 TB: one conditional-count scan to a scalar row.
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("value") >= 1)
    )
    d = F.substring(
        F.floor(F.col("value")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    piv = ev.select(d.alias("d")).agg(
        *[
            F.sum(F.when(F.col("d") == dd, 1).otherwise(0))
            .cast("bigint")
            .alias(f"o{dd}")
            for dd in range(1, 10)
        ],
        F.count(F.lit(1)).cast("bigint").alias("nn"),
    )
    return piv.selectExpr(
        "nn AS n",
        *[f"o{dd}" for dd in range(1, 10)],
        _benford_chi2_text() + " AS chi2",
    )


@register(
    "q_stat_quade",
    oracle="""
    WITH us AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ),
    full_blocks AS (
      SELECT user_id FROM us GROUP BY user_id HAVING count(*) = 5
    ),
    cb AS (SELECT us.* FROM us JOIN full_blocks USING (user_id)),
    r AS (
      SELECT a.user_id, a.event_type,
             CAST(2 * sum(CASE WHEN b.t < a.t THEN 1 ELSE 0 END)
                  + sum(CASE WHEN b.t = a.t THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS r2
      FROM cb a JOIN cb b USING (user_id)
      GROUP BY a.user_id, a.event_type
    ),
    rng AS (
      SELECT user_id, CAST(max(t) - min(t) AS BIGINT) AS rg
      FROM cb GROUP BY user_id
    ),
    rv AS (SELECT rg, CAST(count(*) AS BIGINT) AS cnt FROM rng GROUP BY rg),
    wr AS (
      SELECT rg,
             2 * (CAST(sum(cnt) OVER (ORDER BY rg ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  - cnt) + cnt + 1 AS w2
      FROM rv
    ),
    q AS (
      SELECT r.event_type,
             CAST(w2 AS HUGEINT) * (r2 - 6) AS q4
      FROM r JOIN rng USING (user_id) JOIN wr USING (rg)
    ),
    sj AS (
      SELECT event_type, CAST(sum(q4) AS HUGEINT) AS s4
      FROM q GROUP BY event_type
    ),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM full_blocks) AS n_blocks,
             (SELECT CAST(count(*) AS BIGINT) FROM sj) AS k,
             (SELECT CAST(sum(CAST(q4 AS HUGEINT) * q4) AS HUGEINT) FROM q) AS a16,
             (SELECT CAST(sum(s4 * s4) AS HUGEINT) FROM sj) AS b16n
    )
    SELECT n_blocks, k,
           CAST((n_blocks - 1) AS DOUBLE) * CAST(b16n AS DOUBLE)
             / (CAST(n_blocks AS DOUBLE) * CAST(a16 AS DOUBLE)
                - CAST(b16n AS DOUBLE)) AS f_quade
    FROM m
    """,
)
def q_stat_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quade test — the range-weighted Friedman: blocks (users) with
    # larger spend RANGES carry more weight, recovering power Friedman
    # throws away when treatment effects scale with block level. All
    # rank algebra stays in doubled-integer lanes: within-block
    # midranks r2 (the k2 self-join), block-range ranks w2 (one
    # value-support prefix sum over the exact cent ranges), and the
    # scaled score q4 = w2*(r2 - (k+1)) = 4*w_b*(r_bj - (k+1)/2), whose
    # uniform 4x scaling cancels in F = (n-1)*B/(A-B) computed as
    # (n-1)*SUM(S_j^2) / (n*SUM(q4^2) - SUM(S_j^2)) - exact
    # HUGEINT/decimal moments, ONE final double tree, no rounding.
    # (k+1) = 6 is a literal: the treatment domain is the five event
    # types, same convention as q_stat_friedman. At 100 TB: two
    # user-key shuffles + one value-support prefix + a 5-row rollup.
    from trembita_spark.operators.ranking import prefix_sum
    from trembita_spark.operators.stats import friedman_test  # noqa: F401 — lane kin

    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    us = ev.groupBy("user_id", "event_type").agg(
        F.sum(v100).cast("bigint").alias("t")
    )
    us = us.localCheckpoint(eager=False)
    full_blocks = (
        us.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__k"))
        .where(F.col("__k") == 5)
        .select("user_id")
    )
    cb = us.join(full_blocks, "user_id").localCheckpoint(eager=False)
    b = cb.select(
        F.col("user_id"), F.col("event_type").alias("trt_b"), F.col("t").alias("t_b")
    )
    r = (
        cb.join(b, "user_id")
        .groupBy("user_id", "event_type")
        .agg(
            (
                2 * F.sum(F.when(F.col("t_b") < F.col("t"), 1).otherwise(0))
                + F.sum(F.when(F.col("t_b") == F.col("t"), 1).otherwise(0))
                + 1
            ).cast("bigint").alias("r2")
        )
    )
    rng = cb.groupBy("user_id").agg((F.max("t") - F.min("t")).cast("bigint").alias("rg"))
    rv = rng.groupBy("rg").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wr = prefix_sum(rv, "cnt", order_by=[F.col("rg")], name="cum").select(
        "rg", (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1).alias("w2")
    )
    q = (
        r.join(rng, "user_id")
        .join(wr, "rg")
        .select("event_type", (dec(F.col("w2")) * (F.col("r2") - 6)).alias("q4"))
    )
    q = q.localCheckpoint(eager=False)  # feeds a16 + the per-treatment rollup
    sj = q.groupBy("event_type").agg(F.sum("q4").cast("decimal(38,0)").alias("s4"))
    m = (
        q.agg(F.sum(F.col("q4") * F.col("q4")).cast("decimal(38,0)").alias("a16"))
        .crossJoin(
            F.broadcast(
                sj.agg(
                    F.count(F.lit(1)).cast("bigint").alias("k"),
                    F.sum(F.col("s4") * F.col("s4"))
                    .cast("decimal(38,0)")
                    .alias("b16n"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                full_blocks.agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"))
            )
        )
    )
    nb = F.col("n_blocks")
    return m.select(
        "n_blocks",
        "k",
        (
            (nb - 1).cast("double") * F.col("b16n").cast("double")
            / (
                nb.cast("double") * F.col("a16").cast("double")
                - F.col("b16n").cast("double")
            )
        ).alias("f_quade"),
    )


@register(
    "q_ts_cointegration",
    oracle="""
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS hr,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM c),
                                    (SELECT max(hr) FROM c))) AS hr
    ),
    d AS (
      SELECT spine.hr, COALESCE(c.x, 0) AS x, COALESCE(c.y, 0) AS y
      FROM spine LEFT JOIN c USING (hr)
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      FROM d
    ),
    co AS (
      SELECT n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
      FROM s
    ),
    e AS (
      SELECT d.hr, d.y - a - b * d.x AS res, a, b, n
      FROM d, co
    ),
    p AS (
      SELECT e0.res - e1.res AS de, e1.res AS el, e0.a, e0.b, e0.n
      FROM e e0 JOIN e e1 ON e1.hr = e0.hr - 1
    ),
    m AS (
      SELECT max(a) AS a, max(b) AS b, max(n) AS n,
             CAST(count(*) AS BIGINT) AS m,
             sum(el * de) AS s1, sum(el * el) AS s2, sum(de * de) AS s3
      FROM p
    )
    SELECT n, b AS b_coint,
           round(s1 / s2, 6) AS gamma_resid,
           round((s1 / s2)
                 / sqrt(((s3 - 2 * (s1 / s2) * s1 + (s1 / s2) * (s1 / s2) * s2)
                         / (m - 1)) / s2), 6) AS t_eg
    FROM m
    """,
)
def q_ts_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Engle-Granger two-stage cointegration test between the hourly
    # click and purchase count series: stage 1 fits the long-run
    # relation y = a + b·x by OLS (closed form over exact integer
    # moments — b_coint is bit-exact, no rounding); stage 2 runs a
    # Dickey-Fuller regression WITHOUT constant on the residuals
    # (Δe_t = γ·e_{t−1}): if the residuals mean-revert (t_eg below the
    # Engle-Granger critical value, ≈−3.34 at 5%), the two series are
    # cointegrated — the pairs-trading / KPI-coupling question. The
    # residuals are per-row doubles (identical trees), but their
    # moment SUMS are engine-ordered → γ and t_eg carry round-6
    # (parity rule 5; relative order error ~1e-13 ≪ the 5e-7
    # half-grid at these ~1-magnitude values). RSS uses the identity
    # Σ(Δe−γe)² = s3 − 2γs1 + γ²s2 — no second pass. At 100 TB: one
    # fact groupBy to the hour contingency, spine joins, two scalar
    # rollups.
    ev = table(spark, sf_dir, "events")
    c = (
        ev.select(
            F.expr("unix_micros(ts) div 3600000000").alias("hr"), "event_type"
        )
        .groupBy("hr")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    spine = c.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    d = (
        spine.join(c, "hr", "left")
        .select(
            "hr",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(dec(F.col("x")) * F.col("x")).cast("double").alias("sxx"),
        F.sum(dec(F.col("x")) * F.col("y")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    b_expr = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    co = s.select(
        "n", b_expr.alias("b"), ((F.col("sy") - b_expr * F.col("sx")) / nd).alias("a")
    )
    e = d.crossJoin(F.broadcast(co)).select(
        "hr",
        (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("res"),
        "a",
        "b",
        "n",
    )
    e0 = e
    e1 = e.select((F.col("hr") + 1).alias("hr"), F.col("res").alias("res_l"))
    p = e0.join(e1, "hr").select(
        (F.col("res") - F.col("res_l")).alias("de"),
        F.col("res_l").alias("el"),
        "a",
        "b",
        "n",
    )
    m = p.agg(
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("el") * F.col("de")).alias("s1"),
        F.sum(F.col("el") * F.col("el")).alias("s2"),
        F.sum(F.col("de") * F.col("de")).alias("s3"),
    )
    g = F.col("s1") / F.col("s2")
    return m.select(
        "n",
        F.col("b").alias("b_coint"),
        F.round(g, 6).alias("gamma_resid"),
        F.round(
            g
            / F.sqrt(
                (
                    (F.col("s3") - 2 * g * F.col("s1") + g * g * F.col("s2"))
                    / (F.col("m") - 1)
                )
                / F.col("s2")
            ),
            6,
        ).alias("t_eg"),
    )


@register(
    "q_ts_variance_ratio",
    oracle="""
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM c),
                                    (SELECT max(hr) FROM c))) AS hr
    ),
    d AS (
      SELECT spine.hr, COALESCE(c.x, 0) AS x
      FROM spine LEFT JOIN c USING (hr)
    ),
    d1 AS (
      SELECT CAST(a.x - b.x AS BIGINT) AS dx
      FROM d a JOIN d b ON b.hr = a.hr - 1
    ),
    dq AS (
      SELECT CAST(a.x - b.x AS BIGINT) AS dq
      FROM d a JOIN d b ON b.hr = a.hr - 4
    ),
    m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(dx) AS BIGINT) AS s1,
             CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS ss1
      FROM d1
    ),
    mq AS (
      SELECT CAST(count(*) AS BIGINT) AS nq,
             CAST(sum(dq) AS BIGINT) AS sq,
             CAST(sum(CAST(dq AS HUGEINT) * dq) AS HUGEINT) AS ssq
      FROM dq
    )
    SELECT n1 AS n,
           (CAST(nq AS DOUBLE) * CAST(ssq AS DOUBLE) - CAST(CAST(sq AS HUGEINT) * sq AS DOUBLE))
             / (CAST(nq AS DOUBLE) * nq)
             / (4 * ((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE) - CAST(CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) * n1))) AS vr4,
           ((CAST(nq AS DOUBLE) * CAST(ssq AS DOUBLE) - CAST(CAST(sq AS HUGEINT) * sq AS DOUBLE))
             / (CAST(nq AS DOUBLE) * nq)
             / (4 * ((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE) - CAST(CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) * n1))) - 1)
             / sqrt(2.0e0 * (2 * 4 - 1) * (4 - 1) / (3.0e0 * 4 * n1)) AS z_vr
    FROM m1, mq
    """,
)
def q_ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lo-MacKinlay variance-ratio test (q = 4) on the hourly
    # event-count series: VR(q) = Var(q-period differences) /
    # (q·Var(1-period differences)) — 1 under a random walk, < 1 under
    # mean reversion, > 1 under momentum/trending; the
    # is-this-a-random-walk companion to q_ts_adf. Both difference
    # series come from dense-spine hr−1 / hr−4 equi-joins; all moments
    # are exact integers (population variances, the Lo-MacKinlay
    # convention), and VR and the homoscedastic z are single double
    # trees over them — bit-exact, NO rounding. At 100 TB: one
    # fact-table groupBy to the hour contingency + two spine joins +
    # two scalar rollups.
    ev = table(spark, sf_dir, "events")
    c = (
        ev.select(F.expr("unix_micros(ts) div 3600000000").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)
    )
    spine = c.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    d = (
        spine.join(c, "hr", "left")
        .select("hr", F.coalesce("x", F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731

    def diff_moments(lag: int, pre: str):
        b = d.select((F.col("hr") + lag).alias("hr"), F.col("x").alias("xl"))
        dd = d.join(b, "hr").select((F.col("x") - F.col("xl")).cast("bigint").alias("dx"))
        return dd.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n{pre}"),
            F.sum("dx").cast("bigint").alias(f"s{pre}"),
            F.sum(dec(F.col("dx")) * F.col("dx")).cast("decimal(38,0)").alias(f"ss{pre}"),
        )
    m = diff_moments(1, "1").crossJoin(F.broadcast(diff_moments(4, "q")))
    n1d = F.col("n1").cast("double")
    nqd = F.col("nq").cast("double")
    var1 = (n1d * F.col("ss1").cast("double")
            - (dec(F.col("s1")) * F.col("s1")).cast("double")) / (n1d * F.col("n1"))
    varq = (nqd * F.col("ssq").cast("double")
            - (dec(F.col("sq")) * F.col("sq")).cast("double")) / (nqd * F.col("nq"))
    vr = varq / (4 * var1)
    return m.select(
        F.col("n1").alias("n"),
        vr.alias("vr4"),
        (
            (vr - 1)
            / F.sqrt(F.lit(2.0) * (2 * 4 - 1) * (4 - 1) / (F.lit(3.0) * 4 * n1d))
        ).alias("z_vr"),
    )


_NEYMAN_TYPES = ("click", "error", "purchase", "signup", "view")


def _neyman_w(i: int) -> str:
    # N_h * S_h with the sample SD from exact cent moments — one
    # identical double tree per stratum on both engines.
    return (
        f"(n{i} * sqrt((CAST(n{i} AS DOUBLE) * CAST(ss{i} AS DOUBLE)"
        f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
        f" / (CAST(n{i} AS DOUBLE) * (n{i} - 1))))"
    )


@register(
    "q_agg_neyman_allocation",
    oracle=f"""
    WITH piv AS (
      SELECT
        {", ".join(
            f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n{i}, "
            f"CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) FILTER (WHERE event_type = '{t}') AS BIGINT) AS s{i}, "
            f"CAST(sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)"
            f" * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) FILTER (WHERE event_type = '{t}') AS HUGEINT) AS ss{i}"
            for i, t in enumerate(_NEYMAN_TYPES))}
      FROM events WHERE value IS NOT NULL
    ),
    w AS (
      SELECT *,
        {", ".join(f"{_neyman_w(i)} AS w{i}" for i in range(5))}
      FROM piv
    ),
    tot AS (SELECT *, w0 + w1 + w2 + w3 + w4 AS wt FROM w)
    {" UNION ALL ".join(
        ("SELECT '" + t + "' AS stratum, n" + str(i) + " AS n_rows, "
         "w" + str(i) + " / n" + str(i) + " AS sd_cents, "
         "w" + str(i) + " / wt AS alloc_frac FROM tot")
        for i, t in enumerate(_NEYMAN_TYPES))}
    """,
)
def q_agg_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Neyman optimal allocation for stratified sampling: given strata
    # (event types) with sizes N_h and spend SDs S_h, the
    # variance-minimizing sample allocates n_h ∝ N_h·S_h — the
    # survey-design rule every stratified data-collection (and
    # stratified eval-set construction) should use instead of
    # proportional allocation when strata differ in spread. All
    # moments are exact cent integers pivoted to ONE scalar row; each
    # stratum's N_h·S_h and the allocation fractions are identical
    # double trees with the 5-term total written in fixed literal
    # order — bit-exact, no rounding. At 100 TB: one conditional-
    # aggregate scan; pairs with q_sampling_stratified for execution.
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    piv = ev.agg(
        *[
            agg
            for i, t in enumerate(_NEYMAN_TYPES)
            for agg in (
                F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n{i}"),
                F.sum(F.when(F.col("event_type") == t, v100).otherwise(0))
                .cast("bigint")
                .alias(f"s{i}"),
                F.sum(
                    F.when(F.col("event_type") == t, dec(v100) * v100).otherwise(
                        F.lit(0).cast("decimal(38,0)")
                    )
                )
                .cast("decimal(38,0)")
                .alias(f"ss{i}"),
            )
        ]
    )
    w = piv.selectExpr("*", *[f"{_neyman_w(i)} AS w{i}" for i in range(5)])
    tot = w.selectExpr("*", "w0 + w1 + w2 + w3 + w4 AS wt")
    return tot.selectExpr(
        "stack(5, "
        + ", ".join(
            f"'{t}', n{i}, w{i} / n{i}, w{i} / wt"
            for i, t in enumerate(_NEYMAN_TYPES)
        )
        + ") AS (stratum, n_rows, sd_cents, alloc_frac)"
    )


def _mh_terms(expr: str) -> str:
    # fixed 7-term chain over the per-stratum pivoted cells
    return " + ".join(expr.format(i=i) for i in range(7))


@register(
    "q_stat_mantel_haenszel",
    oracle=f"""
    WITH x AS (
      SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             CASE WHEN value >= 50 THEN 1 ELSE 0 END AS e,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    piv AS (
      SELECT
        {", ".join(
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 1 AND y = 1) AS BIGINT) AS a{i}, "
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 1 AND y = 0) AS BIGINT) AS b{i}, "
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 0 AND y = 1) AS BIGINT) AS c{i}, "
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 0 AND y = 0) AS BIGINT) AS d{i}"
            for i in range(7))}
      FROM x
    ),
    t AS (
      SELECT *,
        {", ".join(f"CAST(a{i} + b{i} + c{i} + d{i} AS BIGINT) AS n{i}" for i in range(7))}
      FROM piv
    )
    SELECT {_mh_terms("n{i}")} AS n,
           ({_mh_terms("CAST(CAST(a{i} AS HUGEINT) * d{i} AS DOUBLE) / n{i}")})
             / ({_mh_terms("CAST(CAST(b{i} AS HUGEINT) * c{i} AS DOUBLE) / n{i}")})
             AS or_mh,
           {_mh_terms("CAST(CAST(a{i} AS HUGEINT) * d{i} AS DOUBLE) / n{i}")} AS r_sum,
           {_mh_terms("CAST(CAST(b{i} AS HUGEINT) * c{i} AS DOUBLE) / n{i}")} AS s_sum
    FROM t
    """,
)
def q_stat_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mantel-Haenszel common odds ratio: the association between
    # high-value events (value >= 50) and purchasing, ADJUSTED for
    # day-of-week strata — the stratified-2x2 estimator that defeats
    # Simpson's paradox (a crude pooled OR can reverse sign when the
    # strata differ). OR_MH = SUM(a_i*d_i/n_i) / SUM(b_i*c_i/n_i) over
    # the 7 strata. Day of week derives from integer epoch-day
    # arithmetic ((days + 4) mod 7 — 1970-01-01 was a Thursday) so the
    # strata are engine-identical (Spark's dayofweek() and DuckDB's
    # disagree on numbering — the q_ml_poisson lesson). One
    # conditional-count scan to a 28-cell scalar row; both sums are
    # FIXED 7-term chains — bit-exact, no rounding. At 100 TB: one
    # scan, O(1) after it.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    dow = F.expr("(unix_micros(ts) div 86400000000 + 4) % 7")
    e = F.when(F.col("value") >= 50, 1).otherwise(0)
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    x = ev.select(dow.alias("dow"), e.alias("e"), y.alias("y"))
    piv = x.agg(
        *[
            agg
            for i in range(7)
            for agg in (
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0)).cast("bigint").alias(f"a{i}"),
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 1) & (F.col("y") == 0), 1).otherwise(0)).cast("bigint").alias(f"b{i}"),
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 0) & (F.col("y") == 1), 1).otherwise(0)).cast("bigint").alias(f"c{i}"),
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 0) & (F.col("y") == 0), 1).otherwise(0)).cast("bigint").alias(f"d{i}"),
            )
        ]
    )
    t = piv.selectExpr(
        "*", *[f"CAST(a{i} + b{i} + c{i} + d{i} AS BIGINT) AS n{i}" for i in range(7)]
    )
    r_txt = _mh_terms("CAST(CAST(a{i} AS DECIMAL(38,0)) * d{i} AS DOUBLE) / n{i}")
    s_txt = _mh_terms("CAST(CAST(b{i} AS DECIMAL(38,0)) * c{i} AS DOUBLE) / n{i}")
    return t.selectExpr(
        _mh_terms("n{i}") + " AS n",
        f"({r_txt}) / ({s_txt}) AS or_mh",
        f"{r_txt} AS r_sum",
        f"{s_txt} AS s_sum",
    )


@register(
    "q_stat_cuped",
    oracle="""
    WITH mid AS (
      SELECT epoch_us(min(ts)) + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS m
      FROM events
    ),
    per AS (
      SELECT user_id,
             CAST(sum(CASE WHEN epoch_us(ts) < m
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN epoch_us(ts) >= m
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
      FROM events, mid
      WHERE value IS NOT NULL
      GROUP BY user_id, m
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM per
    )
    SELECT n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho2
    FROM s
    """,
)
def q_stat_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CUPED (Controlled-experiment Using Pre-Existing Data): the
    # industry-standard A/B variance-reduction preprocessing — adjust
    # each user's experiment-period metric Y by θ·(X − X̄) where X is
    # the same user's PRE-period metric and θ = cov(X,Y)/var(X); the
    # adjusted metric's variance shrinks by exactly ρ² (the fraction
    # reported here — rho2 = 0.2 means 20% fewer users for the same
    # power). Pre/post split at the fixture's temporal midpoint
    # (integer epoch-µs arithmetic, engine-identical); per-user spend
    # enters as exact cent integers, all six moments are exact
    # HUGEINT/decimal, and θ/ρ² are single double trees — bit-exact,
    # NO rounding. At 100 TB: one user-keyed agg + a scalar rollup.
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    mid = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor(
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 2
            ).cast("bigint")
        ).alias("m")
    )
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.unix_micros("ts") < F.col("m"), v100).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.unix_micros("ts") >= F.col("m"), v100).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dec(F.col("x")) * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(dec(F.col("x")) * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cxy = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    return s.select(
        "n",
        (cxy / vx).alias("theta"),
        ((cxy * cxy) / (vx * vy)).alias("rho2"),
    )


@register(
    "q_stat_srm",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id,
             CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 AS BIGINT) AS arm
      FROM events
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(arm) AS BIGINT) AS n1
      FROM u
    )
    SELECT n, n - n1 AS n_arm0, n1 AS n_arm1,
           (CAST(n - n1 AS DOUBLE) - CAST(n AS DOUBLE) / 2)
             * (CAST(n - n1 AS DOUBLE) - CAST(n AS DOUBLE) / 2)
             / (CAST(n AS DOUBLE) / 2)
           + (CAST(n1 AS DOUBLE) - CAST(n AS DOUBLE) / 2)
             * (CAST(n1 AS DOUBLE) - CAST(n AS DOUBLE) / 2)
             / (CAST(n AS DOUBLE) / 2) AS chi2_srm
    FROM c
    """,
)
def q_stat_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sample-ratio-mismatch guardrail: deterministically hash-assign
    # every user to one of two arms (md5 head, the repo's RNG-free
    # bucketing convention — exactly how a real experiment assigns) and
    # chi-square the realized split against the designed 50/50. SRM is
    # the first thing a trustworthy A/B platform checks — a significant
    # chi2 means the assignment or logging pipeline is broken and every
    # downstream p-value is garbage. All counts exact; chi2 is one
    # fixed 2-cell double chain — bit-exact, no rounding. At 100 TB:
    # one distinct + one scalar rollup.
    ev = table(spark, sf_dir, "events")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
    )
    u = ev.select("user_id").distinct().select("user_id", arm.alias("arm"))
    c = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("arm").cast("bigint").alias("n1"),
    )
    nd = F.col("n").cast("double")
    e = nd / 2
    a0 = (F.col("n") - F.col("n1")).cast("double")
    a1 = F.col("n1").cast("double")
    return c.select(
        "n",
        (F.col("n") - F.col("n1")).alias("n_arm0"),
        F.col("n1").alias("n_arm1"),
        ((a0 - e) * (a0 - e) / e + (a1 - e) * (a1 - e) / e).alias("chi2_srm"),
    )


@register(
    "q_ts_kpss",
    oracle="""
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM c),
                                    (SELECT max(hr) FROM c))) AS hr
    ),
    d AS (
      SELECT spine.hr, COALESCE(c.x, 0) AS x
      FROM spine LEFT JOIN c USING (hr)
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM d
    ),
    cu AS (
      SELECT hr,
             CAST(sum(x) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS i,
             x
      FROM d
    ),
    num AS (
      SELECT sum(CAST(CAST(n AS HUGEINT) * cum - i * s AS HUGEINT)
                 * (CAST(n AS HUGEINT) * cum - i * s)) AS ssn
      FROM cu, t
    ),
    g0 AS (
      SELECT sum(CAST(CAST(n AS HUGEINT) * x - s AS HUGEINT)
                 * (CAST(n AS HUGEINT) * x - s)) AS g
      FROM d, t
    ),
    gl AS (
      SELECT l.l,
             sum(CAST(CAST(n AS HUGEINT) * a.x - s AS HUGEINT)
                 * (CAST(n AS HUGEINT) * b.x - s)) AS g
      FROM d a
      JOIN (SELECT unnest([1, 2, 3, 4]) AS l) l ON true
      JOIN d b ON b.hr = a.hr - l.l
      CROSS JOIN t
      GROUP BY l.l
    ),
    lr AS (
      SELECT CAST((SELECT g FROM g0) AS DOUBLE)
             + 2 * (CAST((SELECT g FROM gl WHERE l = 1) AS DOUBLE) * 4 / 5
                    + CAST((SELECT g FROM gl WHERE l = 2) AS DOUBLE) * 3 / 5
                    + CAST((SELECT g FROM gl WHERE l = 3) AS DOUBLE) * 2 / 5
                    + CAST((SELECT g FROM gl WHERE l = 4) AS DOUBLE) * 1 / 5)
               AS s2n3
      FROM t
    )
    SELECT n,
           CAST((SELECT ssn FROM num) AS DOUBLE)
             / CAST(n AS DOUBLE) / s2n3 AS kpss_stat
    FROM t, lr
    """,
)
def q_ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KPSS level-stationarity test on the hourly count series — the
    # null-reversed complement to q_ts_adf (KPSS H0 = stationary, ADF
    # H0 = unit root; running both gives the standard four-quadrant read).
    # η = N^-2·Σ S_t² / s²(q) with S_t the demeaned partial sums and
    # s²(q) the Bartlett long-run variance (q = 4). EVERYTHING is
    # exact integer algebra until one final division chain: the scaled
    # partial sum N·S_t = N·cum_t − t·S is an exact integer (no
    # per-row double mean ever subtracted), Σ(N·S_t)² rides HUGEINT/
    # decimal, and each scaled autocovariance Σ(N·x_t − S)(N·x_{t−l} −
    # S) is exact too; the Bartlett weights (1 − l/(q+1)) enter as
    # exact rationals 4/5..1/5. Scale bookkeeping: Σ(N·S_t)² = N²·ΣS_t²
    # and the scaled autocovariance sums are N³·γ_l, so η = ssn/(N·s2n3)
    # — the single-N divisor is numpy-validated (the first cut divided
    # by N² on BOTH engines and parity alone could not catch it: shared
    # algebra errors are exactly what the external cross-check is for).
    # Bit-exact, NO rounding (unlike most KPSS implementations, which
    # demean in floats). At 100 TB: spine
    # prefix sum + four lag joins on the calendar frame.
    from trembita_spark.operators.ranking import prefix_sum_multi

    ev = table(spark, sf_dir, "events")
    c = (
        ev.select(F.expr("unix_micros(ts) div 3600000000").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)
    )
    spine = c.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    d = (
        spine.join(c, "hr", "left")
        .select("hr", F.coalesce("x", F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    t = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cu = prefix_sum_multi(
        d.withColumn("one", F.lit(1)),
        ["x", "one"],
        order_by=[F.col("hr")],
        names=["cum", "i"],
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ns_t = dec(F.col("n")) * F.col("cum") - dec(F.col("i")) * F.col("s")
    num = cu.crossJoin(F.broadcast(t)).agg(
        F.sum(ns_t * ns_t).cast("decimal(38,0)").alias("ssn")
    )
    e_t = dec(F.col("n")) * F.col("x") - F.col("s")
    g0 = d.crossJoin(F.broadcast(t)).agg(
        F.sum(e_t * e_t).cast("decimal(38,0)").alias("g0")
    )
    lags = {}
    for lag in (1, 2, 3, 4):
        b = d.select((F.col("hr") + lag).alias("hr"), F.col("x").alias("xl"))
        e_a = dec(F.col("n")) * F.col("x") - F.col("s")
        e_b = dec(F.col("n")) * F.col("xl") - F.col("s")
        lags[lag] = (
            d.join(b, "hr")
            .crossJoin(F.broadcast(t))
            .agg(F.sum(e_a * e_b).cast("decimal(38,0)").alias(f"g{lag}"))
        )
    m = t.crossJoin(F.broadcast(num)).crossJoin(F.broadcast(g0))
    for lag in (1, 2, 3, 4):
        m = m.crossJoin(F.broadcast(lags[lag]))
    s2n3 = (
        F.col("g0").cast("double")
        + 2
        * (
            F.col("g1").cast("double") * 4 / 5
            + F.col("g2").cast("double") * 3 / 5
            + F.col("g3").cast("double") * 2 / 5
            + F.col("g4").cast("double") * 1 / 5
        )
    )
    return m.select(
        "n",
        (
            F.col("ssn").cast("double")
            / F.col("n").cast("double")
            / s2n3
        ).alias("kpss_stat"),
    )


@register(
    "q_agg_lorenz",
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    pv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY v),
    c AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(CAST(v AS HUGEINT) * cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cumv
      FROM pv
    ),
    t AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(CAST(v AS HUGEINT) * cnt) AS HUGEINT) AS s
      FROM pv
    ),
    g AS (
      SELECT CAST((10 * CAST(cum AS HUGEINT) + n - 1) // n AS BIGINT) AS dl,
             max(cumv) AS mv
      FROM c, t
      GROUP BY 1
    ),
    dec_ AS (SELECT unnest(generate_series(1, 10)) AS d),
    pts AS (
      SELECT d, coalesce(max(CASE WHEN dl <= d THEN mv END), 0) AS below
      FROM g, dec_
      GROUP BY d
    )
    SELECT d AS decile,
           CAST(below AS DOUBLE) / CAST((SELECT s FROM t) AS DOUBLE) AS cum_share
    FROM pts
    """,
)
def q_agg_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lorenz curve sample points — the inequality curve behind
    # q_agg_gini, reported as the cumulative spend share held by the
    # bottom d/10 of events for d = 1..10 (L(1.0) = 1 closes the
    # curve). Point definition kept EXACT and integral: "below" at
    # decile d = the running cent total of the largest value-support
    # prefix whose population count satisfies cum·10 ≤ n·d (no
    # interpolation — a data-defined step function both engines agree
    # on exactly). One value-support prefix pass carries both running
    # count and running cent total; each support row then maps to its
    # MINIMAL qualifying decile dl = ceil(10·cum/n) (exact integer
    # division) and collapses to a ≤10-row (dl, max cumv) frame, so
    # the decile lookups are a config-sized join — the data-bearing
    # frame never cross-joins the spine. Output is ten exact-integer
    # ratios — bit-exact, no rounding. At 100 TB: value-support work
    # only.
    from trembita_spark.operators.ranking import prefix_sum_multi

    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    pv = ev.select(v100.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    pv = pv.withColumn("vw", (dec(F.col("v")) * F.col("cnt")).cast("decimal(38,0)"))
    c = prefix_sum_multi(
        pv, ["cnt", "vw"], order_by=[F.col("v")], names=["cum", "cumv"]
    )
    t = pv.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("vw").cast("decimal(38,0)").alias("s"),
    )
    g = (
        c.crossJoin(F.broadcast(t))
        .select(
            F.expr("CAST((10 * CAST(cum AS DECIMAL(38,0)) + n - 1) div n AS BIGINT)").alias("dl"),
            "cumv",
            "s",
        )
        .groupBy("dl")
        .agg(F.max("cumv").alias("mv"), F.max("s").alias("s"))
    )
    decs = ev.sparkSession.range(1, 11).select(F.col("id").alias("d"))
    pts = (
        g.crossJoin(F.broadcast(decs))
        .groupBy("d")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("dl") <= F.col("d"), F.col("mv"))),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("below"),
            F.max("s").alias("s"),
        )
    )
    return pts.select(
        F.col("d").alias("decile"),
        (F.col("below").cast("double") / F.col("s").cast("double")).alias(
            "cum_share"
        ),
    )


@register(
    "q_stat_power_mde",
    oracle="""
    WITH per AS (
      SELECT user_id,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM per
    )
    SELECT n,
           CAST(sy AS DOUBLE) / n AS mean_cents,
           sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1))
             AS sd_cents,
           (1.959963984540054e0 + 0.8416212335729143e0)
             * sqrt(2 * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1))
                    / (CAST(n AS DOUBLE) / 2)) AS mde_cents,
           (1.959963984540054e0 + 0.8416212335729143e0)
             * sqrt(2 * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1))
                    / (CAST(n AS DOUBLE) / 2))
             / (CAST(sy AS DOUBLE) / n) AS mde_rel
    FROM s
    """,
)
def q_stat_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Experiment power planning: the minimum detectable effect (MDE)
    # of a two-arm test that splits THIS user population 50/50 on
    # per-user spend — MDE = (z_{α/2} + z_β)·sqrt(2σ²/n_arm) at
    # α = 0.05 two-sided, 80% power (z constants are hardcoded double
    # literals, so no inverse-normal call enters either engine). The
    # question every A/B design review asks first: "can this
    # population even detect the lift you're claiming?" Moments are
    # exact cent integers; sd/MDE are single double trees — bit-exact,
    # NO rounding. At 100 TB: one user agg + a scalar rollup; pairs
    # with q_stat_srm (trust) and q_stat_cuped (shrinking this MDE by
    # sqrt(1−ρ²)).
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    per = ev.groupBy("user_id").agg(F.sum(v100).cast("bigint").alias("y"))
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dec(F.col("y")) * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n")
    var = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / n
    ) / (n - 1)
    z = F.lit(1.959963984540054) + F.lit(0.8416212335729143)
    mde = z * F.sqrt(2 * var / (n.cast("double") / 2))
    return s.select(
        "n",
        (F.col("sy").cast("double") / n).alias("mean_cents"),
        F.sqrt(var).alias("sd_cents"),
        mde.alias("mde_cents"),
        (mde / (F.col("sy").cast("double") / n)).alias("mde_rel"),
    )


@register(
    "q_agg_hill_tail_index",
    oracle="""
    WITH top AS (
      SELECT value AS v FROM events
      WHERE value IS NOT NULL AND value > 0
      ORDER BY value DESC, event_id
      LIMIT 100
    ),
    xk AS (SELECT min(v) AS vk FROM top),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             sum(ln(v / vk)) AS slog
      FROM top, xk
    )
    SELECT k,
           round(slog / k, 6) AS hill_xi,
           round(CAST(k AS DOUBLE) / slog, 6) AS tail_alpha
    FROM m
    """,
)
def q_agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hill estimator of the tail index over the top-100 order
    # statistics of `value`: ξ = (1/k)·Σ ln(x_(i)/x_(k)) and
    # α = 1/ξ — the heavy-tail diagnostic behind "is p99 even finite
    # to estimate?" (α ≤ 2 means infinite variance; α ≤ 1 infinite
    # mean — SLO math changes regime). The top-k multiset is selected
    # under a UNIQUE total order (value desc, event_id) so boundary
    # ties resolve identically on both engines (a TakeOrdered, never a
    # global sort); the k=100 log terms are identical addends whose
    # SUM is engine-ordered + libm ln → round-6 on ξ and α (parity
    # rule 5), k exact. At 100 TB: one top-k + a 100-row rollup.
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    top = (
        ev.select(F.col("value").alias("v"), "event_id")
        .orderBy(F.col("v").desc(), F.col("event_id"))
        .limit(100)
    )
    xk = top.agg(F.min("v").alias("vk"))
    m = top.crossJoin(F.broadcast(xk)).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.log(F.col("v") / F.col("vk"))).alias("slog"),
    )
    return m.select(
        "k",
        F.round(F.col("slog") / F.col("k"), 6).alias("hill_xi"),
        F.round(F.col("k").cast("double") / F.col("slog"), 6).alias("tail_alpha"),
    )


@register(
    "q_stat_risk_ratio",
    oracle="""
    WITH t AS (
      SELECT CAST(count(*) FILTER (WHERE hour(ts) >= 12 AND event_type = 'purchase') AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE hour(ts) >= 12 AND event_type <> 'purchase') AS BIGINT) AS b,
             CAST(count(*) FILTER (WHERE hour(ts) < 12 AND event_type = 'purchase') AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE hour(ts) < 12 AND event_type <> 'purchase') AS BIGINT) AS d
      FROM events
    ),
    r AS (
      SELECT a, b, c, d,
             CAST(a AS DOUBLE) / (a + b) AS p1,
             CAST(c AS DOUBLE) / (c + d) AS p0
      FROM t
    )
    SELECT a + b + c + d AS n,
           round(p1 / p0, 12) AS rr,
           round(exp(ln(p1 / p0)
                     - 1.959963984540054e0
                       * sqrt(CAST(b AS DOUBLE) / a / (a + b)
                              + CAST(d AS DOUBLE) / c / (c + d))), 12) AS rr_lo,
           round(exp(ln(p1 / p0)
                     + 1.959963984540054e0
                       * sqrt(CAST(b AS DOUBLE) / a / (a + b)
                              + CAST(d AS DOUBLE) / c / (c + d))), 12) AS rr_hi,
           round(p1 - p0, 12) AS risk_diff,
           round(1.0e0 / (p1 - p0), 6) AS nnt
    FROM r
    """,
)
def q_stat_risk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Relative risk with the Katz log 95% CI, plus the absolute
    # measures epidemiology and A/B readouts actually act on: risk
    # difference (attributable risk) and number-needed-to-treat
    # 1/(p1−p0). Same 2x2 frame as q_stat_odds_ratio (exposure =
    # afternoon, outcome = purchase) — RR answers the
    # probability-ratio question the OR only approximates when the
    # outcome is common. Cells exact from one scan; ln/exp are libm →
    # round-12 on the CI, round-6 on the NNT reciprocal (its ~1e2
    # magnitude needs the coarser absolute grid); p-ratios identical
    # trees. At 100 TB: one conditional-count scan to a scalar row.
    ev = table(spark, sf_dir, "events")
    exp_ = F.hour("ts") >= 12
    out_ = F.col("event_type") == "purchase"
    cell = lambda p, t: F.sum(F.when(p & t, 1).otherwise(0)).cast("bigint")  # noqa: E731
    t = ev.agg(
        cell(exp_, out_).alias("a"),
        cell(exp_, ~out_).alias("b"),
        cell(~exp_, out_).alias("c"),
        cell(~exp_, ~out_).alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    p1 = a.cast("double") / (a + b)
    p0 = c.cast("double") / (c + d)
    se = F.sqrt(
        b.cast("double") / a / (a + b) + d.cast("double") / c / (c + d)
    )
    z = F.lit(1.959963984540054)
    return t.select(
        (a + b + c + d).alias("n"),
        F.round(p1 / p0, 12).alias("rr"),
        F.round(F.exp(F.log(p1 / p0) - z * se), 12).alias("rr_lo"),
        F.round(F.exp(F.log(p1 / p0) + z * se), 12).alias("rr_hi"),
        F.round(p1 - p0, 12).alias("risk_diff"),
        F.round(F.lit(1.0) / (p1 - p0), 6).alias("nnt"),
    )


@register(
    "q_stat_cohens_h",
    oracle="""
    WITH t AS (
      SELECT CAST(count(*) FILTER (WHERE hour(ts) >= 12 AND event_type = 'purchase') AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE hour(ts) >= 12) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE hour(ts) < 12 AND event_type = 'purchase') AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE hour(ts) < 12) AS BIGINT) AS n0
      FROM events
    )
    SELECT n1 + n0 AS n,
           CAST(a AS DOUBLE) / n1 AS p1,
           CAST(c AS DOUBLE) / n0 AS p0,
           round(2 * asin(sqrt(CAST(a AS DOUBLE) / n1))
                 - 2 * asin(sqrt(CAST(c AS DOUBLE) / n0)), 12) AS cohens_h
    FROM t
    """,
)
def q_stat_cohens_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohen's h — the effect size for a DIFFERENCE OF PROPORTIONS
    # (afternoon vs morning purchase rate) on the arcsine-sqrt scale,
    # where equal differences are equally detectable regardless of the
    # baseline rate (the variance-stabilizing transform): the number
    # you plug into power analysis for two-proportion tests, next to
    # q_stat_proportion_z's significance and q_stat_power_mde's
    # continuous-metric MDE. Counts exact from one scan; the two
    # proportions are identical double trees; asin is libm →
    # round-12 on h only (the odds-ratio discipline). At 100 TB: one
    # conditional-count scan to a scalar row.
    ev = table(spark, sf_dir, "events")
    aft = F.hour("ts") >= 12
    pur = F.col("event_type") == "purchase"
    t = ev.agg(
        F.sum(F.when(aft & pur, 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(aft, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~aft & pur, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(~aft, 1).otherwise(0)).cast("bigint").alias("n0"),
    )
    p1 = F.col("a").cast("double") / F.col("n1")
    p0 = F.col("c").cast("double") / F.col("n0")
    return t.select(
        (F.col("n1") + F.col("n0")).alias("n"),
        p1.alias("p1"),
        p0.alias("p0"),
        F.round(2 * F.asin(F.sqrt(p1)) - 2 * F.asin(F.sqrt(p0)), 12).alias(
            "cohens_h"
        ),
    )


_FISHER_CTES = """
WITH t AS (
      SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND event_type = 'purchase') AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND event_type <> 'purchase') AS BIGINT) AS b,
             CAST(count(*) FILTER (WHERE user_id % 2 <> 0 AND event_type = 'purchase') AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE user_id % 2 <> 0 AND event_type <> 'purchase') AS BIGINT) AS d
      FROM events
    ),
    m AS (SELECT a, b, c, d, a + b AS r1, c + d AS r2, a + c AS c1,
                 a + b + c + d AS n
          FROM t),
    lf AS MATERIALIZED (
      SELECT i,
             sum(CAST(ln(CAST(i AS DOUBLE)) AS DECIMAL(32,12))) OVER
               (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lf
      FROM (SELECT unnest(generate_series(1, (SELECT n FROM m))) AS i)
    ),
    cst AS (
      SELECT coalesce(max(CASE WHEN lf.i = m.r1 THEN lf.lf END), 0)
           + coalesce(max(CASE WHEN lf.i = m.r2 THEN lf.lf END), 0)
           + coalesce(max(CASE WHEN lf.i = m.c1 THEN lf.lf END), 0)
           + coalesce(max(CASE WHEN lf.i = m.n - m.c1 THEN lf.lf END), 0)
           - coalesce(max(CASE WHEN lf.i = m.n THEN lf.lf END), 0) AS c_tot
      FROM lf, m
    ),
    ks AS (
      SELECT unnest(generate_series(greatest(0, m.c1 - m.r2),
                                    least(m.r1, m.c1))) AS k
      FROM m
    ),
    lk AS (
      SELECT ks.k,
             unnest([ks.k, m.r1 - ks.k, m.c1 - ks.k, m.r2 - m.c1 + ks.k]) AS i
      FROM ks, m
    ),
    neg AS (
      SELECT k, sum(coalesce(lf.lf, CAST(0 AS DECIMAL(32,12)))) AS neg
      FROM lk LEFT JOIN lf ON lk.i = lf.i
      GROUP BY k
    ),
    terms AS (
      SELECT k, exp(CAST(cst.c_tot - neg.neg AS DOUBLE)) AS p FROM neg, cst
    ),
    pt AS (
      SELECT max(CASE WHEN terms.k = m.a THEN terms.p END) AS p_point
      FROM terms, m
    )
"""


@register(
    "q_stat_fisher_exact",
    oracle=f"""
    {_FISHER_CTES}
    SELECT m.a, m.b, m.c, m.d,
           round(pt.p_point, 6) AS p_point,
           round(least(sum(CASE WHEN terms.p <= pt.p_point * (1.0e0 + 1e-7)
                                THEN terms.p END), 1.0e0), 6) AS p_two_sided,
           round(least(sum(CASE WHEN terms.k >= m.a THEN terms.p END),
                       1.0e0), 6) AS p_greater,
           round(least(sum(CASE WHEN terms.k <= m.a THEN terms.p END),
                       1.0e0), 6) AS p_less
    FROM terms, pt, m
    GROUP BY m.a, m.b, m.c, m.d, pt.p_point
    """,
)
def q_stat_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fisher's EXACT 2x2 test (round-10 verdict item 4 — the one hole
    # in the 2x2 family: chi-square, McNemar, OR, RR/NNT, MH, Cohen's h
    # all have keys; the exact test was roadmap-deferred as possibly
    # sf-unstable). Made sf-STABLE and scale-safe by building the
    # log-factorial table as a DISTRIBUTED prefix sum of ln(i) values
    # quantized to DECIMAL(32,12): the decimal lane makes the prefix
    # sum order-independent — Spark's two-phase composition and
    # DuckDB's sequential window produce the IDENTICAL table (a raw
    # double prefix sum diverges by ~1e-6 at n=1e5, far beyond the
    # round-6 grid; the quantized lane's only wiggle is libm 1-ulp on
    # ln(i) flipping a 5e-13 cast boundary, bounded ~1e-10 in any
    # log-probability). Arms: even vs odd user_id (independent of
    # outcome by construction, so p is informative, not degenerate);
    # outcome: purchase. Two-sided inclusion uses the standard
    # P(k) <= P(a)*(1+1e-7) relative slack — structural opposite-tail
    # ties land INSIDE the slack on both engines. operators/stats.py:
    # fisher_exact_2x2, numpy/lgamma-validated in tests. At 100 TB:
    # O(n) prefix sum + O(|k-range|) explode-join — the "small-sample"
    # exact test at any scale.
    from trembita_spark.operators.stats import fisher_exact_2x2

    ev = table(spark, sf_dir, "events")
    return fisher_exact_2x2(
        ev,
        exposure=F.col("user_id") % 2 == 0,
        outcome=F.col("event_type") == "purchase",
    )


@register(
    "q_stat_fisher_midp",
    oracle=f"""
    {_FISHER_CTES}
    SELECT m.a, m.b, m.c, m.d,
           round(pt.p_point, 6) AS p_point,
           round(least(2.0e0 * least(
                   sum(CASE WHEN terms.k >= m.a THEN terms.p END)
                     - 0.5e0 * pt.p_point,
                   sum(CASE WHEN terms.k <= m.a THEN terms.p END)
                     - 0.5e0 * pt.p_point), 1.0e0), 6) AS midp_two_sided,
           round(least(sum(CASE WHEN terms.k >= m.a THEN terms.p END)
                         - 0.5e0 * pt.p_point, 1.0e0), 6) AS midp_greater,
           round(least(sum(CASE WHEN terms.k <= m.a THEN terms.p END)
                         - 0.5e0 * pt.p_point, 1.0e0), 6) AS midp_less
    FROM terms, pt, m
    GROUP BY m.a, m.b, m.c, m.d, pt.p_point
    """,
)
def q_stat_fisher_midp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mid-p Fisher (Lancaster correction) — the recommended-practice
    # variant that counts the observed table at HALF weight, fixing the
    # exact test's conservatism (its actual type-I rate sits well below
    # nominal alpha; mid-p restores it near alpha without the
    # asymptotic approximations the chi-square lane leans on). Same
    # distributed DECIMAL(32,12)-quantized lnfact prefix-sum lane as
    # q_stat_fisher_exact; the mid-p tails are single double
    # expressions (tail − 0.5·P(a), doubling rule capped at 1) replayed
    # verbatim by the oracle. Same 100 TB posture: O(n) prefix sum +
    # O(|k-range|) explode-join.
    from trembita_spark.operators.stats import fisher_exact_2x2

    ev = table(spark, sf_dir, "events")
    return fisher_exact_2x2(
        ev,
        exposure=F.col("user_id") % 2 == 0,
        outcome=F.col("event_type") == "purchase",
        midp=True,
    )


@register(
    "q_stat_barnard",
    oracle="""
    WITH t AS (
      SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND event_type = 'purchase') AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND event_type <> 'purchase') AS BIGINT) AS b,
             CAST(count(*) FILTER (WHERE user_id % 2 <> 0 AND event_type = 'purchase') AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE user_id % 2 <> 0 AND event_type <> 'purchase') AS BIGINT) AS d
      FROM events
    ),
    m AS (
      SELECT a, b, c, d, a + b AS n1, c + d AS n2, a + b + c + d AS nn,
             a + c AS s0,
             a * (c + d) - c * (a + b) AS zn,
             (a + c) * (b + d) AS s0c
      FROM t
    ),
    mm AS (
      SELECT m.*, CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
             CAST(nn AS DOUBLE) AS nd, CAST(zn AS DOUBLE) AS znd,
             CAST(s0c AS DOUBLE) AS s0cd, CAST(s0 AS DOUBLE) AS s0d,
             CAST(s0c AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
               + CAST(zn AS DOUBLE) * CAST(zn AS DOUBLE) AS qa
      FROM m
    ),
    lf AS MATERIALIZED (
      SELECT i,
             sum(CAST(ln(CAST(i AS DOUBLE)) AS DECIMAL(32,12))) OVER
               (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lf
      FROM (SELECT unnest(generate_series(1, (SELECT greatest(n1, n2) FROM m))) AS i)
    ),
    lfc AS (
      SELECT coalesce(max(CASE WHEN lf.i = m.n1 THEN lf.lf END), 0) AS lf_n1,
             coalesce(max(CASE WHEN lf.i = m.n2 THEN lf.lf END), 0) AS lf_n2
      FROM lf, m
    ),
    gd AS (
      SELECT g, CAST(g AS DOUBLE) / 21.0e0 AS pi
      FROM (SELECT unnest(generate_series(1, 20)) AS g)
    ),
    gd2 AS (SELECT g, pi, ln(pi) AS lnpi, ln(1.0e0 - pi) AS lnq FROM gd),
    x2f AS (
      SELECT x2s.x2,
             CAST(lfc.lf_n2 - coalesce(l1.lf, 0) - coalesce(l2.lf, 0) AS DOUBLE) AS lnc2
      FROM (SELECT unnest(generate_series(0, (SELECT n2 FROM m))) AS x2) x2s
      CROSS JOIN lfc CROSS JOIN m
      LEFT JOIN lf l1 ON l1.i = x2s.x2
      LEFT JOIN lf l2 ON l2.i = m.n2 - x2s.x2
    ),
    t2 AS MATERIALIZED (
      SELECT gd2.g, x2f.x2,
             CAST(exp(x2f.lnc2 + CAST(x2f.x2 AS DOUBLE) * gd2.lnpi
                      + (mm.n2d - CAST(x2f.x2 AS DOUBLE)) * gd2.lnq)
                  AS DECIMAL(38,33)) AS b2q
      FROM x2f CROSS JOIN gd2 CROSS JOIN mm
    ),
    cdf AS MATERIALIZED (
      SELECT g, x2,
             sum(b2q) OVER (PARTITION BY g ORDER BY x2
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdf
      FROM t2
    ),
    blocks AS (
      SELECT g, sum(b2q) AS tot2,
             max(CASE WHEN t2.x2 = 0 THEN b2q END) AS b2q0,
             max(CASE WHEN t2.x2 = m.n2 THEN b2q END) AS b2qn2
      FROM t2 CROSS JOIN m
      GROUP BY g
    ),
    x1b AS (
      SELECT x1s.x1,
             CAST(lfc.lf_n1 - coalesce(l1.lf, 0) - coalesce(l2.lf, 0) AS DOUBLE) AS lnc1,
             CAST(x1s.x1 AS DOUBLE) AS x1d
      FROM (SELECT unnest(generate_series(0, (SELECT n1 FROM m))) AS x1) x1s
      CROSS JOIN lfc CROSS JOIN m
      LEFT JOIN lf l1 ON l1.i = x1s.x1
      LEFT JOIN lf l2 ON l2.i = m.n1 - x1s.x1
    ),
    bnd AS (
      SELECT x1, lnc1, x1d, mm.qa,
             -2.0e0 * mm.s0cd * mm.n1d * mm.n2d * x1d
               - mm.znd * mm.znd * (mm.nd - 2.0e0 * x1d) AS qb,
             mm.s0cd * mm.n2d * mm.n2d * x1d * x1d
               - mm.znd * mm.znd * x1d * (mm.nd - x1d) AS qc
      FROM x1b CROSS JOIN mm
    ),
    bnd2 AS (
      SELECT *, qb * qb - 4.0e0 * qa * qc AS disc,
             -qb / (2.0e0 * qa) AS vtx
      FROM bnd
    ),
    bnd3 AS (
      SELECT *,
        CAST(floor((-qb - sqrt(greatest(disc, 0.0e0))) / (2.0e0 * qa)) AS BIGINT) AS flo,
        CAST(ceil((-qb + sqrt(greatest(disc, 0.0e0))) / (2.0e0 * qa)) AS BIGINT) AS fhi
      FROM bnd2
    ),
    uv AS (
      SELECT x1, lnc1, x1d,
        CASE WHEN disc <= 0.0e0 THEN m.n2
             ELSE least(coalesce(list_max(list_filter(generate_series(flo - 2, flo + 2),
                  j -> CAST(j AS DOUBLE) <= vtx
                       AND qa * CAST(j AS DOUBLE) * CAST(j AS DOUBLE)
                           + qb * CAST(j AS DOUBLE) + qc >= 0.0e0)), -1), m.n2) END AS u,
        CASE WHEN disc <= 0.0e0 THEN m.n2 + 1
             ELSE greatest(coalesce(list_min(list_filter(generate_series(fhi - 2, fhi + 2),
                  j -> CAST(j AS DOUBLE) >= vtx
                       AND qa * CAST(j AS DOUBLE) * CAST(j AS DOUBLE)
                           + qb * CAST(j AS DOUBLE) + qc >= 0.0e0)), m.n2 + 1), 0) END AS v
      FROM bnd3 CROSS JOIN m
    ),
    t1 AS (
      SELECT gd2.g, uv.x1, uv.u, uv.v,
             exp(uv.lnc1 + uv.x1d * gd2.lnpi + (mm.n1d - uv.x1d) * gd2.lnq) AS b1
      FROM uv CROSS JOIN gd2 CROSS JOIN mm
    ),
    tails AS (
      SELECT t1.g,
        CAST(t1.b1 * (
          coalesce(CAST(cl.cdf AS DOUBLE), 0.0e0)
          + (CASE WHEN t1.v > m.n2 THEN 0.0e0
                  ELSE CAST(blocks.tot2 AS DOUBLE)
                       - coalesce(CAST(ch.cdf AS DOUBLE), 0.0e0) END)
          - (CASE WHEN t1.x1 = 0 AND m.zn <> 0
                  THEN CAST(blocks.b2q0 AS DOUBLE) ELSE 0.0e0 END)
          - (CASE WHEN t1.x1 = m.n1 AND m.zn <> 0
                  THEN CAST(blocks.b2qn2 AS DOUBLE) ELSE 0.0e0 END)
        ) AS DECIMAL(38,33)) AS term
      FROM t1 CROSS JOIN m
      JOIN blocks ON blocks.g = t1.g
      LEFT JOIN cdf cl ON cl.g = t1.g AND cl.x2 = t1.u
      LEFT JOIN cdf ch ON ch.g = t1.g AND ch.x2 = t1.v - 1
    ),
    psum AS (SELECT g, sum(term) AS p_dec FROM tails GROUP BY g)
    SELECT m.a, m.b, m.c, m.d,
      round((CAST(m.a AS DOUBLE) / mm.n1d - CAST(m.c AS DOUBLE) / mm.n2d)
            / sqrt((mm.s0d / mm.nd) * (1.0e0 - mm.s0d / mm.nd)
                   * (1.0e0 / mm.n1d + 1.0e0 / mm.n2d)), 6) AS wald,
      round(CAST(max(p_dec) AS DOUBLE), 6) AS p_value
    FROM psum CROSS JOIN m CROSS JOIN mm
    GROUP BY m.a, m.b, m.c, m.d, mm.n1d, mm.n2d, mm.s0d, mm.nd
    """,
)
def q_stat_barnard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Barnard's UNCONDITIONAL exact 2x2 test (round-11 verdict item 3 —
    # the last hole in the small-sample 2x2 family Fisher opened):
    # X1 ~ Bin(n1, pi), X2 ~ Bin(n2, pi); pooled-Wald extremeness;
    # p = max over a 20-point uniform nuisance grid (the same
    # published-practice discretization class as scipy's 32-point
    # default). The quadratic-tables trap is dodged by solving the
    # extremeness condition PER x1: clearing denominators turns
    # |T| >= |T_obs| into one integer-coefficient quadratic in x2, so
    # the extreme set is two tails {x2<=u} ∪ {x2>=v} and p(pi) needs
    # only the Bin(n2,pi) CDF at the boundaries — one distributed
    # prefix sum per grid point, O((n1+n2)*grid) total, never
    # (n1+1)x(n2+1) tables. Boundaries are pure IEEE double
    # *,+,-,sqrt over <2^53 integers with the IDENTICAL tree here and
    # in the oracle (no libm), so both engines pick identical u, v;
    # probability terms ride the fisher lnfact DECIMAL(32,12) lane and
    # a DECIMAL(38,33) quantized term lane (order-independent sums);
    # the 0/0-statistic corner tables (0,0) and (n1,n2) are defined
    # T=0 and subtracted exactly. operators/stats.py:barnard_exact_2x2,
    # brute-force-validated in tests. At 100 TB: one scan for the 2x2,
    # O(n) prefix sums, equi joins only.
    from trembita_spark.operators.stats import barnard_exact_2x2

    ev = table(spark, sf_dir, "events")
    return barnard_exact_2x2(
        ev,
        exposure=F.col("user_id") % 2 == 0,
        outcome=F.col("event_type") == "purchase",
    )


# Acklam's rational approximation to the inverse normal CDF (probit),
# |relative err| <= 1.15e-9 — staged as column text so BOTH engines run
# the identical op sequence (the erf-fragment pattern, in the inverse
# direction). Expects staged columns: pq (the probability), rr = pq-0.5,
# ss = rr*rr, qtl = sqrt(-2 ln pq), qtu = sqrt(-2 ln(1-pq)). The rank
# keys (Fligner-Killeen, van der Waerden) evaluate it per SUPPORT row,
# never per data row; validated against Python's NormalDist.inv_cdf
# (max err 1.6e-9 over both tails and the center).
def _probit_tail_num(q: str) -> str:
    return (
        f"(((((-7.784894002430293e-03 * {q} - 3.223964580411365e-01) * {q}"
        f" - 2.400758277161838e+00) * {q} - 2.549732539343734e+00) * {q}"
        f" + 4.374664141464968e+00) * {q} + 2.938163982698783e+00)"
    )


def _probit_tail_den(q: str) -> str:
    return (
        f"((((7.784695709041462e-03 * {q} + 3.224671290700398e-01) * {q}"
        f" + 2.445134137142996e+00) * {q} + 3.754408661907416e+00) * {q}"
        f" + 1.0e0)"
    )


_PROBIT_CNUM = (
    "(((((-3.969683028665376e+01 * ss + 2.209460984245205e+02) * ss"
    " - 2.759285104469687e+02) * ss + 1.383577518672690e+02) * ss"
    " - 3.066479806614716e+01) * ss + 2.506628277459239e+00)"
)
_PROBIT_CDEN = (
    "(((((-5.447609879822406e+01 * ss + 1.615858368580409e+02) * ss"
    " - 1.556989798598866e+02) * ss + 6.680131188771972e+01) * ss"
    " - 1.328068155288572e+01) * ss + 1.0e0)"
)
_PROBIT = (
    f"CASE WHEN pq < 0.02425e0"
    f" THEN {_probit_tail_num('qtl')} / {_probit_tail_den('qtl')}"
    f" WHEN pq <= 0.97575e0 THEN {_PROBIT_CNUM} * rr / {_PROBIT_CDEN}"
    f" ELSE -({_probit_tail_num('qtu')} / {_probit_tail_den('qtu')}) END"
)
# The staged helper columns, shared verbatim by both engines.
_PROBIT_STAGE = (
    "pq - 0.5e0 AS rr",
    "(pq - 0.5e0) * (pq - 0.5e0) AS ss",
    "sqrt(-2.0e0 * ln(pq)) AS qtl",
    "sqrt(-2.0e0 * ln(1.0e0 - pq)) AS qtu",
)


@register(
    "q_stat_fligner_killeen",
    oracle=f"""
    WITH x AS (
      SELECT event_type AS g,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY g, v),
    gc AS (
      SELECT g, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM gv
    ),
    gt AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g FROM gv GROUP BY g),
    med AS (
      SELECT gc.g,
             max(CASE WHEN gc.cum - gc.cnt < (gt.n_g + 1) // 2
                      AND gc.cum >= (gt.n_g + 1) // 2 THEN gc.v END) AS med
      FROM gc JOIN gt USING (g) GROUP BY gc.g
    ),
    dg AS (
      SELECT gv.g, abs(gv.v - med.med) AS d, CAST(sum(gv.cnt) AS BIGINT) AS cnt
      FROM gv JOIN med USING (g) GROUP BY 1, 2
    ),
    pd AS (SELECT d, CAST(sum(cnt) AS BIGINT) AS cnt FROM dg GROUP BY d),
    c AS (
      SELECT d, cnt,
             CAST(sum(cnt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM pd
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM pd),
    pr AS (
      SELECT c.d, c.cnt, t.n,
             (2.0e0 * (t.n + 1) + (2 * (c.cum - c.cnt) + c.cnt + 1))
               / (4.0e0 * (t.n + 1)) AS pq
      FROM c CROSS JOIN t
    ),
    stg AS (
      SELECT d, cnt, n, pq, {", ".join(_PROBIT_STAGE)} FROM pr
    ),
    sc AS (SELECT d, cnt, n, ({_PROBIT}) AS a FROM stg),
    ga AS (
      SELECT dg.g, CAST(sum(dg.cnt) AS BIGINT) AS n_g,
             sum(CAST(CAST(dg.cnt AS DOUBLE) * sc.a AS DECIMAL(38,12))) AS sa
      FROM dg JOIN sc USING (d) GROUP BY dg.g
    ),
    tot AS (
      SELECT max(n) AS n,
             sum(CAST(CAST(cnt AS DOUBLE) * a AS DECIMAL(38,12))) AS sa_all,
             sum(CAST(CAST(cnt AS DOUBLE) * a * a AS DECIMAL(38,12))) AS saa_all
      FROM sc
    ),
    f1 AS (
      SELECT n, saa_all, CAST(sa_all AS DOUBLE) / n AS abar FROM tot
    ),
    f2 AS (
      SELECT n, abar,
             (CAST(saa_all AS DOUBLE) - n * abar * abar) / (n - 1) AS s2
      FROM f1
    )
    SELECT f2.n AS n_tot, CAST(count(*) AS BIGINT) AS k,
           round(sum((CAST(ga.sa AS DOUBLE) - ga.n_g * f2.abar)
                     * (CAST(ga.sa AS DOUBLE) - ga.n_g * f2.abar)
                     / ga.n_g) / f2.s2, 6) AS fk_stat
    FROM ga CROSS JOIN f2
    GROUP BY f2.n, f2.s2
    """,
)
def q_stat_fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fligner-Killeen homogeneity-of-variances test across the five
    # event_type arms of events.value — the rank-based, most
    # outlier-robust member of the variance family (Levene/Bartlett/
    # Ansari-Bradley already registered; FK is R's fligner.test
    # default). Pipeline: per-group LOWER median (exact order statistic
    # on the per-group cent-support, the qq_deciles selection), exact
    # integer deviations d = |v - med_g|, pooled d-support midranks via
    # the distributed prefix sum (doubled-rank form, the kruskal lane),
    # normal scores a = probit(1/2 + r/(2(N+1))) through the shared
    # Acklam fragment per SUPPORT row, then
    # X2 = sum_g n_g(Abar_g - abar)^2 / s^2 with s^2 the (N-1)-divisor
    # variance of the scores. The support-sized score sums are
    # quantized to DECIMAL(38,12) and summed EXACTLY (the
    # anderson_darling lane), so only the k-group rollup sums doubles
    # in engine order -> round-6 (the kruskal rule). 100 TB: two
    # contingency aggregates, one support prefix sum, k-row frames
    # everywhere else; the per-group median window rides the
    # aggregate-sized per-group support (the qq_deciles exemption).
    from pyspark.sql.window import Window

    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    x = ev.select(
        F.col("event_type").alias("g"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    )
    gv = x.groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    gv = gv.localCheckpoint(eager=False)  # feeds median + deviations
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gc = gv.withColumn("cum", F.sum("cnt").over(w).cast("bigint"))
    gt = gv.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n_g"))
    rank = (F.col("n_g") + 1) - ((F.col("n_g") + 1) % 2)  # 2*((n_g+1)//2)
    med = (
        gc.join(F.broadcast(gt), "g")
        .groupBy("g")
        .agg(
            F.max(
                F.when(
                    ((F.col("cum") - F.col("cnt")) * 2 < rank)
                    & (F.col("cum") * 2 >= rank),
                    F.col("v"),
                )
            ).alias("med")
        )
    )
    dg = (
        gv.join(F.broadcast(med), "g")
        .groupBy("g", F.abs(F.col("v") - F.col("med")).alias("d"))
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    dg = dg.localCheckpoint(eager=False)  # feeds pooled support + per-group sums
    pd_ = dg.groupBy("d").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    pd_ = pd_.localCheckpoint(eager=False)  # feeds prefix sum + total
    c = prefix_sum(pd_, "cnt", order_by=[F.col("d")], name="cum")
    t = pd_.agg(F.sum("cnt").cast("bigint").alias("n"))
    pr = c.crossJoin(F.broadcast(t)).selectExpr(
        "d",
        "cnt",
        "n",
        "(2.0e0 * (n + 1) + (2 * (cum - cnt) + cnt + 1))"
        " / (4.0e0 * (n + 1)) AS pq",
    )
    stg = pr.selectExpr("d", "cnt", "n", "pq", *_PROBIT_STAGE)
    sc = stg.selectExpr("d", "cnt", "n", f"({_PROBIT}) AS a")
    sc = sc.localCheckpoint(eager=False)  # feeds per-group join + totals
    ga = (
        dg.join(sc.select("d", "a"), "d")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_g"),
            F.sum(
                F.expr("CAST(CAST(cnt AS DOUBLE) * a AS DECIMAL(38,12))")
            ).alias("sa"),
        )
    )
    tot = sc.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("CAST(CAST(cnt AS DOUBLE) * a AS DECIMAL(38,12))")).alias(
            "sa_all"
        ),
        F.sum(
            F.expr("CAST(CAST(cnt AS DOUBLE) * a * a AS DECIMAL(38,12))")
        ).alias("saa_all"),
    )
    f1 = tot.selectExpr("n", "saa_all", "CAST(sa_all AS DOUBLE) / n AS abar")
    f2 = f1.selectExpr(
        "n",
        "abar",
        "(CAST(saa_all AS DOUBLE) - n * abar * abar) / (n - 1) AS s2",
    )
    return (
        ga.crossJoin(F.broadcast(f2))
        .groupBy("n", "s2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.expr(
                "round(sum((CAST(sa AS DOUBLE) - n_g * abar)"
                "          * (CAST(sa AS DOUBLE) - n_g * abar)"
                "          / n_g) / s2, 6)"
            ).alias("fk_stat"),
        )
        .selectExpr("n AS n_tot", "k", "fk_stat")
    )


@register(
    "q_stat_van_der_waerden",
    oracle=f"""
    WITH x AS (
      SELECT event_type AS g,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY g, v),
    pv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt FROM gv GROUP BY v),
    c AS (
      SELECT v, cnt,
             CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM pv
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM pv),
    pr AS (
      SELECT c.v, c.cnt, t.n,
             (2 * (c.cum - c.cnt) + c.cnt + 1)
               / (2.0e0 * (t.n + 1)) AS pq
      FROM c CROSS JOIN t
    ),
    stg AS (
      SELECT v, cnt, n, pq, {", ".join(_PROBIT_STAGE)} FROM pr
    ),
    sc AS (SELECT v, cnt, n, ({_PROBIT}) AS a FROM stg),
    ga AS (
      SELECT gv.g, CAST(sum(gv.cnt) AS BIGINT) AS n_g,
             sum(CAST(CAST(gv.cnt AS DOUBLE) * sc.a AS DECIMAL(38,12))) AS sa
      FROM gv JOIN sc USING (v) GROUP BY gv.g
    ),
    tot AS (
      SELECT max(n) AS n,
             sum(CAST(CAST(cnt AS DOUBLE) * a * a AS DECIMAL(38,12))) AS saa
      FROM sc
    ),
    f1 AS (SELECT n, CAST(saa AS DOUBLE) / (n - 1) AS s2 FROM tot)
    SELECT f1.n AS n_tot, CAST(count(*) AS BIGINT) AS k,
           round(sum(CAST(ga.sa AS DOUBLE) * CAST(ga.sa AS DOUBLE)
                     / ga.n_g) / f1.s2, 6) AS vdw_stat
    FROM ga CROSS JOIN f1
    GROUP BY f1.n, f1.s2
    """,
)
def q_stat_van_der_waerden(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Van der Waerden normal-scores k-sample test (Conover's T1) across
    # the five event_type arms of events.value — the normal-scores
    # transform of the Kruskal-Wallis lane: pooled-support midranks
    # through the distributed prefix sum, a = probit(r/(N+1)) per
    # SUPPORT row via the shared Acklam fragment (midrank r staged as
    # the doubled-rank integer, so pq = 2r/(2(N+1)) is one
    # double tree), then T1 = sum_g (S_g^2/n_g) / s^2 with
    # s^2 = sum a_i^2/(N-1) (scores sum to ~0 by symmetry; Conover's
    # uncentered form is the standard). Score sums quantized to
    # DECIMAL(38,12) and summed exactly (the anderson_darling lane);
    # only the k-group rollup sums doubles in engine order -> round-6
    # (the kruskal rule). ARE 1.0 vs ANOVA under normality while
    # keeping rank robustness — the practical middle ground between
    # q_stat_anova and q_stat_kruskal. 100 TB: one contingency
    # aggregate + one support prefix sum; k-row frames after.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    x = ev.select(
        F.col("event_type").alias("g"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    )
    gv = x.groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    gv = gv.localCheckpoint(eager=False)  # feeds pooled support + group sums
    pv = gv.groupBy("v").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + total
    c = prefix_sum(pv, "cnt", order_by=[F.col("v")], name="cum")
    t = pv.agg(F.sum("cnt").cast("bigint").alias("n"))
    pr = c.crossJoin(F.broadcast(t)).selectExpr(
        "v",
        "cnt",
        "n",
        "(2 * (cum - cnt) + cnt + 1)"
        " / (2.0e0 * (n + 1)) AS pq",
    )
    stg = pr.selectExpr("v", "cnt", "n", "pq", *_PROBIT_STAGE)
    sc = stg.selectExpr("v", "cnt", "n", f"({_PROBIT}) AS a")
    sc = sc.localCheckpoint(eager=False)  # feeds per-group join + totals
    ga = (
        gv.join(sc.select("v", "a"), "v")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_g"),
            F.sum(
                F.expr("CAST(CAST(cnt AS DOUBLE) * a AS DECIMAL(38,12))")
            ).alias("sa"),
        )
    )
    tot = sc.agg(
        F.max("n").alias("n"),
        F.sum(
            F.expr("CAST(CAST(cnt AS DOUBLE) * a * a AS DECIMAL(38,12))")
        ).alias("saa"),
    )
    f1 = tot.selectExpr("n", "CAST(saa AS DOUBLE) / (n - 1) AS s2")
    return (
        ga.crossJoin(F.broadcast(f1))
        .groupBy("n", "s2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.expr(
                "round(sum(CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)"
                "          / n_g) / s2, 6)"
            ).alias("vdw_stat"),
        )
        .selectExpr("n AS n_tot", "k", "vdw_stat")
    )


@register(
    "q_geo_moran_i",
    oracle="""
    WITH pts AS (
      SELECT CAST((c_custkey * 37) % 160 - 80 AS DOUBLE) + 0.5 AS lat,
             CAST((c_custkey * 73) % 360 - 180 AS DOUBLE) + 0.5 AS lon
      FROM customer
    ),
    cells AS (
      SELECT CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
             CAST(floor(lon / 10) AS BIGINT) AS cell_lon,
             CAST(count(*) AS BIGINT) AS y
      FROM pts GROUP BY 1, 2
    ),
    offs AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dl, dn)),
    pairs AS (
      SELECT a.y AS yi, b.y AS yj
      FROM cells a
      CROSS JOIN offs o
      JOIN cells b
        ON b.cell_lat = a.cell_lat + o.dl AND b.cell_lon = a.cell_lon + o.dn
    ),
    ag AS (
      SELECT CAST(count(*) AS BIGINT) AS s0,
             CAST(sum(CAST(yi AS DECIMAL(38,0)) * yj) AS DECIMAL(38,0)) AS pa,
             CAST(sum(CAST(yi AS DECIMAL(38,0)) + yj) AS DECIMAL(38,0)) AS pb
      FROM pairs
    ),
    ct AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM cells
    )
    SELECT ct.n AS n_cells, ag.s0,
           CAST(ct.n * ct.n * ag.pa - ct.n * ct.sy * ag.pb
                + CAST(ct.sy AS DECIMAL(38,0)) * ct.sy * ag.s0 AS DOUBLE)
             / CAST(ag.s0 * (ct.n * ct.syy
                             - CAST(ct.sy AS DECIMAL(38,0)) * ct.sy) AS DOUBLE)
             AS moran_i
    FROM ct CROSS JOIN ag
    """,
)
def q_geo_moran_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Moran's I global spatial autocorrelation over the 10-degree grid
    # cells of the synthetic customer point cloud (the
    # q_geo_grid_density lattice), rook adjacency, binary weights —
    # the is-the-density-map-clustered-or-dispersed readout every
    # spatial pipeline computes after the heat map. The cross-product
    # numerator is expanded to EXACT integer moments:
    # I = (N^2 A - N Sy B + Sy^2 S0) / (S0 (N Syy - Sy^2)) with
    # A = sum w y_i y_j, B = sum w (y_i + y_j), S0 = sum w over the
    # directed neighbor pairs — every term exact DECIMAL(38,0) (cell
    # counts square past BIGINT at full scale, the kruskal n^3
    # lesson), ONE double division at the end -> bit-exact
    # cross-engine, no rounding. Neighbor pairs come from an equi-join
    # of the cell frame against itself shifted by a 4-row offset
    # table. 100 TB: one partial-aggregated scan to the grid-bounded
    # cell frame (16 x 36 cells max); everything after is
    # lattice-sized, the offs cross join is a 4-row broadcast.
    pts = table(spark, sf_dir, "customer").select(
        (((F.col("c_custkey") * 37) % 160 - 80).cast("double") + 0.5).alias("lat"),
        (((F.col("c_custkey") * 73) % 360 - 180).cast("double") + 0.5).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 10).cast("bigint").alias("cell_lat"),
        F.floor(F.col("lon") / 10).cast("bigint").alias("cell_lon"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    cells = cells.localCheckpoint(eager=False)  # feeds both join sides + moments
    offs = spark.sql(
        "SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dl, dn)"
    )
    a = cells.select(
        F.col("cell_lat").alias("al"), F.col("cell_lon").alias("an"),
        F.col("y").alias("yi"),
    )
    b = cells.select(
        F.col("cell_lat").alias("bl"), F.col("cell_lon").alias("bn"),
        F.col("y").alias("yj"),
    )
    pairs = (
        a.crossJoin(F.broadcast(offs))
        .join(
            F.broadcast(b),
            (F.col("bl") == F.col("al") + F.col("dl"))
            & (F.col("bn") == F.col("an") + F.col("dn")),
        )
        .select("yi", "yj")
    )
    ag = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("s0"),
        F.sum(F.col("yi").cast("decimal(38,0)") * F.col("yj"))
        .cast("decimal(38,0)")
        .alias("pa"),
        F.sum(F.col("yi").cast("decimal(38,0)") + F.col("yj"))
        .cast("decimal(38,0)")
        .alias("pb"),
    )
    ct = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    return ct.crossJoin(F.broadcast(ag)).selectExpr(
        "n AS n_cells",
        "s0",
        "CAST(n * n * pa - n * sy * pb"
        "     + CAST(sy AS DECIMAL(38,0)) * sy * s0 AS DOUBLE)"
        " / CAST(s0 * (n * syy - CAST(sy AS DECIMAL(38,0)) * sy) AS DOUBLE)"
        " AS moran_i",
    )


@register(
    "q_geo_geary_c",
    oracle="""
    WITH pts AS (
      SELECT CAST((c_custkey * 37) % 160 - 80 AS DOUBLE) + 0.5 AS lat,
             CAST((c_custkey * 73) % 360 - 180 AS DOUBLE) + 0.5 AS lon
      FROM customer
    ),
    cells AS (
      SELECT CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
             CAST(floor(lon / 10) AS BIGINT) AS cell_lon,
             CAST(count(*) AS BIGINT) AS y
      FROM pts GROUP BY 1, 2
    ),
    offs AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dl, dn)),
    pairs AS (
      SELECT a.y AS yi, b.y AS yj
      FROM cells a
      CROSS JOIN offs o
      JOIN cells b
        ON b.cell_lat = a.cell_lat + o.dl AND b.cell_lon = a.cell_lon + o.dn
    ),
    ag AS (
      SELECT CAST(count(*) AS BIGINT) AS s0,
             CAST(sum(CAST(yi - yj AS DECIMAL(38,0))
                      * CAST(yi - yj AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dd
      FROM pairs
    ),
    ct AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM cells
    )
    SELECT ct.n AS n_cells, ag.s0,
           CAST((ct.n - 1) * ct.n * ag.dd AS DOUBLE)
             / CAST(2 * ag.s0 * (ct.n * ct.syy
                                 - CAST(ct.sy AS DECIMAL(38,0)) * ct.sy)
                    AS DOUBLE) AS geary_c
    FROM ct CROSS JOIN ag
    """,
)
def q_geo_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Geary's C contiguity ratio over the same rook-adjacency lattice
    # as q_geo_moran_i — the local-difference companion (C < 1
    # clustered, C > 1 dispersed; more sensitive to local structure
    # than Moran's global cross-product). C = (N-1) sum w (y_i-y_j)^2 /
    # (2 S0 sum (y-ybar)^2), cleared of ybar by multiplying through by
    # N: every term — the squared pair differences and the variance
    # moments — is an EXACT DECIMAL(38,0) integer, collapsed by ONE
    # double division: bit-exact cross-engine, no rounding. Same
    # lattice-bounded cost shape as Moran (one partial-aggregated scan,
    # 4-row offset broadcast equi-join).
    pts = table(spark, sf_dir, "customer").select(
        (((F.col("c_custkey") * 37) % 160 - 80).cast("double") + 0.5).alias("lat"),
        (((F.col("c_custkey") * 73) % 360 - 180).cast("double") + 0.5).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 10).cast("bigint").alias("cell_lat"),
        F.floor(F.col("lon") / 10).cast("bigint").alias("cell_lon"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    cells = cells.localCheckpoint(eager=False)  # feeds both join sides + moments
    offs = spark.sql(
        "SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dl, dn)"
    )
    a = cells.select(
        F.col("cell_lat").alias("al"), F.col("cell_lon").alias("an"),
        F.col("y").alias("yi"),
    )
    b = cells.select(
        F.col("cell_lat").alias("bl"), F.col("cell_lon").alias("bn"),
        F.col("y").alias("yj"),
    )
    pairs = (
        a.crossJoin(F.broadcast(offs))
        .join(
            F.broadcast(b),
            (F.col("bl") == F.col("al") + F.col("dl"))
            & (F.col("bn") == F.col("an") + F.col("dn")),
        )
        .select("yi", "yj")
    )
    ag = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("s0"),
        F.sum(
            (F.col("yi") - F.col("yj")).cast("decimal(38,0)")
            * (F.col("yi") - F.col("yj")).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("dd"),
    )
    ct = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    return ct.crossJoin(F.broadcast(ag)).selectExpr(
        "n AS n_cells",
        "s0",
        "CAST((n - 1) * n * dd AS DOUBLE)"
        " / CAST(2 * s0 * (n * syy - CAST(sy AS DECIMAL(38,0)) * sy) AS DOUBLE)"
        " AS geary_c",
    )


@register(
    "q_geo_getis_g",
    oracle="""
    WITH pts AS (
      SELECT CAST((c_custkey * 37) % 160 - 80 AS DOUBLE) + 0.5 AS lat,
             CAST((c_custkey * 73) % 360 - 180 AS DOUBLE) + 0.5 AS lon
      FROM customer
    ),
    cells AS (
      SELECT CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
             CAST(floor(lon / 10) AS BIGINT) AS cell_lon,
             CAST(count(*) AS BIGINT) AS y
      FROM pts GROUP BY 1, 2
    ),
    offs AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dl, dn)),
    pairs AS (
      SELECT a.y AS yi, b.y AS yj
      FROM cells a
      CROSS JOIN offs o
      JOIN cells b
        ON b.cell_lat = a.cell_lat + o.dl AND b.cell_lon = a.cell_lon + o.dn
    ),
    ag AS (
      SELECT CAST(count(*) AS BIGINT) AS s0,
             CAST(sum(CAST(yi AS DECIMAL(38,0)) * yj) AS DECIMAL(38,0)) AS pa
      FROM pairs
    ),
    ct AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM cells
    )
    SELECT ct.n AS n_cells, ag.s0,
           CAST(ag.pa AS DOUBLE)
             / CAST(CAST(ct.sy AS DECIMAL(38,0)) * ct.sy - ct.syy AS DOUBLE)
             AS getis_g,
           CAST(ag.s0 AS DOUBLE) / CAST(ct.n * (ct.n - 1) AS DOUBLE)
             AS expected_g
    FROM ct CROSS JOIN ag
    """,
)
def q_geo_getis_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Getis-Ord General G over the Moran/Geary lattice: the hot-spot
    # statistic — G = sum w y_i y_j / sum_{i<>j} y_i y_j compares the
    # neighbor-pair product mass to ALL ordered-pair product mass, so
    # (unlike Moran/Geary) it distinguishes clustering of HIGH values
    # from clustering of low ones; reported next to its null
    # expectation E[G] = S0/(N(N-1)). Numerator reuses Moran's exact
    # pair-product moment; the denominator is the exact identity
    # Sy^2 - Syy (ordered pairs i<>j) — every term DECIMAL(38,0), two
    # double divisions, bit-exact, no rounding. Same lattice-bounded
    # cost shape as q_geo_moran_i.
    pts = table(spark, sf_dir, "customer").select(
        (((F.col("c_custkey") * 37) % 160 - 80).cast("double") + 0.5).alias("lat"),
        (((F.col("c_custkey") * 73) % 360 - 180).cast("double") + 0.5).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 10).cast("bigint").alias("cell_lat"),
        F.floor(F.col("lon") / 10).cast("bigint").alias("cell_lon"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    cells = cells.localCheckpoint(eager=False)  # feeds both join sides + moments
    offs = spark.sql(
        "SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dl, dn)"
    )
    a = cells.select(
        F.col("cell_lat").alias("al"), F.col("cell_lon").alias("an"),
        F.col("y").alias("yi"),
    )
    b = cells.select(
        F.col("cell_lat").alias("bl"), F.col("cell_lon").alias("bn"),
        F.col("y").alias("yj"),
    )
    pairs = (
        a.crossJoin(F.broadcast(offs))
        .join(
            F.broadcast(b),
            (F.col("bl") == F.col("al") + F.col("dl"))
            & (F.col("bn") == F.col("an") + F.col("dn")),
        )
        .select("yi", "yj")
    )
    ag = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("s0"),
        F.sum(F.col("yi").cast("decimal(38,0)") * F.col("yj"))
        .cast("decimal(38,0)")
        .alias("pa"),
    )
    ct = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    return ct.crossJoin(F.broadcast(ag)).selectExpr(
        "n AS n_cells",
        "s0",
        "CAST(pa AS DOUBLE)"
        " / CAST(CAST(sy AS DECIMAL(38,0)) * sy - syy AS DOUBLE) AS getis_g",
        "CAST(s0 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS expected_g",
    )


def _bd_e(i: int) -> str:
    # Expected exposed-case count under the common OR psi for stratum i:
    # the in-range (minus) root of (psi-1)E^2 - B E + psi r1 c1 = 0,
    # B = psi(r1+c1) + (n - r1 - c1) — verified in-range over 20k random
    # tables x psi in [0.05, 20].
    r1, c1 = f"(a{i} + b{i})", f"(a{i} + c{i})"
    bq = f"(psi * ({r1} + {c1}) + (n{i} - {r1} - {c1}))"
    return (
        f"(({bq} - sqrt({bq} * {bq}"
        f" - 4.0e0 * (psi - 1.0e0) * psi * {r1} * {c1}))"
        f" / (2.0e0 * (psi - 1.0e0)))"
    )


def _bd_term(i: int) -> str:
    r1, c1 = f"(a{i} + b{i})", f"(a{i} + c{i})"
    return (
        f"(a{i} - ee{i}) * (a{i} - ee{i})"
        f" * (1.0e0 / ee{i} + 1.0e0 / ({r1} - ee{i})"
        f" + 1.0e0 / ({c1} - ee{i})"
        f" + 1.0e0 / (n{i} - {r1} - {c1} + ee{i}))"
    )


@register(
    "q_stat_breslow_day",
    oracle=f"""
    WITH x AS (
      SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             CASE WHEN value >= 50 THEN 1 ELSE 0 END AS e,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    piv AS (
      SELECT
        {", ".join(
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 1 AND y = 1) AS BIGINT) AS a{i}, "
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 1 AND y = 0) AS BIGINT) AS b{i}, "
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 0 AND y = 1) AS BIGINT) AS c{i}, "
            f"CAST(count(*) FILTER (WHERE dow = {i} AND e = 0 AND y = 0) AS BIGINT) AS d{i}"
            for i in range(7))}
      FROM x
    ),
    t AS (
      SELECT *,
        {", ".join(f"CAST(a{i} + b{i} + c{i} + d{i} AS BIGINT) AS n{i}" for i in range(7))}
      FROM piv
    ),
    p1 AS (
      SELECT *,
        ({_mh_terms("CAST(CAST(a{i} AS HUGEINT) * d{i} AS DOUBLE) / n{i}")})
          / ({_mh_terms("CAST(CAST(b{i} AS HUGEINT) * c{i} AS DOUBLE) / n{i}")})
          AS psi
      FROM t
    ),
    ex AS (
      SELECT *, {", ".join(f"{_bd_e(i)} AS ee{i}" for i in range(7))} FROM p1
    )
    SELECT {_mh_terms("n{i}")} AS n, psi AS or_mh,
           CAST(6 AS BIGINT) AS df,
           {" + ".join(_bd_term(i) for i in range(7))} AS bd_stat
    FROM ex
    """,
)
def q_stat_breslow_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Breslow-Day homogeneity-of-odds-ratios test over the
    # mantel_haenszel day-of-week strata: is the high-value ->
    # purchase association the SAME in every stratum, or does the MH
    # common OR average away real effect modification? Per stratum the
    # expected exposed-case count under the common OR is the closed
    # form in-range root of the Breslow-Day quadratic (_bd_e above),
    # and X2 = sum (a_k - E_k)^2 / Var_k with Var_k the harmonic
    # variance of the four expected cells, df = K-1 = 6. Everything
    # rides the SAME one-row 28-cell pivot as q_stat_mantel_haenszel:
    # psi is the MH fixed chain, each E/V/term is one double tree over
    # named scalar columns, and the stratum sum is a FIXED 7-term
    # chain -> bit-exact cross-engine, NO rounding (sqrt is correctly
    # rounded; psi = 1 exactly would 0/0 but is measure-zero for real
    # counts). 100 TB: one conditional-count scan, O(1) after.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        F.expr("(unix_micros(ts) div 86400000000 + 4) % 7").alias("dow"),
        F.when(F.col("value") >= 50, 1).otherwise(0).alias("e"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    piv = x.agg(
        *[
            agg
            for i in range(7)
            for agg in (
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0)).cast("bigint").alias(f"a{i}"),
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 1) & (F.col("y") == 0), 1).otherwise(0)).cast("bigint").alias(f"b{i}"),
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 0) & (F.col("y") == 1), 1).otherwise(0)).cast("bigint").alias(f"c{i}"),
                F.sum(F.when((F.col("dow") == i) & (F.col("e") == 0) & (F.col("y") == 0), 1).otherwise(0)).cast("bigint").alias(f"d{i}"),
            )
        ]
    )
    t = piv.selectExpr(
        "*", *[f"CAST(a{i} + b{i} + c{i} + d{i} AS BIGINT) AS n{i}" for i in range(7)]
    )
    r_txt = _mh_terms("CAST(CAST(a{i} AS DECIMAL(38,0)) * d{i} AS DOUBLE) / n{i}")
    s_txt = _mh_terms("CAST(CAST(b{i} AS DECIMAL(38,0)) * c{i} AS DOUBLE) / n{i}")
    p1 = t.selectExpr("*", f"({r_txt}) / ({s_txt}) AS psi")
    ex = p1.selectExpr("*", *[f"{_bd_e(i)} AS ee{i}" for i in range(7)])
    return ex.selectExpr(
        _mh_terms("n{i}") + " AS n",
        "psi AS or_mh",
        "CAST(6 AS BIGINT) AS df",
        " + ".join(_bd_term(i) for i in range(7)) + " AS bd_stat",
    )


@register(
    "q_stat_dunn_posthoc",
    oracle="""
    WITH x AS (
      SELECT value AS v, event_type AS g
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    gv AS (
      SELECT v, g, CAST(count(*) AS BIGINT) AS ngv FROM x GROUP BY v, g
    ),
    pv AS (SELECT v, CAST(sum(ngv) AS BIGINT) AS n FROM gv GROUP BY v),
    c AS (
      SELECT v, n,
             CAST(sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumn
      FROM pv
    ),
    r AS (SELECT v, 2 * (cumn - n) + n + 1 AS r2v FROM c),
    pg AS (
      SELECT g, CAST(sum(ngv) AS BIGINT) AS n_g,
             CAST(sum(ngv * r2v) AS BIGINT) AS r2_g
      FROM gv JOIN r USING (v) GROUP BY g
    ),
    t AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_tot,
             CAST(sum(CASE WHEN n > 1
                      THEN CAST(n AS HUGEINT) * n * n - n ELSE 0 END)
                  AS HUGEINT) AS tie3
      FROM c
    )
    SELECT a.g AS g1, b.g AS g2,
           CAST(a.r2_g AS DOUBLE) / (2.0e0 * a.n_g) AS mean_rank_1,
           CAST(b.r2_g AS DOUBLE) / (2.0e0 * b.n_g) AS mean_rank_2,
           (CAST(a.r2_g AS DOUBLE) / (2.0e0 * a.n_g)
            - CAST(b.r2_g AS DOUBLE) / (2.0e0 * b.n_g))
             / sqrt((CAST(t.n_tot AS DOUBLE) * (t.n_tot + 1) / 12.0e0
                     - CAST(t.tie3 AS DOUBLE) / (12.0e0 * (t.n_tot - 1)))
                    * (1.0e0 / a.n_g + 1.0e0 / b.n_g)) AS z
    FROM pg a JOIN pg b ON a.g < b.g CROSS JOIN t
    """,
)
def q_stat_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dunn's post-hoc pairwise comparisons after Kruskal-Wallis: for
    # every pair of event_type arms, z = (Rbar_i - Rbar_j) /
    # sqrt((N(N+1)/12 - SUM(t^3-t)/(12(N-1))) (1/n_i + 1/n_j)) with the
    # tie-corrected pooled rank variance — the which-groups-differ
    # readout q_stat_kruskal's omnibus H cannot give. Rides the
    # IDENTICAL exact machinery: doubled tied ranks off the value-
    # support prefix sum, per-group integer moments (n_g, 2R_g), tie
    # cubes in HUGEINT/DECIMAL; the pairwise frame is a k x k self-join
    # of the k-row group frame (k=5 -> 10 rows). Every z is one double
    # tree over exact integers -> bit-exact, NO rounding, no
    # engine-order sums. 100 TB: one contingency agg + one support
    # prefix sum (the kruskal cost), then k-row frames.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    x = ev.select(F.col("value").alias("v"), F.col("event_type").alias("g"))
    gv = x.groupBy("v", "g").agg(F.count(F.lit(1)).cast("bigint").alias("ngv"))
    gv = gv.localCheckpoint(eager=False)  # feeds pooled support + group sums
    pv = gv.groupBy("v").agg(F.sum("ngv").cast("bigint").alias("n"))
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + tie totals
    c = prefix_sum(pv, "n", order_by=[F.col("v")], name="cumn")
    r = c.select(
        "v", (2 * (F.col("cumn") - F.col("n")) + F.col("n") + 1).alias("r2v")
    )
    pg = (
        gv.join(r, "v")
        .groupBy("g")
        .agg(
            F.sum("ngv").cast("bigint").alias("n_g"),
            F.sum(F.col("ngv") * F.col("r2v")).cast("bigint").alias("r2_g"),
        )
    )
    t = c.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.col("n").cast("decimal(38,0)") * F.col("n") * F.col("n")
                - F.col("n"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    a = pg.select(
        F.col("g").alias("g1"), F.col("n_g").alias("na"), F.col("r2_g").alias("ra")
    )
    b = pg.select(
        F.col("g").alias("g2"), F.col("n_g").alias("nb"), F.col("r2_g").alias("rb")
    )
    return (
        a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(t))
        .selectExpr(
            "g1",
            "g2",
            "CAST(ra AS DOUBLE) / (2.0e0 * na) AS mean_rank_1",
            "CAST(rb AS DOUBLE) / (2.0e0 * nb) AS mean_rank_2",
            "(CAST(ra AS DOUBLE) / (2.0e0 * na)"
            " - CAST(rb AS DOUBLE) / (2.0e0 * nb))"
            " / sqrt((CAST(n_tot AS DOUBLE) * (n_tot + 1) / 12.0e0"
            "         - CAST(tie3 AS DOUBLE) / (12.0e0 * (n_tot - 1)))"
            "        * (1.0e0 / na + 1.0e0 / nb)) AS z",
        )
    )


@register(
    "q_stat_cucconi",
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_y
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    gv AS (
      SELECT v, CAST(sum(is_y) AS BIGINT) AS ny,
             CAST(sum(1 - is_y) AS BIGINT) AS nx
      FROM x GROUP BY v
    ),
    c AS (
      SELECT v, ny, nx,
             CAST(sum(ny + nx) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM gv
    ),
    t AS (
      SELECT CAST(sum(ny) AS BIGINT) AS m, CAST(sum(nx) AS BIGINT) AS n
      FROM gv
    ),
    r AS (
      SELECT c.v, c.ny, t.m, t.n, t.m + t.n AS nn,
             2 * (c.cum - (c.ny + c.nx)) + (c.ny + c.nx) + 1 AS r2
      FROM c CROSS JOIN t
    ),
    mo AS (
      SELECT max(m) AS m, max(n) AS n, max(nn) AS nn,
             CAST(sum(CAST(ny AS DECIMAL(38,0)) * r2 * r2) AS DECIMAL(38,0))
               AS sr2,
             CAST(sum(CAST(ny AS DECIMAL(38,0))
                      * (2 * (nn + 1) - r2) * (2 * (nn + 1) - r2))
                  AS DECIMAL(38,0)) AS sc2
      FROM r GROUP BY nn
    ),
    uv AS (
      SELECT m, n, nn,
             (6.0e0 * (CAST(sr2 AS DOUBLE) / 4.0e0)
              - m * (CAST(nn AS DOUBLE) + 1) * (2.0e0 * nn + 1))
               / sqrt(CAST(m AS DOUBLE) * n * (nn + 1) * (2.0e0 * nn + 1)
                      * (8.0e0 * nn + 11) / 5.0e0) AS u,
             (6.0e0 * (CAST(sc2 AS DOUBLE) / 4.0e0)
              - m * (CAST(nn AS DOUBLE) + 1) * (2.0e0 * nn + 1))
               / sqrt(CAST(m AS DOUBLE) * n * (nn + 1) * (2.0e0 * nn + 1)
                      * (8.0e0 * nn + 11) / 5.0e0) AS v_,
             2.0e0 * (CAST(nn AS DOUBLE) * nn - 4)
               / ((2.0e0 * nn + 1) * (8.0e0 * nn + 11)) - 1.0e0 AS rho
      FROM mo
    )
    SELECT m AS n_purchase, n AS n_click,
           round((u * u + v_ * v_ - 2.0e0 * rho * u * v_)
                 / (2.0e0 * (1.0e0 - rho * rho)), 6) AS cucconi_c
    FROM uv
    """,
)
def q_stat_cucconi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cucconi's joint location-scale two-sample test (purchase vs
    # click values) — the single-statistic alternative to running
    # Mann-Whitney (location) and Ansari-Bradley (scale) separately,
    # and historically PRIOR to the better-known Lepage combination:
    # C = (U^2 + V^2 - 2 rho U V) / (2 (1 - rho^2)) with U from the
    # squared pooled ranks of the Y sample and V from the squared
    # CONTRARY ranks (N + 1 - R). Midranks extend it to ties: the
    # doubled-rank support lane gives Sum R^2 = Sum r2^2 / 4 exactly,
    # and the contrary doubled rank is 2(N+1) - r2 — both rank-square
    # moments are EXACT DECIMAL(38,0) integers (r2^2 ~ 4N^2 x counts
    # crosses BIGINT at replica scale, the kruskal n^3 lesson). U, V,
    # rho, C are staged double trees over those exact moments ->
    # round-6 only for the engine-shared sqrt/division sequence (the
    # kruskal rule; no engine-order float sums anywhere). 100 TB: one
    # contingency agg + one support prefix sum, scalar frames after.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events")
    x = ev.where(
        F.col("value").isNotNull() & F.col("event_type").isin("purchase", "click")
    ).select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_y"),
    )
    gv = x.groupBy("v").agg(
        F.sum("is_y").cast("bigint").alias("ny"),
        F.sum(1 - F.col("is_y")).cast("bigint").alias("nx"),
    )
    gv = gv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    gv2 = gv.withColumn("cnt", (F.col("ny") + F.col("nx")).cast("bigint"))
    c = prefix_sum(gv2, "cnt", order_by=[F.col("v")], name="cum")
    t = gv.agg(
        F.sum("ny").cast("bigint").alias("m"),
        F.sum("nx").cast("bigint").alias("n"),
    )
    r = c.crossJoin(F.broadcast(t)).selectExpr(
        "v",
        "ny",
        "m",
        "n",
        "m + n AS nn",
        "2 * (cum - cnt) + cnt + 1 AS r2",
    )
    mo = r.groupBy("nn").agg(
        F.max("m").alias("m"),
        F.max("n").alias("n"),
        F.sum(
            F.expr("CAST(ny AS DECIMAL(38,0)) * r2 * r2")
        ).cast("decimal(38,0)").alias("sr2"),
        F.sum(
            F.expr(
                "CAST(ny AS DECIMAL(38,0))"
                " * (2 * (nn + 1) - r2) * (2 * (nn + 1) - r2)"
            )
        ).cast("decimal(38,0)").alias("sc2"),
    )
    uv = mo.selectExpr(
        "m",
        "n",
        "nn",
        "(6.0e0 * (CAST(sr2 AS DOUBLE) / 4.0e0)"
        " - m * (CAST(nn AS DOUBLE) + 1) * (2.0e0 * nn + 1))"
        " / sqrt(CAST(m AS DOUBLE) * n * (nn + 1) * (2.0e0 * nn + 1)"
        "        * (8.0e0 * nn + 11) / 5.0e0) AS u",
        "(6.0e0 * (CAST(sc2 AS DOUBLE) / 4.0e0)"
        " - m * (CAST(nn AS DOUBLE) + 1) * (2.0e0 * nn + 1))"
        " / sqrt(CAST(m AS DOUBLE) * n * (nn + 1) * (2.0e0 * nn + 1)"
        "        * (8.0e0 * nn + 11) / 5.0e0) AS v_",
        "2.0e0 * (CAST(nn AS DOUBLE) * nn - 4)"
        " / ((2.0e0 * nn + 1) * (8.0e0 * nn + 11)) - 1.0e0 AS rho",
    )
    return uv.selectExpr(
        "m AS n_purchase",
        "n AS n_click",
        "round((u * u + v_ * v_ - 2.0e0 * rho * u * v_)"
        " / (2.0e0 * (1.0e0 - rho * rho)), 6) AS cucconi_c",
    )


# Fixed multiplicative-hash parameters for the Count-Min Sketch key:
# d = 4 rows x w = 64 buckets; bucket_i(u) = ((u * A_i + B_i) mod P)
# mod w with P = 1048583 (prime > 2^20). Pure BIGINT arithmetic ->
# identical in both engines, no hex parsing, no md5.
_CMS_P = 1048583
_CMS_W = 64
_CMS_ROWS = ((1000003, 12345), (999983, 54321), (999979, 98765), (1000033, 24680))


@register(
    "q_sketch_countmin",
    oracle=f"""
    WITH uc AS (
      SELECT user_id AS u, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    hh AS (
      SELECT r.i, uc.u, uc.cnt,
             ((uc.u * r.a + r.b) % {_CMS_P}) % {_CMS_W} AS bucket
      FROM uc
      CROSS JOIN (
        SELECT * FROM (VALUES
          {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_ROWS))}
        ) AS t(i, a, b)
      ) r
    ),
    counters AS (
      SELECT i, bucket, CAST(sum(cnt) AS BIGINT) AS c
      FROM hh GROUP BY i, bucket
    ),
    top5 AS (
      SELECT u, cnt FROM uc ORDER BY cnt DESC, u LIMIT 5
    ),
    est AS (
      SELECT t.u, t.cnt, CAST(min(co.c) AS BIGINT) AS cms_est
      FROM top5 t
      CROSS JOIN (
        SELECT * FROM (VALUES
          {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_ROWS))}
        ) AS t2(i, a, b)
      ) r
      JOIN counters co
        ON co.i = r.i AND co.bucket = ((t.u * r.a + r.b) % {_CMS_P}) % {_CMS_W}
      GROUP BY t.u, t.cnt
    )
    SELECT u AS user_id, cnt AS exact_cnt, cms_est,
           CAST(cms_est - cnt AS BIGINT) AS overcount
    FROM est
    """,
)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-Min Sketch heavy-hitter estimation with an EXACT value
    # oracle — the sketch family's only fully-checkable member (HLL and
    # KLL are estimate-parameterized rows-only keys; CMS with FIXED
    # multiplicative hashes is bit-deterministic): d=4 x w=64 counters
    # over per-user event counts, and for the five heaviest users
    # (deterministic order: count desc, user_id) the CMS estimate
    # min_i counter[i][bucket_i(u)] next to the exact count — the
    # classic one-sided overcount is visible in the output. Everything
    # is exact BIGINT: counters are one hash-key aggregate of the
    # per-user frame (4x fan-out, 256 counter cells total at ANY data
    # size), estimates a 5x4 broadcast join. 100 TB: one user
    # aggregate; the sketch itself is O(d*w) — THE mergeable-summary
    # pattern for distributed heavy-hitter monitoring.
    uc = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("u"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    uc = uc.localCheckpoint(eager=False)  # feeds counters + top5
    rows_sql = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_ROWS))
    rfr = spark.sql(f"SELECT * FROM (VALUES {rows_sql}) AS t(i, a, b)")
    hh = uc.crossJoin(F.broadcast(rfr)).selectExpr(
        "i",
        "u",
        "cnt",
        f"((u * a + b) % {_CMS_P}) % {_CMS_W} AS bucket",
    )
    counters = hh.groupBy("i", "bucket").agg(F.sum("cnt").cast("bigint").alias("c"))
    top5 = uc.orderBy(F.col("cnt").desc(), F.col("u")).limit(5)
    est = (
        top5.crossJoin(F.broadcast(rfr.selectExpr("i AS i2", "a", "b")))
        .join(
            counters,
            (F.col("i") == F.col("i2"))
            & (
                F.col("bucket")
                == ((F.col("u") * F.col("a") + F.col("b")) % _CMS_P) % _CMS_W
            ),
        )
        .groupBy("u", "cnt")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )
    return est.selectExpr(
        "u AS user_id",
        "cnt AS exact_cnt",
        "cms_est",
        "CAST(cms_est - cnt AS BIGINT) AS overcount",
    )


# AMS sketch sign-hash rows: s_i(u) = 1 - 2*((u*A_i + B_i) mod P mod 2),
# five fixed rows so the median estimate is the exact 3rd order
# statistic — all BIGINT/DECIMAL arithmetic, no randomness at runtime.
_AMS_ROWS = (
    (1000003, 12345),
    (999983, 54321),
    (999979, 98765),
    (1000033, 24680),
    (1000037, 13579),
)


@register(
    "q_sketch_ams_f2",
    oracle=f"""
    WITH uc AS (
      SELECT user_id AS u, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    sg AS (
      SELECT r.i, uc.u, uc.cnt,
             1 - 2 * (((uc.u * r.a + r.b) % {_CMS_P}) % 2) AS s
      FROM uc
      CROSS JOIN (
        SELECT * FROM (VALUES
          {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_AMS_ROWS))}
        ) AS t(i, a, b)
      ) r
    ),
    xs AS (
      SELECT i, CAST(sum(s * cnt) AS BIGINT) AS x FROM sg GROUP BY i
    ),
    ests AS (
      SELECT i, CAST(CAST(x AS DECIMAL(38,0)) * x AS DECIMAL(38,0)) AS est
      FROM xs
    ),
    rk AS (
      SELECT a.i, a.est,
             CAST(sum(CASE WHEN b.est < a.est
                           OR (b.est = a.est AND b.i <= a.i)
                      THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM ests a CROSS JOIN ests b GROUP BY a.i, a.est
    ),
    med AS (SELECT est AS ams_f2 FROM rk WHERE r = 3),
    ex AS (
      SELECT CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0))
               AS exact_f2,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM uc
    )
    SELECT ex.n_keys, CAST(ex.exact_f2 AS DOUBLE) AS exact_f2,
           CAST(med.ams_f2 AS DOUBLE) AS ams_f2,
           CAST(med.ams_f2 AS DOUBLE) / CAST(ex.exact_f2 AS DOUBLE) AS ratio
    FROM ex CROSS JOIN med
    """,
)
def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AMS (Alon-Matias-Szegedy) second-frequency-moment sketch with an
    # EXACT value oracle: five fixed sign-hash rows s_i(u) = +-1, each
    # row's estimate is (sum_u s_i(u) cnt_u)^2, and the sketch output
    # is the MEDIAN row (exact 3rd order statistic via a 5x5
    # total-order rank join — ties broken by row id, so the median is
    # engine-identical). Reported next to the exact F2 = sum cnt^2 and
    # their ratio — the estimator's multiplicative error is visible in
    # the output, the q_sketch_countmin pattern applied to join-size /
    # self-join cost estimation (F2 IS the self-join size). Every
    # quantity is exact BIGINT/DECIMAL(38,0); the only doubles are the
    # final casts and one division -> bit-exact, no rounding. 100 TB:
    # one per-user aggregate, a 5x fan-out of the user frame into five
    # signed sums (each a partial-aggregated scalar), O(1) after.
    uc = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("u"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    uc = uc.localCheckpoint(eager=False)  # feeds sign sums + exact F2
    rows_sql = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_AMS_ROWS))
    rfr = spark.sql(f"SELECT * FROM (VALUES {rows_sql}) AS t(i, a, b)")
    sg = uc.crossJoin(F.broadcast(rfr)).selectExpr(
        "i",
        "cnt",
        f"1 - 2 * (((u * a + b) % {_CMS_P}) % 2) AS s",
    )
    xs = sg.groupBy("i").agg(F.sum(F.col("s") * F.col("cnt")).cast("bigint").alias("x"))
    ests = xs.selectExpr("i", "CAST(CAST(x AS DECIMAL(38,0)) * x AS DECIMAL(38,0)) AS est")
    a = ests.selectExpr("i", "est")
    b = ests.selectExpr("i AS ib", "est AS estb")
    rk = (
        a.crossJoin(F.broadcast(b))
        .groupBy("i", "est")
        .agg(
            F.sum(
                F.when(
                    (F.col("estb") < F.col("est"))
                    | ((F.col("estb") == F.col("est")) & (F.col("ib") <= F.col("i"))),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("r")
        )
    )
    med = rk.where(F.col("r") == 3).select(F.col("est").alias("ams_f2"))
    ex = uc.agg(
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt"))
        .cast("decimal(38,0)")
        .alias("exact_f2"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return ex.crossJoin(F.broadcast(med)).selectExpr(
        "n_keys",
        "CAST(exact_f2 AS DOUBLE) AS exact_f2",
        "CAST(ams_f2 AS DOUBLE) AS ams_f2",
        "CAST(ams_f2 AS DOUBLE) / CAST(exact_f2 AS DOUBLE) AS ratio",
    )


@register(
    "q_stat_by_fdr",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE value >= 50) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    t AS (
      SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(x) AS BIGINT) AS tx,
             CAST(count(*) AS BIGINT) AS m
      FROM g
    ),
    z AS (
      SELECT grp, dow, n, x, m,
             (CAST(x AS DOUBLE) / n - CAST(tx AS DOUBLE) / tn)
               / sqrt((CAST(tx AS DOUBLE) / tn) * (1 - CAST(tx AS DOUBLE) / tn) / n)
               AS zval
      FROM g CROSS JOIN t
    ),
    xh_ AS (SELECT grp, dow, n, x, m, zval, abs(zval) / sqrt(2.0e0) AS xh FROM z),
    p AS (
      SELECT grp, dow, n, x, m, round(zval, 6) AS z,
             round({_P_TWO_SIDED}, 6) AS p_value
      FROM xh_
    ),
    r AS (
      SELECT *, CAST(row_number() OVER (ORDER BY p_value, grp, dow) AS BIGINT)
                  AS rk
      FROM p
    ),
    h AS (
      SELECT *, sum(1.0e0 / rk) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING)
                  AS hcum
      FROM r
    ),
    hm AS (SELECT max(hcum) AS harm FROM h),
    cut AS (
      SELECT COALESCE(max(CASE WHEN h.p_value * h.m * hm.harm
                                    <= h.rk * 0.05e0
                           THEN h.rk END), 0) AS k
      FROM h CROSS JOIN hm
    )
    SELECT grp, dow, n, x, z, p_value, rk,
           rk * 0.05e0 / (m * hm.harm) AS by_critical,
           rk <= cut.k AS rejected
    FROM h CROSS JOIN hm CROSS JOIN cut
    """,
)
def q_stat_by_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benjamini-Yekutieli FDR over a 35-hypothesis family (event_type x
    # day-of-week cells vs the global high-value rate) — the
    # arbitrary-dependence-safe step-up that q_stat_bh_fdr's
    # independence assumption cannot give: reject at
    # p_(i) <= i*alpha/(m*H_m) with the harmonic penalty H_m = sum 1/j.
    # H_m is computed as a PREFIX sum along the rank order (sequential
    # op order identical in both engines -> bit-identical, never an
    # unordered float reduce); p-values ride the shared erf fragment
    # pre-rounded to 6 so the (p, grp, dow) rank order and the cutoff
    # index are bit-stable. The dow strata reuse the epoch-day
    # arithmetic of the mantel_haenszel lane. 100 TB: one
    # conditional-count scan; everything after lives on the 35-row
    # family frame.
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    g = ev.groupBy(
        F.col("event_type").alias("grp"),
        F.expr("(unix_micros(ts) div 86400000000 + 4) % 7").alias("dow"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") >= 50, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    g = g.localCheckpoint(eager=False)  # feeds totals + per-cell rows
    t = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("x").cast("bigint").alias("tx"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    z = g.crossJoin(F.broadcast(t)).selectExpr(
        "grp",
        "dow",
        "n",
        "x",
        "m",
        "(CAST(x AS DOUBLE) / n - CAST(tx AS DOUBLE) / tn)"
        " / sqrt((CAST(tx AS DOUBLE) / tn) * (1 - CAST(tx AS DOUBLE) / tn) / n)"
        " AS zval",
    )
    xh_ = z.withColumn("xh", F.abs(F.col("zval")) / F.sqrt(F.lit(2.0)))
    p = xh_.selectExpr(
        "grp",
        "dow",
        "n",
        "x",
        "m",
        "round(zval, 6) AS z",
        f"round({_P_TWO_SIDED}, 6) AS p_value",
    )
    w = Window.orderBy("p_value", "grp", "dow")
    r = p.withColumn("rk", F.row_number().over(w).cast("bigint"))
    wc = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h = r.withColumn("hcum", F.sum(F.lit(1.0) / F.col("rk")).over(wc))
    hm = h.agg(F.max("hcum").alias("harm"))
    cut = (
        h.crossJoin(F.broadcast(hm))
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("p_value") * F.col("m") * F.col("harm")
                        <= F.col("rk") * 0.05,
                        F.col("rk"),
                    )
                ),
                F.lit(0).cast("bigint"),
            ).alias("k")
        )
    )
    return (
        h.crossJoin(F.broadcast(hm))
        .crossJoin(F.broadcast(cut))
        .selectExpr(
            "grp",
            "dow",
            "n",
            "x",
            "z",
            "p_value",
            "rk",
            "rk * 0.05e0 / (m * harm) AS by_critical",
            "rk <= k AS rejected",
        )
    )


@register(
    "q_ts_seasonal_mann_kendall",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h,
             (epoch_us(time_bucket(INTERVAL '1 hour', ts)) // 3600000000) % 24
               AS season,
             sum(CAST(value AS DECIMAL(18,2))) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN a.x < c.x THEN 1
                           WHEN a.x > c.x THEN -1 ELSE 0 END) AS BIGINT) AS mk_s
      FROM b a JOIN b c ON a.season = c.season AND a.h < c.h
    ),
    ns AS (
      SELECT season, CAST(count(*) AS BIGINT) AS n_k FROM b GROUP BY season
    ),
    vb AS (
      SELECT CAST(sum(n_k * (n_k - 1) * (2 * n_k + 5)) AS BIGINT) AS base,
             CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(n_k) AS BIGINT) AS n_total
      FROM ns
    ),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_adj
      FROM (SELECT CAST(count(*) AS BIGINT) AS t
            FROM b GROUP BY season, x HAVING count(*) > 1)
    )
    SELECT vb.n_seasons, vb.n_total, s.mk_s,
           round((s.mk_s - CASE WHEN s.mk_s > 0 THEN 1
                                WHEN s.mk_s < 0 THEN -1 ELSE 0 END)
                 / sqrt((CAST(vb.base AS DOUBLE) - ties.tie_adj) / 18.0e0), 12)
             AS smk_z
    FROM s, vb, ties
    """,
)
def q_ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Seasonal Mann-Kendall (Hirsch-Slack) on the hourly-total series
    # with hour-of-day seasons: S = sum over seasons of the
    # within-season pairwise sign sums — the trend test that is NOT
    # fooled by the daily cycle q_ts_mann_kendall's global pairs
    # conflate with drift. Seasons come from pure integer epoch-hour
    # arithmetic ((epoch_us // 3600e6) % 24 — engine-identical, no
    # timezone extraction), sign sums are exact comparisons of exact
    # decimal bucket totals, and the variance is the per-season
    # tie-corrected sum Var = (sum n_k(n_k-1)(2n_k+5) - ties)/18 —
    # all exact BIGINT until one sqrt tree (continuity-corrected z,
    # round-12, the MK rule). The within-season pair join is 24x
    # smaller than global MK's. 100 TB: the bucket frame is bounded by
    # the time span; the pair join is season-partitioned
    # span-quadratic — coarsen the bucket when the span grows (the
    # m4-downsample rationale).
    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(F.window("ts", "1 hour").getField("start").alias("h"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("x"))
        .selectExpr(
            "h",
            "(unix_micros(h) div 3600000000) % 24 AS season",
            "x",
        )
    )
    b = b.localCheckpoint(eager=False)  # feeds pairs + counts + ties
    a = b.select(
        F.col("season").alias("sa"), F.col("h").alias("ha"), F.col("x").alias("xa")
    )
    c2 = b.select(
        F.col("season").alias("sc"), F.col("h").alias("hc"), F.col("x").alias("xc")
    )
    s = (
        a.join(
            F.broadcast(c2),
            (F.col("sa") == F.col("sc")) & (F.col("ha") < F.col("hc")),
        )
        .agg(
            F.sum(
                F.when(F.col("xa") < F.col("xc"), 1)
                .when(F.col("xa") > F.col("xc"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("mk_s")
        )
    )
    ns = b.groupBy("season").agg(F.count(F.lit(1)).cast("bigint").alias("n_k"))
    vb = ns.agg(
        F.sum(F.col("n_k") * (F.col("n_k") - 1) * (2 * F.col("n_k") + 5))
        .cast("bigint")
        .alias("base"),
        F.count(F.lit(1)).cast("bigint").alias("n_seasons"),
        F.sum("n_k").cast("bigint").alias("n_total"),
    )
    ties = (
        b.groupBy("season", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_adj")
        )
    )
    return (
        s.crossJoin(F.broadcast(vb))
        .crossJoin(F.broadcast(ties))
        .selectExpr(
            "n_seasons",
            "n_total",
            "mk_s",
            "round((mk_s - CASE WHEN mk_s > 0 THEN 1"
            "              WHEN mk_s < 0 THEN -1 ELSE 0 END)"
            " / sqrt((CAST(base AS DOUBLE) - tie_adj) / 18.0e0), 12) AS smk_z",
        )
    )


@register(
    "q_stat_cliffs_delta",
    oracle="""
    WITH pv AS (
      SELECT value AS v,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS np,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS nn
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    c AS (
      SELECT np, nn,
             CAST(sum(nn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumn
      FROM pv
    ),
    t AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg
      FROM pv
    ),
    s AS (
      SELECT n_pos, n_neg,
             CAST(sum(CAST(np AS DECIMAL(38,0)) * (cumn - nn)) AS DECIMAL(38,0))
               AS gt,
             CAST(sum(CAST(np AS DECIMAL(38,0)) * (n_neg - cumn)) AS DECIMAL(38,0))
               AS lt
      FROM c CROSS JOIN t GROUP BY n_pos, n_neg
    )
    SELECT n_pos, n_neg,
           CAST(gt AS DOUBLE) AS n_greater, CAST(lt AS DOUBLE) AS n_less,
           CAST(gt - lt AS DOUBLE)
             / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS cliffs_delta
    FROM s
    """,
)
def q_stat_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cliff's delta (purchase vs click values): the robust ordinal
    # effect size d = (#(X>Y) - #(X<Y)) / (n m) — what
    # q_stat_rank_biserial is to Mann-Whitney, but defined directly on
    # dominance counts, insensitive to any monotone transform, and the
    # standard companion to report WITH the Mann-Whitney p (significant
    # != large). Both dominance counts come EXACTLY off the value-
    # support prefix sum (the q_ml_auc lane: #(X>Y) = SUM np_v *
    # cumneg_strictly_below; #(X<Y) = SUM np_v * negatives_above),
    # accumulated in DECIMAL(38,0) (products cross BIGINT at replica
    # scale), with ONE double division -> bit-exact, no rounding.
    # 100 TB: one contingency agg + one support prefix sum.
    from trembita_spark.operators.ranking import prefix_sum

    ev = table(spark, sf_dir, "events")
    x = ev.where(
        F.col("value").isNotNull() & F.col("event_type").isin("purchase", "click")
    )
    pv = x.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("np"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("nn"),
    )
    pv = pv.localCheckpoint(eager=False)  # feeds prefix sum + totals
    c = prefix_sum(pv, "nn", order_by=[F.col("v")], name="cumn")
    t = pv.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
    )
    s = (
        c.crossJoin(F.broadcast(t))
        .groupBy("n_pos", "n_neg")
        .agg(
            F.sum(
                F.col("np").cast("decimal(38,0)") * (F.col("cumn") - F.col("nn"))
            )
            .cast("decimal(38,0)")
            .alias("gt"),
            F.sum(
                F.col("np").cast("decimal(38,0)") * (F.col("n_neg") - F.col("cumn"))
            )
            .cast("decimal(38,0)")
            .alias("lt"),
        )
    )
    return s.selectExpr(
        "n_pos",
        "n_neg",
        "CAST(gt AS DOUBLE) AS n_greater",
        "CAST(lt AS DOUBLE) AS n_less",
        "CAST(gt - lt AS DOUBLE)"
        " / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS cliffs_delta",
    )


@register(
    "q_stat_yuen_t",
    oracle="""
    WITH x AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    pv AS (
      SELECT is_a, v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY 1, 2
    ),
    c AS (
      SELECT is_a, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY is_a ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pv
    ),
    t AS (
      SELECT is_a, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt) // 5 AS BIGINT) AS g
      FROM pv GROUP BY is_a
    ),
    j AS (
      SELECT c.is_a, c.v, c.cnt, c.cum, t.n, t.g,
             greatest(CAST(0 AS BIGINT),
                      least(c.cum, t.n - t.g)
                      - greatest(c.cum - c.cnt, t.g)) AS clip
      FROM c JOIN t USING (is_a)
    ),
    mid AS (
      SELECT is_a, max(n) AS n, max(g) AS g,
             CAST(sum(CAST(clip AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS ms,
             CAST(sum(CAST(clip AS DECIMAL(38,0)) * v * v) AS DECIMAL(38,0))
               AS mss,
             max(CASE WHEN cum - cnt < g + 1 AND cum >= g + 1 THEN v END)
               AS v_lo,
             max(CASE WHEN cum - cnt < n - g AND cum >= n - g THEN v END)
               AS v_hi
      FROM j GROUP BY is_a
    ),
    fin AS (
      SELECT is_a, n, n - 2 * g AS h,
             CAST(ms AS DOUBLE) / (n - 2 * g) AS tmean,
             (CAST(mss AS DOUBLE) + g * CAST(v_lo AS DOUBLE) * v_lo
              + g * CAST(v_hi AS DOUBLE) * v_hi
              - CAST(n AS DOUBLE)
                * ((CAST(ms AS DOUBLE) + g * CAST(v_lo AS DOUBLE)
                    + g * CAST(v_hi AS DOUBLE)) / n)
                * ((CAST(ms AS DOUBLE) + g * CAST(v_lo AS DOUBLE)
                    + g * CAST(v_hi AS DOUBLE)) / n))
               / ((CAST(n AS DOUBLE) - 2 * g)
                  * (CAST(n AS DOUBLE) - 2 * g - 1)) AS d
      FROM mid
    ),
    w AS (
      SELECT max(CASE WHEN is_a = 1 THEN n END) AS n1,
             max(CASE WHEN is_a = 0 THEN n END) AS n2,
             max(CASE WHEN is_a = 1 THEN h END) AS h1,
             max(CASE WHEN is_a = 0 THEN h END) AS h2,
             max(CASE WHEN is_a = 1 THEN tmean END) AS tm1,
             max(CASE WHEN is_a = 0 THEN tmean END) AS tm2,
             max(CASE WHEN is_a = 1 THEN d END) AS d1,
             max(CASE WHEN is_a = 0 THEN d END) AS d2
      FROM fin
    )
    SELECT n1, n2, h1, h2,
           (tm1 - tm2) / 100.0e0 AS trimmed_mean_diff,
           (tm1 - tm2) / sqrt(d1 + d2) AS yuen_t,
           (d1 + d2) * (d1 + d2)
             / (d1 * d1 / (h1 - 1) + d2 * d2 / (h2 - 1)) AS df
    FROM w
    """,
)
def q_stat_yuen_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Yuen's trimmed-means t-test (purchase vs click, 20% trim): the
    # robust two-sample location test that survives the heavy tails
    # and outliers that invalidate q_stat_ttest — trimmed means
    # compared with Winsorized variances and Welch-Satterthwaite df.
    # Everything is exact order statistics on the per-arm cent-support
    # prefix sum: the middle-window sums clip each support run to ranks
    # (g, n-g] (the trimmed-mean machinery), the Winsorized boundary
    # values are the rank-(g+1) and rank-(n-g) order statistics (the
    # qq_deciles selection), and SSW/d_i/t/df are staged double trees
    # over exact DECIMAL(38,0) moments -> bit-exact, NO rounding (one
    # sqrt, correctly rounded). The winsorized-mean tree is repeated
    # verbatim where reused so both engines grow identical ASTs.
    # 100 TB: one contingency agg + one per-arm support prefix sum
    # (the two-arm window is the qq_deciles exemption); 2-row frames
    # after.
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    x = ev.where(
        F.col("value").isNotNull() & F.col("event_type").isin("purchase", "click")
    ).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    )
    pv = x.groupBy("is_a", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pv = pv.localCheckpoint(eager=False)  # feeds per-arm prefix + totals
    w_ = (
        Window.partitionBy("is_a")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = pv.withColumn("cum", F.sum("cnt").over(w_).cast("bigint"))
    t = pv.groupBy("is_a").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr("CAST(sum(cnt) div 5 AS BIGINT)").alias("g"),
    )
    j = c.join(F.broadcast(t), "is_a").selectExpr(
        "is_a",
        "v",
        "cnt",
        "cum",
        "n",
        "g",
        "greatest(CAST(0 AS BIGINT),"
        " least(cum, n - g) - greatest(cum - cnt, g)) AS clip",
    )
    mid = j.groupBy("is_a").agg(
        F.max("n").alias("n"),
        F.max("g").alias("g"),
        F.sum(F.expr("CAST(clip AS DECIMAL(38,0)) * v"))
        .cast("decimal(38,0)")
        .alias("ms"),
        F.sum(F.expr("CAST(clip AS DECIMAL(38,0)) * v * v"))
        .cast("decimal(38,0)")
        .alias("mss"),
        F.max(
            F.expr("CASE WHEN cum - cnt < g + 1 AND cum >= g + 1 THEN v END")
        ).alias("v_lo"),
        F.max(
            F.expr("CASE WHEN cum - cnt < n - g AND cum >= n - g THEN v END")
        ).alias("v_hi"),
    )
    fin = mid.selectExpr(
        "is_a",
        "n",
        "n - 2 * g AS h",
        "CAST(ms AS DOUBLE) / (n - 2 * g) AS tmean",
        "(CAST(mss AS DOUBLE) + g * CAST(v_lo AS DOUBLE) * v_lo"
        " + g * CAST(v_hi AS DOUBLE) * v_hi"
        " - CAST(n AS DOUBLE)"
        "   * ((CAST(ms AS DOUBLE) + g * CAST(v_lo AS DOUBLE)"
        "       + g * CAST(v_hi AS DOUBLE)) / n)"
        "   * ((CAST(ms AS DOUBLE) + g * CAST(v_lo AS DOUBLE)"
        "       + g * CAST(v_hi AS DOUBLE)) / n))"
        " / ((CAST(n AS DOUBLE) - 2 * g)"
        "    * (CAST(n AS DOUBLE) - 2 * g - 1)) AS d",
    )
    w2 = fin.agg(
        F.max(F.when(F.col("is_a") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("is_a") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("is_a") == 1, F.col("h"))).alias("h1"),
        F.max(F.when(F.col("is_a") == 0, F.col("h"))).alias("h2"),
        F.max(F.when(F.col("is_a") == 1, F.col("tmean"))).alias("tm1"),
        F.max(F.when(F.col("is_a") == 0, F.col("tmean"))).alias("tm2"),
        F.max(F.when(F.col("is_a") == 1, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("is_a") == 0, F.col("d"))).alias("d2"),
    )
    return w2.selectExpr(
        "n1",
        "n2",
        "h1",
        "h2",
        "(tm1 - tm2) / 100.0e0 AS trimmed_mean_diff",
        "(tm1 - tm2) / sqrt(d1 + d2) AS yuen_t",
        "(d1 + d2) * (d1 + d2)"
        " / (d1 * d1 / (h1 - 1) + d2 * d2 / (h2 - 1)) AS df",
    )


@register(
    "q_stat_lins_ccc",
    oracle="""
    WITH mid AS (
      SELECT epoch_us(min(ts)) + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS m
      FROM events
    ),
    per AS (
      SELECT user_id,
             CAST(sum(CASE WHEN epoch_us(ts) < m
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN epoch_us(ts) >= m
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
      FROM events, mid
      WHERE value IS NOT NULL
      GROUP BY user_id, m
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      FROM per
    )
    SELECT n,
           (2.0e0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                + (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                + (CAST(sx AS DOUBLE) - CAST(sy AS DOUBLE))
                  * (CAST(sx AS DOUBLE) - CAST(sy AS DOUBLE))) AS lins_ccc
    FROM mo
    """,
)
def q_stat_lins_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lin's concordance correlation coefficient between each user's
    # first-half and second-half spend (the CUPED paired lane) — the
    # agreement statistic that penalizes BOTH scatter and systematic
    # bias, unlike Pearson r (two measurements can correlate perfectly
    # yet disagree): CCC = 2 s_xy / (s_x^2 + s_y^2 + (xbar - ybar)^2).
    # Multiplying through by n^2 clears every mean: CCC =
    # 2(n Sxy - Sx Sy) / ((n Sxx - Sx^2) + (n Syy - Sy^2) + (Sx-Sy)^2)
    # — all EXACT integer/decimal moments (cent lane; squares cross
    # BIGINT at replica scale -> DECIMAL(38,0)), ONE double tree ->
    # bit-exact, no rounding. 100 TB: one per-user conditional agg +
    # one scalar moment reduce.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    mid = ev.agg(
        (
            F.expr("unix_micros(min(ts))")
            + (F.expr("unix_micros(max(ts))") - F.expr("unix_micros(min(ts))"))
            / F.lit(2)
        )
        .cast("bigint")
        .alias("m")
    )
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id", "m")
        .agg(
            F.sum(
                F.when(
                    F.expr("unix_micros(ts)") < F.col("m"),
                    (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(
                    F.expr("unix_micros(ts)") >= F.col("m"),
                    (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    mo = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    return mo.selectExpr(
        "n",
        "(2.0e0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
        " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "    + (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        "       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
        "    + (CAST(sx AS DOUBLE) - CAST(sy AS DOUBLE))"
        "      * (CAST(sx AS DOUBLE) - CAST(sy AS DOUBLE))) AS lins_ccc",
    )


@register(
    "q_stat_jackknife_ratio",
    oracle="""
    WITH per AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy
      FROM per
    ),
    loo AS (
      SELECT t.n, t.sx, t.sy,
             CAST((CAST(t.sy - per.y AS DOUBLE) / (t.sx - per.x))
                  AS DECIMAL(38,12)) AS th,
             CAST((CAST(t.sy - per.y AS DOUBLE) / (t.sx - per.x))
                  * (CAST(t.sy - per.y AS DOUBLE) / (t.sx - per.x))
                  AS DECIMAL(38,12)) AS th2
      FROM per CROSS JOIN t
    ),
    mo AS (
      SELECT max(n) AS n, max(sx) AS sx, max(sy) AS sy,
             sum(th) AS sth, sum(th2) AS sth2
      FROM loo
    )
    SELECT n,
           CAST(sy AS DOUBLE) / sx / 100.0e0 AS ratio,
           round((n - 1) * (CAST(sth AS DOUBLE) / n - CAST(sy AS DOUBLE) / sx)
                 / 100.0e0, 6) AS jack_bias,
           round(sqrt((CAST(n AS DOUBLE) - 1) / n
                      * (CAST(sth2 AS DOUBLE)
                         - n * (CAST(sth AS DOUBLE) / n)
                             * (CAST(sth AS DOUBLE) / n))) / 100.0e0, 6)
             AS jack_se
    FROM mo
    """,
)
def q_stat_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Delete-one-group jackknife for the ratio estimator theta =
    # total spend / total events (the nonlinear statistic whose SE has
    # no closed form — the inference tool the bootstrap/permutation
    # keys don't cover, and THE standard survey-sampling variance
    # method): each leave-one-user-out replicate is CLOSED FORM from
    # the broadcast totals, theta_i = (Sy - y_i)/(Sx - x_i), so the
    # whole jackknife is one per-user pass — never n re-aggregations.
    # SE = sqrt((n-1)/n Sum (theta_i - thetabar)^2), bias =
    # (n-1)(thetabar - theta). The replicate values are identical
    # doubles in both engines (one shared division tree); their
    # DECIMAL(38,12) quantizations make the replicate sums
    # order-insensitive, but a replicate landing ON the 1e-12
    # half-grid rounds HALF_UP in Spark vs HALF_EVEN in DuckDB
    # (observed at sf0.001), so bias/SE are round-6 against that
    # tie-mode skew. 100 TB: one per-user agg + one broadcast + one scalar
    # reduce — the delete-a-group jackknife shape used on real
    # pipelines.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y"),
    )
    per = per.localCheckpoint(eager=False)  # feeds totals + replicates
    t = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    loo = per.crossJoin(F.broadcast(t)).selectExpr(
        "n",
        "sx",
        "sy",
        "CAST((CAST(sy - y AS DOUBLE) / (sx - x)) AS DECIMAL(38,12)) AS th",
        "CAST((CAST(sy - y AS DOUBLE) / (sx - x))"
        " * (CAST(sy - y AS DOUBLE) / (sx - x)) AS DECIMAL(38,12)) AS th2",
    )
    mo = loo.agg(
        F.max("n").alias("n"),
        F.max("sx").alias("sx"),
        F.max("sy").alias("sy"),
        F.sum("th").alias("sth"),
        F.sum("th2").alias("sth2"),
    )
    return mo.selectExpr(
        "n",
        "CAST(sy AS DOUBLE) / sx / 100.0e0 AS ratio",
        "round((n - 1) * (CAST(sth AS DOUBLE) / n - CAST(sy AS DOUBLE) / sx)"
        " / 100.0e0, 6) AS jack_bias",
        "round(sqrt((CAST(n AS DOUBLE) - 1) / n"
        "     * (CAST(sth2 AS DOUBLE)"
        "        - n * (CAST(sth AS DOUBLE) / n)"
        "            * (CAST(sth AS DOUBLE) / n))) / 100.0e0, 6) AS jack_se",
    )
