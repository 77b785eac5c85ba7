"""Warehouse-maintenance sample — the table-upkeep chain a 100 TB
deployment runs between query workloads:

ANALYZE-style statistics → equi-depth histogram (selectivity /
range-writer bounds) → Z-order rewrite (both-dimension pruning) →
Bloom filter build for the hot join key → count-min sketch for
heavy-hitter monitoring.

Every stage is the oracle-checked operator the contract registers;
this file just shows them composed against the lineitem fixture.

Run: python examples/warehouse_maintenance_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.operators.joins import bloom_build, bloom_probe
from trembita_spark.operators.layout import zorder_write
from trembita_spark.operators.sketches import cms_point_query, cms_table
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="warehouse_maintenance_sample")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")

    # 1. Column statistics (the CBO inputs) in one unpivoted pass.
    stats = (
        li.select(
            F.expr(
                "stack(2, 'l_quantity', l_quantity, 'l_extendedprice', "
                "l_extendedprice) AS (col, v)"
            )
        )
        .groupBy("col")
        .agg(
            F.count("v").alias("n"),
            F.countDistinct("v").alias("ndv"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
    )
    print("column stats:")
    stats.show(truncate=False)

    # 2. Z-order rewrite: either-column predicates prune row groups.
    out = tempfile.mkdtemp(prefix="zorder_demo_")
    zorder_write(li, "l_partkey", "l_suppkey", out, num_files=8)
    print(f"z-ordered rewrite at {out}: "
          f"{spark.read.parquet(out).count()} rows across 8 curve segments")

    # 3. Bloom prefilter for the urgent-orders join key.
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    bf = bloom_build(urgent, "o_orderkey", n_bits=32768, n_hashes=3)
    survivors = bloom_probe(li, bf, "l_orderkey", n_bits=32768, n_hashes=3).where(
        "maybe_in"
    )
    print(
        f"bloom prefilter: {survivors.count()} of {li.count()} lineitem rows "
        "reach the join"
    )

    # 4. Count-min sketch: heavy-hitter order keys without a full rescan.
    cms = cms_table(li.select("l_orderkey"), "l_orderkey", depth=4, width=256)
    probes = li.groupBy("l_orderkey").count().orderBy(F.desc("count")).limit(5)
    est = cms_point_query(cms, probes.select("l_orderkey"), "l_orderkey",
                          depth=4, width=256)
    print("top-key frequency estimates (est >= exact always):")
    probes.join(est, "l_orderkey").show()


if __name__ == "__main__":
    main(*sys.argv[1:2])
