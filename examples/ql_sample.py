"""QL sample — the trembita-QL flagship shape (mirrors the reference's
examples/kernel QLSample: where → groupBy → aggregate → having →
ordering), on the local TPC-H-ish fixture.

Run: python examples/ql_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.query import Query, agg
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="ql_sample")
    orders = table(spark, sf_dir, "orders")
    result = (
        Query(orders)
        .where(F.col("o_totalprice") > 1000)
        .group_by(priority="o_orderpriority", status="o_orderstatus")
        .aggregate_cols(
            agg.sum("o_totalprice", "total"),
            agg.avg("o_totalprice", "avg_price"),
            agg.count("cnt"),
        )
        .having(F.col("cnt") > 10)
        .order_by("priority", "status")
        .to_df()
    )
    result.show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
