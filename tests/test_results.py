"""QueryResult-tree shaping: rollup rows → the reference's nested
per-level-totals structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from trembita_spark.query import Query
from trembita_spark.results import rollup_tree


def test_rollup_tree_shape_and_totals(spark):
    df = spark.createDataFrame(
        [
            ("us", "nyc", 10),
            ("us", "nyc", 5),
            ("us", "sf", 7),
            ("de", "ber", 2),
        ],
        "country string, city string, amount long",
    )
    out = (
        Query(df)
        .rollup(country="country", city="city")
        .with_grouping_id("gid")
        .aggregate(total=F.sum("amount"), cnt=F.count(F.lit(1)))
        .to_df()
    )
    tree = rollup_tree(out, keys=["country", "city"])
    assert tree["totals"] == {"total": 24, "cnt": 4}                 # grand total
    us = tree["groups"]["us"]
    assert us["totals"] == {"total": 22, "cnt": 3}                   # level-1 totals
    assert us["groups"]["nyc"]["totals"] == {"total": 15, "cnt": 2}  # leaves
    assert us["groups"]["sf"]["totals"] == {"total": 7, "cnt": 1}
    assert tree["groups"]["de"]["totals"] == {"total": 2, "cnt": 1}
    assert tree["groups"]["de"]["groups"]["ber"]["totals"]["cnt"] == 1
