"""ktruss floor decomposition A/B (round-10 verdict item 2).

Measures the three stages of q_graph_ktruss at sf0.1 and A/Bs the
round-0 support computation between:

  (B0) the round-10 shape — per-edge size(array_intersect) of the two
       endpoint adjacency lists under two node-keyed joins (each
       triangle probed at all THREE edges: ~2x the probes of oriented
       enumeration, but NO triangle-shaped shuffle), and
  (B1) the hybrid candidate — apex-ORIENTED enumeration (each triangle
       probed once at its lowest-degree apex) followed by the
       3-per-triangle edge expansion + hash aggregate to per-edge
       support (half the probes, plus a 3*|tri|-row shuffle).

The loser's cost model goes into docs/SCALE_NOTES.md as the written
irreducibility argument. Run on a QUIET box (loadavg is recorded).

Usage: python tools/ktruss_floor.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from trembita_spark.contract import table  # noqa: E402
from trembita_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_edges(spark):
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    per = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    edges = (
        per.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (p, i) -> transform("
                    "slice(ps, i + 2, size(ps) - i - 1), "
                    "q -> struct(p AS src, q AS dst))))"
                )
            ).alias("pr")
        )
        .select("pr.src", "pr.dst")
    )
    e = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return e


def support_intersect(e):
    """B0: the live round-10 shape."""
    both = e.select(F.col("u").alias("n"), F.col("v").alias("m")).unionAll(
        e.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    adj = both.groupBy("n").agg(F.array_sort(F.collect_list("m")).alias("nb"))
    au = adj.select(F.col("n").alias("u"), F.col("nb").alias("nu"))
    av = adj.select(F.col("n").alias("v"), F.col("nb").alias("nv"))
    return (
        e.join(F.broadcast(au), "u")
        .join(F.broadcast(av), "v")
        .select(
            "u", "v",
            F.size(F.array_intersect("nu", "nv")).cast("bigint").alias("support"),
        )
    )


def support_oriented(e):
    """B1: degree-oriented enumeration + per-edge expansion aggregate."""
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("x"),
        )
    )
    adj = oriented.groupBy("a").agg(F.array_sort(F.collect_list("x")).alias("nb"))
    with_nbrs = (
        oriented.join(
            F.broadcast(adj.select(F.col("a").alias("_a"), F.col("nb").alias("nb_a"))),
            F.col("a") == F.col("_a"),
        )
        .join(
            F.broadcast(adj.select(F.col("a").alias("_x"), F.col("nb").alias("nb_x"))),
            F.col("x") == F.col("_x"),
            "left",
        )
        .select(
            "a", "x",
            F.explode(
                F.array_intersect(
                    "nb_a", F.coalesce("nb_x", F.array().cast("array<long>"))
                )
            ).alias("w"),
        )
    )
    arr = F.array_sort(F.array("a", "x", "w"))
    tri = with_nbrs.select(arr[0].alias("a"), arr[1].alias("b"), arr[2].alias("c"))
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("a").alias("u"), F.col("c").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("c").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    sup = pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))
    # edges with zero triangles: left join back onto the spine
    return e.join(sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).cast("bigint").alias("support")
    )


def med(fn, runs=3):
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main():
    spark = get_session(app_name="ktruss_floor")
    t0 = time.perf_counter()
    e = build_edges(spark)
    n_edges = e.count()
    edge_build_sec = round(time.perf_counter() - t0, 3)

    b0 = med(lambda: support_intersect(e).agg(F.sum("support")).collect())
    b1 = med(lambda: support_oriented(e).agg(F.sum("support")).collect())
    # sanity: identical support multiset
    h0 = support_intersect(e).groupBy("support").count().orderBy("support").collect()
    h1 = support_oriented(e).groupBy("support").count().orderBy("support").collect()
    assert [tuple(r) for r in h0] == [tuple(r) for r in h1], "support histograms differ!"

    # full key end-to-end for the BASELINE row
    from trembita_spark import contract
    contract.load_all()
    full = med(lambda: contract.QUERIES["q_graph_ktruss"](spark, SF_DIR).collect())

    print(json.dumps({
        "n_edges": n_edges,
        "edge_build_sec": edge_build_sec,
        "support_intersect_sec_B0": b0,
        "support_oriented_sec_B1": b1,
        "full_key_sec": full,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
