"""Graph-analytics sample — the full graph family composed over the
customer–supplier order graph:

structure: degree histogram → triangle counts → k-core peeling;
traversal: multi-source BFS hop distances and bounded-round
Bellman-Ford shortest paths (weighted); communities: pointer-jumping
connected components and synchronous label propagation; centrality:
fixed-iteration PageRank with dangling-mass redistribution.

Every stage is the oracle-checked operator the contract registers
(q_graph_degree_hist / q_graph_triangles / q_graph_kcore / q_graph_bfs
/ q_graph_sssp / q_graph_components / q_graph_labelprop /
q_graph_pagerank_dangling); this file just shows them composed.

Run: python examples/graph_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.operators.graph import (
    bfs,
    kcore_peel,
    label_propagation,
    pagerank,
    sssp,
    triangle_count,
)
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="graph_sample")

    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")

    # bipartite customer–supplier edges, one per (cust, supp) pair, with
    # a min-quantity weight for the weighted traversals
    fwd = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.min("l_quantity").cast("double").alias("weight"))
    )
    edges = fwd.select("src", "dst")
    wedges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    print("edges:", edges.count())

    # --- structure -----------------------------------------------------
    tri = triangle_count(edges)
    print("nodes in >=1 triangle:", tri.count())  # bipartite → 0, by design

    core = kcore_peel(edges, k=8, rounds=3)
    print("8-core survivors after 3 peels:", core.count())

    # --- traversal -----------------------------------------------------
    sources = cu.where(F.col("c_nationkey") == 0).select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
    )
    und = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    hops = bfs(und, sources, max_hops=4)
    print("reached within 4 hops:", hops.count())

    dists = sssp(wedges, sources, rounds=3)
    print(
        "min path weight (<=3 edges) reached:",
        dists.count(),
        "closest:",
        [
            (r.node, r.dist)
            for r in dists.orderBy(F.col("dist"), "node").limit(3).collect()
        ],
    )

    # --- communities ---------------------------------------------------
    labels = label_propagation(edges, rounds=3)
    n_comm = labels.select("label").distinct().count()
    print("label-propagation communities after 3 rounds:", n_comm)

    # --- centrality ----------------------------------------------------
    pr = pagerank(und, iters=3, redistribute_dangling=True)
    top = pr.orderBy(F.col("score").desc(), "node").limit(3).collect()
    print("top pagerank:", [(r.node, round(r.score, 6)) for r in top])


if __name__ == "__main__":
    main(*sys.argv[1:])
