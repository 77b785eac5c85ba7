"""Capture per-level .explain('formatted') dumps for the seeded-BFS
family (round 13). The contract keys' committed plans only show the
post-checkpoint final fragment; the per-level plans — where the work
happens — are captured here by replaying the operator loops and
explaining each level's frame BEFORE its localCheckpoint hides it.

Usage: python tools/capture_seeded_plans.py <tag>
Writes plans/r13/q_graph_closeness_<tag>.txt (seeded_bfs per-hop plans;
also serves harmonic/eccentricity — same shared frame) and
plans/r13/q_graph_betweenness_<tag>.txt (forward + backward levels).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trembita_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")

try:
    from trembita_spark.operators.graph import _known_small  # round-13 code
except ImportError:  # pre-round-13 code under `git stash`
    def _known_small(df, rows):
        return df


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def build_edges(spark):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    fwd = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return edges.localCheckpoint(eager=False)


def seeds_of(edges, k):
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.col("d").desc(), "node")
        .limit(k)
        .select("node")
    )


def capture_closeness(spark, tag, new_shape):
    edges = build_edges(spark).select("src", "dst").localCheckpoint(eager=False)
    seeds = seeds_of(edges, 5)
    chunks = []
    l0 = (
        seeds.select(F.col("node").alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    if new_shape:
        levels = [(l0.select("seed", "node"), l0.count())]
        frontier, nf = levels[0]
        for hop in range(1, 5):
            fb = _known_small(frontier, nf)
            visited = levels[0][0]
            for lvl, _n in levels[1:]:
                visited = visited.unionByName(lvl)
            nv = sum(n for _l, n in levels)
            probe = (
                fb.join(edges, fb.node == edges.src)
                .select("seed", F.col("dst").alias("node"))
                .distinct()
                .join(_known_small(visited, nv), ["seed", "node"], "left_anti")
            )
            chunks.append(f"== seeded_bfs hop {hop} (per-level frame) ==\n" + plan_of(probe))
            nxt = probe.localCheckpoint(eager=True)
            n = nxt.count()
            if n == 0:
                break
            levels.append((nxt, n))
            frontier, nf = nxt, n
    else:
        dist = l0
        frontier = dist.select("seed", "node")
        for hop in range(1, 5):
            probe = (
                frontier.join(edges, frontier.node == edges.src)
                .select("seed", F.col("dst").alias("node"))
                .distinct()
                .join(dist, ["seed", "node"], "left_anti")
            )
            chunks.append(f"== seeded_bfs hop {hop} (per-level frame) ==\n" + plan_of(probe))
            nxt = probe.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            dist = dist.union(
                nxt.select("seed", "node", F.lit(hop).alias("dist"))
            ).localCheckpoint(eager=True)
            frontier = nxt.select("seed", "node")
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"q_graph_closeness_{tag}.txt"), "w") as f:
        f.write("\n\n".join(chunks))
    print(f"closeness: {len(chunks)} level plans -> q_graph_closeness_{tag}.txt")


def capture_betweenness(spark, tag, new_shape):
    edges = build_edges(spark).select("src", "dst").localCheckpoint(eager=False)
    seeds = seeds_of(edges, 3)
    chunks = []
    l0 = (
        seeds.select(F.col("node").alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(1).cast("bigint").alias("sig"))
        .localCheckpoint(eager=True)
    )
    if new_shape:
        levels = [(l0, l0.count())]
        frontier, nf = l0, levels[0][1]
        for hop in range(1, 4):
            fb = _known_small(frontier, nf)
            visited = levels[0][0].select("seed", "node")
            for lvl, _n in levels[1:]:
                visited = visited.unionByName(lvl.select("seed", "node"))
            nv = sum(n for _l, n in levels)
            probe = (
                fb.join(edges, fb.node == edges.src)
                .select("seed", F.col("dst").alias("node"), "sig")
                .groupBy("seed", "node")
                .agg(F.sum("sig").cast("bigint").alias("sig"))
                .join(_known_small(visited, nv), ["seed", "node"], "left_anti")
            )
            chunks.append(f"== forward hop {hop} ==\n" + plan_of(probe))
            nxt = probe.localCheckpoint(eager=True)
            n = nxt.count()
            if n == 0:
                break
            levels.append((nxt, n))
            frontier, nf = nxt, n
        deep = levels[-1][0].select("seed", "node", "sig", F.lit(0.0).alias("delta"))
        nxt_lvl, n_nxt = deep, levels[-1][1]
        for lix in range(len(levels) - 2, -1, -1):
            cur, n_cur = levels[lix]
            succ = nxt_lvl.select(
                F.col("seed").alias("seed_w"),
                F.col("node").alias("w"),
                F.col("sig").alias("sig_w"),
                F.col("delta").alias("delta_w"),
            )
            cb = _known_small(cur, n_cur)
            contrib = (
                cb.join(edges, cb.node == edges.src)
                .join(
                    _known_small(succ, n_nxt),
                    (F.col("seed") == F.col("seed_w")) & (F.col("dst") == F.col("w")),
                )
                .groupBy("seed", "node")
                .agg(
                    F.sum(
                        F.col("sig").cast("double")
                        / F.col("sig_w").cast("double")
                        * (1 + F.col("delta_w"))
                    ).alias("delta")
                )
            )
            probe = cur.join(
                _known_small(contrib.withColumnRenamed("delta", "__d"), n_cur),
                ["seed", "node"],
                "left",
            ).select(
                "seed", "node", "sig",
                F.coalesce(F.col("__d"), F.lit(0.0)).alias("delta"),
            )
            chunks.append(f"== backward level {lix} ==\n" + plan_of(probe))
            cur_d = probe.localCheckpoint(eager=True)
            nxt_lvl, n_nxt = cur_d, n_cur
    else:
        levels = [l0]
        visited = l0.select("seed", "node")
        frontier = l0
        for hop in range(1, 4):
            probe = (
                frontier.join(edges, frontier.node == edges.src)
                .select("seed", F.col("dst").alias("node"), "sig")
                .groupBy("seed", "node")
                .agg(F.sum("sig").cast("bigint").alias("sig"))
                .join(visited, ["seed", "node"], "left_anti")
            )
            chunks.append(f"== forward hop {hop} ==\n" + plan_of(probe))
            nxt = probe.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            levels.append(nxt)
            visited = visited.union(nxt.select("seed", "node")).localCheckpoint(eager=True)
            frontier = nxt
        deep = levels[-1].select("seed", "node", "sig", F.lit(0.0).alias("delta"))
        nxt_lvl = deep
        for lix in range(len(levels) - 2, -1, -1):
            cur = levels[lix]
            succ = nxt_lvl.select(
                F.col("seed").alias("seed_w"),
                F.col("node").alias("w"),
                F.col("sig").alias("sig_w"),
                F.col("delta").alias("delta_w"),
            )
            contrib = (
                cur.join(edges, cur.node == edges.src)
                .join(
                    succ,
                    (F.col("seed") == F.col("seed_w")) & (F.col("dst") == F.col("w")),
                )
                .groupBy("seed", "node")
                .agg(
                    F.sum(
                        F.col("sig").cast("double")
                        / F.col("sig_w").cast("double")
                        * (1 + F.col("delta_w"))
                    ).alias("delta")
                )
            )
            probe = cur.join(
                contrib.withColumnRenamed("delta", "__d"), ["seed", "node"], "left"
            ).select(
                "seed", "node", "sig",
                F.coalesce(F.col("__d"), F.lit(0.0)).alias("delta"),
            )
            chunks.append(f"== backward level {lix} ==\n" + plan_of(probe))
            cur_d = probe.localCheckpoint(eager=True)
            nxt_lvl = cur_d
    with open(os.path.join(OUT, f"q_graph_betweenness_{tag}.txt"), "w") as f:
        f.write("\n\n".join(chunks))
    print(f"betweenness: {len(chunks)} level plans -> q_graph_betweenness_{tag}.txt")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    new_shape = "before" not in tag
    spark = get_session(app_name=f"capture_seeded_plans_{tag}")
    capture_closeness(spark, tag, new_shape)
    capture_betweenness(spark, tag, new_shape)


if __name__ == "__main__":
    main()
