"""Per-level profiler for the seeded-BFS family (round 13, guide §1).

Replays q_graph_closeness / q_graph_betweenness level by level with a
timer around every eager materialization and captures the per-level
`nxt` plan BEFORE the localCheckpoint hides it, so the per-level
Exchange count / join strategy is visible (the committed plans only
show the post-checkpoint final fragment).

Usage: python tools/profile_seeded_bfs.py [closeness|betweenness|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trembita_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def feats(df) -> str:
    import re

    p = plan_of(df)
    ex = len(re.findall(r"\bExchange\b", p))
    bhj = len(re.findall(r"BroadcastHashJoin", p))
    smj = len(re.findall(r"SortMergeJoin", p))
    shj = len(re.findall(r"ShuffledHashJoin", p))
    rdd = len(re.findall(r"Scan ExistingRDD", p))
    return f"ex={ex} bhj={bhj} smj={smj} shj={shj} rddscan={rdd}"


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


def profile_closeness(spark):
    sc = spark.sparkContext
    T0 = time.perf_counter()
    edges_raw = build_edges(spark)
    seeds = seeds_of(edges_raw, 5)
    t0 = time.perf_counter()
    edges = edges_raw.select("src", "dst").localCheckpoint(eager=False)
    dist = (
        seeds.select(F.col("node").alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    print(f"[closeness] l0 (incl. seed agg): {time.perf_counter()-t0:.3f}s rows={dist.count()}")
    frontier = dist.select("seed", "node")
    for hop in range(1, 5):
        nxt_plan_probe = (
            frontier.join(edges, frontier.node == edges.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(dist, ["seed", "node"], "left_anti")
        )
        print(f"[closeness] hop{hop} nxt plan: {feats(nxt_plan_probe)}")
        sc.setJobDescription(f"closeness hop{hop}: nxt checkpoint")
        t0 = time.perf_counter()
        nxt = nxt_plan_probe.localCheckpoint(eager=True)
        t_nxt = time.perf_counter() - t0
        t0 = time.perf_counter()
        empty = nxt.isEmpty()
        t_empty = time.perf_counter() - t0
        if empty:
            print(f"[closeness] hop{hop}: nxt={t_nxt:.3f}s empty-check={t_empty:.3f}s EMPTY")
            break
        t0 = time.perf_counter()
        dist = dist.union(
            nxt.select("seed", "node", F.lit(hop).alias("dist"))
        ).localCheckpoint(eager=True)
        t_union = time.perf_counter() - t0
        n = nxt.count()
        print(
            f"[closeness] hop{hop}: nxt={t_nxt:.3f}s empty-check={t_empty:.3f}s "
            f"dist-reunion={t_union:.3f}s rows={n}"
        )
        frontier = nxt.select("seed", "node")
    sc.setJobDescription("closeness: final agg")
    t0 = time.perf_counter()
    per = dist.groupBy(F.col("seed").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("reached"),
        F.sum("dist").cast("bigint").alias("sum_dist"),
    )
    out = per.select(
        "node",
        "reached",
        "sum_dist",
        ((F.col("reached") - 1).cast("double") / F.col("sum_dist").cast("double")).alias(
            "closeness"
        ),
    ).collect()
    print(f"[closeness] final agg+collect: {time.perf_counter()-t0:.3f}s rows={len(out)}")
    print(f"[closeness] TOTAL: {time.perf_counter()-T0:.3f}s")
    sc.setJobDescription(None)


def profile_betweenness(spark):
    sc = spark.sparkContext
    T0 = time.perf_counter()
    edges_raw = build_edges(spark)
    seeds = seeds_of(edges_raw, 3)
    edges = edges_raw.select("src", "dst").localCheckpoint(eager=False)
    t0 = time.perf_counter()
    l0 = (
        seeds.select(F.col("node").alias("seed"))
        .distinct()
        .select(
            "seed", F.col("seed").alias("node"), F.lit(1).cast("bigint").alias("sig")
        )
        .localCheckpoint(eager=True)
    )
    print(f"[betweenness] l0: {time.perf_counter()-t0:.3f}s")
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
        print(f"[betweenness] fwd hop{hop} plan: {feats(probe)}")
        sc.setJobDescription(f"betweenness fwd hop{hop}")
        t0 = time.perf_counter()
        nxt = probe.localCheckpoint(eager=True)
        t_nxt = time.perf_counter() - t0
        if nxt.isEmpty():
            break
        levels.append(nxt)
        t0 = time.perf_counter()
        visited = visited.union(nxt.select("seed", "node")).localCheckpoint(eager=True)
        t_vis = time.perf_counter() - t0
        print(
            f"[betweenness] fwd hop{hop}: nxt={t_nxt:.3f}s visited-reunion={t_vis:.3f}s "
            f"rows={nxt.count()}"
        )
        frontier = nxt
    deep = levels[-1].select("seed", "node", "sig", F.lit(0.0).alias("delta"))
    acc = [deep] if len(levels) > 1 else []
    nxt_lvl = deep
    for lvl in range(len(levels) - 2, -1, -1):
        cur = levels[lvl]
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
        cur_probe = cur.join(
            contrib.withColumnRenamed("delta", "__d"), ["seed", "node"], "left"
        ).select(
            "seed",
            "node",
            "sig",
            F.coalesce(F.col("__d"), F.lit(0.0)).alias("delta"),
        )
        print(f"[betweenness] bwd lvl{lvl} plan: {feats(cur_probe)}")
        sc.setJobDescription(f"betweenness bwd lvl{lvl}")
        t0 = time.perf_counter()
        cur_d = cur_probe.localCheckpoint(eager=True)
        print(f"[betweenness] bwd lvl{lvl}: {time.perf_counter()-t0:.3f}s")
        if lvl > 0:
            acc.append(cur_d)
        nxt_lvl = cur_d
    allv = acc[0]
    for a in acc[1:]:
        allv = allv.unionByName(a)
    sc.setJobDescription("betweenness: final agg")
    t0 = time.perf_counter()
    out = (
        allv.groupBy("node").agg(F.round(F.sum("delta"), 6).alias("betweenness"))
    ).collect()
    print(f"[betweenness] final agg+collect: {time.perf_counter()-t0:.3f}s rows={len(out)}")
    print(f"[betweenness] TOTAL: {time.perf_counter()-T0:.3f}s")
    sc.setJobDescription(None)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_session(app_name="profile_seeded_bfs")
    if which in ("closeness", "both"):
        profile_closeness(spark)
    if which in ("betweenness", "both"):
        profile_betweenness(spark)


if __name__ == "__main__":
    main()
