"""Scaling experiment: synthesize an 8x replica of sf0.1 lineitem/events
into /tmp and measure headline queries at 1x vs 8x. The point is the
RATIO — a plan that holds at 100 TB grows ~linearly with input here
(hash agg, broadcast join, window after one shuffle); a plan that
wouldn't (cartesian, driver collect of raw data, per-key Python loops)
shows super-linear growth immediately.

Usage: python tools/bench_scale.py  → one JSON line with 1x/8x medians
and ratios. Writes only under /tmp.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.io import load_table
from trembita_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
SCALE = int(os.environ.get("SPARK_GRAFT_SCALE", "8"))
BASE = f"/tmp/trembita_scale{SCALE}"


def build_scaled(spark) -> None:
    if os.path.exists(f"{BASE}/lineitem.parquet/_SUCCESS"):
        return
    reps = spark.range(SCALE).withColumnRenamed("id", "rep")
    li = load_table(spark, SF_DIR, "lineitem")
    # perturb the keys so cardinalities scale too (not just row counts)
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
        .withColumn("l_partkey", F.col("l_partkey") + (F.col("rep") % 4) * 1_000_000)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(f"{BASE}/lineitem.parquet")
    )
    ev = load_table(spark, SF_DIR, "events")
    (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 1_000_000)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 100_000_000)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(f"{BASE}/events.parquet")
    )
    od = load_table(spark, SF_DIR, "orders")
    (
        od.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * 10_000_000)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(f"{BASE}/orders.parquet")
    )
    # documents: prefix every TOKEN with the replica id so each replica's
    # vocabulary (and so its shingles/minhash buckets) is disjoint —
    # the LSH case then measures pipeline scaling, not the semantic
    # quadratic growth of planting 8 exact copies of every document.
    doc = load_table(spark, SF_DIR, "documents")
    (
        doc.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 100_000_000)
        .withColumn(
            "text",
            F.expr("array_join(transform(split(text, ' '), t -> concat(rep, t)), ' ')"),
        )
        .drop("rep")
        .write.mode("overwrite")
        .parquet(f"{BASE}/documents.parquet")
    )


def q_flagship(li):
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_product(li):
    return li.groupBy("l_orderkey").agg(F.product("l_quantity").alias("p"))


def q_sessionize(ev):
    from trembita_spark.operators.fsm import sessionize

    return (
        sessionize(ev, gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_topk(li):
    return li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber").limit(25)


def q_join_agg(li, od):
    # big-big join: lineitem ⨝ orders on the scaled key, then agg.
    # AQE is free to broadcast at 1x and shuffle-join at 8x — plan
    # adaptation under growth is part of what this measures.
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("rev"))
    )


def q_lsh_cluster(docs):
    # the full near-dup pipeline: shingle → minhash bands → bucket pair
    # expansion → connected-components cluster resolution (iterative).
    from trembita_spark.operators.dedup import connected_components, minhash_lsh_candidates

    pairs = minhash_lsh_candidates(docs, bands=4, k=3)
    return connected_components(pairs, max_iters=10)


def q_paragraph_dedup(docs):
    # chunk-granularity dup stats: explode + hash-count + doc re-agg.
    from trembita_spark.operators.text import chunk_documents

    ch = chunk_documents(docs, chunk_tokens=3, overlap=0).select(
        "doc_id", F.md5("chunk_text").alias("h")
    )
    cnt = ch.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        ch.join(cnt, "h")
        .groupBy("doc_id")
        .agg(F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup"))
    )


def q_budget_select(docs, budget):
    # distributed two-phase prefix sum; budget scales with input so the
    # selected fraction (and output size) stays constant across scales.
    from trembita_spark.operators.sampling import budget_select

    d = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    return budget_select(
        d, "n_tokens", [F.col("n_tokens").desc(), F.col("doc_id")], budget, cum_col="cum"
    )


def q_skyline(od):
    from trembita_spark.operators.skyline import skyline2d

    return skyline2d(
        od.select("o_orderkey", "o_totalprice", "o_custkey"),
        minimize="o_totalprice",
        maximize="o_custkey",
    )


def q_triangles(od):
    # bounded-degree graph whose NODE count grows with the input (node =
    # orderkey/10, each linked to its next 5 neighbors): triangle work
    # then scales with |E|, which is what the operator should do. A
    # co-occurrence graph over a FIXED vertex set (e.g. suppliers) is
    # the wrong scale probe — it saturates toward a complete graph and
    # the measurement becomes output-volume (V³ triangles), not plan
    # cost. (The naive id-ordered wedge join measured 30s on that dense
    # graph; degree orientation can't help a regular graph.)
    from trembita_spark.operators.graph import triangle_count

    base = F.floor(F.col("o_orderkey") / 10)
    pairs = od.select(
        base.alias("src"),
        (base + 1 + F.col("o_orderkey") % 5).alias("dst"),
    )
    return triangle_count(pairs)


def q_interpolate(ev):
    from trembita_spark.operators.timeseries import interpolate_linear

    return interpolate_linear(ev)


def q_interval_overlap(ev):
    # purchase 30-min windows × click 10-min windows per user through
    # the bucket-grid candidate join — work must track matches, not n·m.
    from trembita_spark.operators.joins import interval_overlap_join

    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("p_e"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id",
        F.col("ts").alias("c_s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("c_e"),
    )
    return interval_overlap_join(
        p, c, on="user_id",
        left_start="p_s", left_end="p_e", right_start="c_s", right_end="c_e",
        bucket_seconds=1800,
    )


def q_lsh_verified(docs):
    # two-stage near-dup: LSH candidates then exact Jaccard verify —
    # verify cost ∝ candidates × shingles.
    from trembita_spark.operators.dedup import lsh_verified_pairs

    return lsh_verified_pairs(docs, bands=4, k=3, min_jaccard=0.25)


def q_rfm(ev):
    # post-round-5 shape: three chained ntile_exact passes (distributed
    # prefix-sum + broadcast count) over the per-user purchase aggregate
    # — the global-ntile replacement whose scaling this case pins.
    from trembita_spark.operators.ranking import ntile_exact

    agg = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_seen"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("value").alias("monetary"),
        )
    )
    out = ntile_exact(agg, [F.desc("last_seen"), F.col("user_id")], 4, "r_score")
    out = ntile_exact(out, [F.desc("frequency"), F.col("user_id")], 4, "f_score")
    out = ntile_exact(out, [F.desc("monetary"), F.col("user_id")], 4, "m_score")
    return out


def q_window_median(ev):
    # rolling exact median, 5-row trailing frame per user — the
    # collect_list-over-frame shape whose growth must stay linear
    # (state is O(frame)=5 per row, frames recomputed per row).
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, mid_lo).otherwise((mid_lo + mid_hi) / 2)
    return ev.select("event_id", "user_id", med.alias("med5"))


def q_window_count_distinct(ev):
    # running size(collect_set) per user over an unbounded-preceding
    # frame — state O(ndv per user) per row; with the bounded
    # event_type domain growth must stay linear in rows.
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("types_so_far"),
    )


def synth_embeddings(spark, n):
    # deterministic array<float> column built by expression — measures
    # the covariance moment pass against N without fixture I/O.
    return spark.range(n).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 31), j -> CAST((id * (j + 7)) % 97 AS FLOAT)) AS embedding",
    )


def q_covariance(emb):
    from trembita_spark.operators.linalg import covariance_matrix

    return covariance_matrix(emb)


def q_substring_dedup(docs):
    # span-level exact dedup: gram explosion → hash groupBy → semi-join
    # back → per-doc rollup. Replica token-prefixing keeps each
    # replica's gram space disjoint, so this measures pipeline scaling
    # (work ∝ total tokens), not planted cross-replica duplication.
    from trembita_spark.operators.dedup import duplicated_span_report

    return duplicated_span_report(docs, k=8)


def q_dhash_decode(docs):
    # the decode+hash stage of image near-dup: real PNG/BMP pixel
    # decode (Arrow-batched mapInPandas) → 4 band rows per image. Pure
    # scan-local map work — must scale linearly with images. (The
    # candidate/verify stage is excluded here: the 8x replica reuses
    # doc_id arithmetic mod 256, so replicas share seeds and pair
    # counts grow with DATA similarity, not plan cost.)
    from trembita_spark.operators.multimodal import attach_pixel_payload, dhash_bands

    return dhash_bands(attach_pixel_payload(docs.select("doc_id")))


def q_copair(li):
    # market-basket pair mining: basket-keyed self-join — pair fan-out
    # is per-basket-squared (baskets are bounded), so total work must
    # track |orders|, not |parts|².
    bask = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    a = bask.select("okey", F.col("part").alias("pa"))
    b = bask.select("okey", F.col("part").alias("pb"))
    return (
        a.join(b, "okey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup"))
    )


def q_sssp_scale(od):
    # bounded-round Bellman-Ford on a graph whose NODE count grows with
    # the input (same construction rationale as q_triangles): relaxation
    # work per round ∝ |E|, sources ∝ |V| so the reached region scales.
    from trembita_spark.operators.graph import sssp

    base = F.floor(F.col("o_orderkey") / 10)
    edges = od.select(
        base.alias("src"),
        (base + 1 + F.col("o_orderkey") % 5).alias("dst"),
        ((F.col("o_orderkey") % 10) + 1).cast("double").alias("weight"),
    )
    sources = (
        edges.select("src").where(F.col("src") % 100 == 0).distinct()
        .withColumnRenamed("src", "node")
    )
    return sssp(edges, sources, rounds=3)


def q_labelprop_scale(od):
    # synchronous LPA, 3 rounds, growing node set: per-round cost is one
    # join + two co-partitioned aggregates ∝ |E|.
    from trembita_spark.operators.graph import label_propagation

    base = F.floor(F.col("o_orderkey") / 10)
    edges = od.select(
        base.alias("src"), (base + 1 + F.col("o_orderkey") % 5).alias("dst")
    )
    return label_propagation(edges, rounds=3)


def q_ktruss_scale(li):
    # 2-round 4-truss peel on the basket clique graph: ONE triangle
    # enumeration (degree-ordered), then per-round explode+count over
    # the monotonically shrinking triangle set.
    from trembita_spark.operators.graph import ktruss_peel

    e = (
        li.alias("l1")
        .join(li.alias("l2"), "l_orderkey")
        .where(F.col("l1.l_partkey") < F.col("l2.l_partkey"))
        .select(
            F.col("l1.l_partkey").alias("src"), F.col("l2.l_partkey").alias("dst")
        )
        .distinct()
    )
    return ktruss_peel(e, k=4, rounds=2)


def _custsupp_edges(li, od):
    # Undirected customer-supplier graph (the q_graph_betweenness /
    # closeness / eccentricity fixture shape): li⨝od on the (scaled)
    # orderkey, distinct (cust, supp) pairs, doubled for undirectedness.
    fwd = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)


def _top_seeds(edges, n):
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.col("d").desc(), "node")
        .limit(n)
        .select("node")
    )


def q_betweenness_scale(li, od):
    # Seeded-BFS family, forward+backward sweep (the heaviest of the
    # three): 3 highest-degree seeds, 3 hops — the contract key's exact
    # parameters. Cost ∝ seeds·reached per level, hash-partitioned on
    # the (seed, node) expansion key.
    from trembita_spark.operators.graph import betweenness_sample

    edges = _custsupp_edges(li, od)
    return betweenness_sample(edges, _top_seeds(edges, 3), max_hops=3)


def q_closeness_scale(li, od):
    # Forward-only seeded BFS + one ratio projection (5 seeds, 4 hops).
    from trembita_spark.operators.graph import closeness

    edges = _custsupp_edges(li, od)
    return closeness(edges, _top_seeds(edges, 5), max_hops=4)


def q_eccentricity_scale(li, od):
    # Forward-only seeded BFS + per-seed max fold (5 seeds, 4 hops).
    from trembita_spark.operators.graph import eccentricity

    edges = _custsupp_edges(li, od)
    return eccentricity(edges, _top_seeds(edges, 5), max_hops=4)


def q_kcore_scale(od):
    # 3-round k-core peel, growing node set: per-round cost is one
    # explode→count degree aggregate + two semi joins ∝ |E| (canonical
    # u<v edge list, half the doubled-adjacency volume).
    from trembita_spark.operators.graph import kcore_peel

    base = F.floor(F.col("o_orderkey") / 10)
    edges = od.select(
        base.alias("src"), (base + 1 + F.col("o_orderkey") % 5).alias("dst")
    )
    return kcore_peel(edges, k=3, rounds=3)


def q_mannwhitney_scale(ev):
    # value-level contingency + ONE distributed prefix sum over the
    # value support: work after the first groupBy ∝ |support|, which
    # grows with the perturbed event values.
    from trembita_spark.operators.stats import mann_whitney_u

    return mann_whitney_u(ev, "value", F.col("user_id") % 2 == 0)


def q_ks_scale(ev):
    # per-value arm counts + prefix sum + one max — same contingency+
    # prefix-sum shape as mann-whitney.
    from trembita_spark.operators.stats import ks_2samp

    return ks_2samp(ev, "value", F.col("user_id") % 2 == 0)


def q_kendall_scale(ev):
    # contingency cells over (x-support × bounded y-domain) + one
    # prefix sum over x — never n² pairs.
    from trembita_spark.operators.stats import kendall_tau_b

    e = ev.withColumn("yb", (F.col("event_id") % 4).cast("int"))
    return kendall_tau_b(e, "value", "yb", [0, 1, 2, 3])


def q_kruskal_scale(ev):
    # k-group generalization of the mann-whitney lane: contingency agg
    # + one prefix sum + a support-sized rank-map join; work after the
    # first groupBy ∝ |value support|·k.
    from trembita_spark.operators.stats import kruskal_wallis

    return kruskal_wallis(ev, "value", (F.col("user_id") % 4).cast("int"))


def q_kaplan_meier_scale(ev):
    # one subject-key agg, then everything is support-sized (distinct
    # whole-day durations): two prefix sums on the level frame.
    from trembita_spark.operators.stats import kaplan_meier

    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("entry_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p_ts"),
        F.max("ts").alias("last_ts"),
    )
    pu = per.select(
        F.when(
            F.col("p_ts").isNotNull(),
            F.datediff(F.to_date("p_ts"), F.to_date("entry_ts")),
        )
        .otherwise(F.datediff(F.to_date("last_ts"), F.to_date("entry_ts")))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("obs"),
    )
    return kaplan_meier(pu, "t", "obs")


def q_corpus_pipeline(docs, budget):
    # the end-to-end corpus-build chain (closest shape to the real
    # 100 TB workload): exact-dedup keep-first → quality policy
    # (length / repetition / lang allowlist) → token-budget selection
    # (distributed two-phase prefix sum; budget ∝ scale so the selected
    # fraction stays constant) → deterministic shard assignment →
    # per-shard rollup.
    from pyspark.sql import Window

    from trembita_spark.operators.sampling import budget_select, shard_assign

    toks = F.split(F.col("text"), " ")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    policy = (
        docs.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("distinct_ratio", F.size(F.array_distinct(toks)) / F.size(toks))
        .withColumn("dup_rank", F.row_number().over(w))
        .filter(
            (F.col("dup_rank") == 1)
            & (F.col("n_tokens") >= 10)
            & (F.col("distinct_ratio") >= 0.3)
            & F.col("lang").isin("en", "de", "es", "fr")
        )
        .select("doc_id", "n_tokens")
    )
    sel = budget_select(
        policy,
        "n_tokens",
        [F.col("n_tokens").desc(), F.col("doc_id")],
        budget,
        cum_col="cum",
    )
    return (
        shard_assign(sel, "doc_id", n_shards=16)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok"))
    )


def median_time(fn, runs=3):
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    spark = get_session(app_name="trembita_scale_bench")
    build_scaled(spark)
    li1 = load_table(spark, SF_DIR, "lineitem")
    ev1 = load_table(spark, SF_DIR, "events")
    li8 = spark.read.parquet(f"{BASE}/lineitem.parquet")
    ev8 = spark.read.parquet(f"{BASE}/events.parquet")
    od1 = load_table(spark, SF_DIR, "orders")
    od8 = spark.read.parquet(f"{BASE}/orders.parquet")
    doc1 = load_table(spark, SF_DIR, "documents")
    doc8 = spark.read.parquet(f"{BASE}/documents.parquet")
    # events written back via load_table has µs ts already; raw read OK.
    cases = {
        "flagship_agg": (lambda: q_flagship(li1).collect(), lambda: q_flagship(li8).collect()),
        "orderkey_product": (lambda: q_product(li1).count(), lambda: q_product(li8).count()),
        "sessionize": (lambda: q_sessionize(ev1).count(), lambda: q_sessionize(ev8).count()),
        "topk": (lambda: q_topk(li1).collect(), lambda: q_topk(li8).collect()),
        "join_agg": (lambda: q_join_agg(li1, od1).collect(), lambda: q_join_agg(li8, od8).collect()),
        "lsh_cluster": (lambda: q_lsh_cluster(doc1).count(), lambda: q_lsh_cluster(doc8).count()),
        "paragraph_dedup": (
            lambda: q_paragraph_dedup(doc1).count(),
            lambda: q_paragraph_dedup(doc8).count(),
        ),
        "budget_select": (
            lambda: q_budget_select(doc1, 300_000).count(),
            lambda: q_budget_select(doc8, 300_000 * SCALE).count(),
        ),
        "skyline": (lambda: q_skyline(od1).count(), lambda: q_skyline(od8).count()),
        "triangles": (
            lambda: q_triangles(od1).count(),
            lambda: q_triangles(od8).count(),
        ),
        "interpolate": (
            lambda: q_interpolate(ev1).count(),
            lambda: q_interpolate(ev8).count(),
        ),
        "rfm_ntile": (
            lambda: q_rfm(ev1).count(),
            lambda: q_rfm(ev8).count(),
        ),
        "interval_overlap": (
            lambda: q_interval_overlap(ev1).count(),
            lambda: q_interval_overlap(ev8).count(),
        ),
        "lsh_verified": (
            lambda: q_lsh_verified(doc1).count(),
            lambda: q_lsh_verified(doc8).count(),
        ),
        # .count() would let column pruning DELETE the window node (the
        # measurement then times a bare scan) — sum over the window
        # output forces full evaluation.
        "window_median": (
            lambda: q_window_median(ev1).agg(F.sum("med5")).collect(),
            lambda: q_window_median(ev8).agg(F.sum("med5")).collect(),
        ),
        "window_count_distinct": (
            lambda: q_window_count_distinct(ev1).agg(F.sum("types_so_far")).collect(),
            lambda: q_window_count_distinct(ev8).agg(F.sum("types_so_far")).collect(),
        ),
        "copair_mining": (
            lambda: q_copair(li1).count(),
            lambda: q_copair(li8).count(),
        ),
        "substring_dedup": (
            lambda: q_substring_dedup(doc1).count(),
            lambda: q_substring_dedup(doc8).count(),
        ),
        "dhash_decode_hash": (
            lambda: q_dhash_decode(doc1).count(),
            lambda: q_dhash_decode(doc8).count(),
        ),
        "covariance_pass": (
            lambda: q_covariance(synth_embeddings(spark, 50_000)).count(),
            lambda: q_covariance(synth_embeddings(spark, 50_000 * SCALE)).count(),
        ),
        "sssp": (
            lambda: q_sssp_scale(od1).count(),
            lambda: q_sssp_scale(od8).count(),
        ),
        "labelprop": (
            lambda: q_labelprop_scale(od1).count(),
            lambda: q_labelprop_scale(od8).count(),
        ),
        "kcore": (
            lambda: q_kcore_scale(od1).count(),
            lambda: q_kcore_scale(od8).count(),
        ),
        "ktruss": (
            lambda: q_ktruss_scale(li1.select("l_orderkey", "l_partkey")).count(),
            lambda: q_ktruss_scale(li8.select("l_orderkey", "l_partkey")).count(),
        ),
        # single-row outputs: collect() forces the full aggregate
        "mannwhitney": (
            lambda: q_mannwhitney_scale(ev1).collect(),
            lambda: q_mannwhitney_scale(ev8).collect(),
        ),
        "ks_2samp": (
            lambda: q_ks_scale(ev1).collect(),
            lambda: q_ks_scale(ev8).collect(),
        ),
        "kendall": (
            lambda: q_kendall_scale(ev1).collect(),
            lambda: q_kendall_scale(ev8).collect(),
        ),
        "kruskal": (
            lambda: q_kruskal_scale(ev1).collect(),
            lambda: q_kruskal_scale(ev8).collect(),
        ),
        "kaplan_meier": (
            lambda: q_kaplan_meier_scale(ev1).collect(),
            lambda: q_kaplan_meier_scale(ev8).collect(),
        ),
        "betweenness": (
            lambda: q_betweenness_scale(li1, od1).count(),
            lambda: q_betweenness_scale(li8, od8).count(),
        ),
        "closeness": (
            lambda: q_closeness_scale(li1, od1).count(),
            lambda: q_closeness_scale(li8, od8).count(),
        ),
        "eccentricity": (
            lambda: q_eccentricity_scale(li1, od1).count(),
            lambda: q_eccentricity_scale(li8, od8).count(),
        ),
        "corpus_pipeline": (
            lambda: q_corpus_pipeline(doc1, 300_000).count(),
            lambda: q_corpus_pipeline(doc8, 300_000 * SCALE).count(),
        ),
    }
    only = os.environ.get("SPARK_GRAFT_SCALE_CASES")
    heavy_out = os.environ.get("SPARK_GRAFT_HEAVY_ARTIFACT")
    if heavy_out:
        # the committed per-round heavy-key artifact (round-9 verdict
        # #5): the five heaviest keys at 1x/8x, so round-over-round
        # regressions on them are mechanically diffable against
        # BASELINE §15's 57.5s quiet line instead of living in prose.
        # The heavy artifact PINS this case list: honoring a stray
        # SPARK_GRAFT_SCALE_CASES here would silently record a
        # different set under the same heavy8x_total label (ADVICE r10).
        if only:
            print(
                "NOTE: SPARK_GRAFT_SCALE_CASES ignored — the heavy "
                "artifact records its fixed case list",
                file=sys.stderr,
            )
        only = "ktruss,betweenness,closeness,eccentricity,corpus_pipeline"
    if only:
        wanted = {c.strip() for c in only.split(",")}
        cases = {k: v for k, v in cases.items() if k in wanted}
    if not cases:
        sys.exit(f"no scale cases matched filter {only!r}")
    out = {}
    for name, (f1, f8) in cases.items():
        t1 = median_time(f1)
        t8 = median_time(f8)
        out[name] = {
            "sec_1x": round(t1, 3),
            "sec_8x": round(t8, 3),
            "ratio": round(t8 / t1, 2),
        }
    payload = {"scale": SCALE, "rows_8x": li8.count(), "cases": out}
    if heavy_out:
        payload["heavy8x_total"] = round(sum(c["sec_8x"] for c in out.values()), 2)
        payload["worst_ratio"] = max(c["ratio"] for c in out.values())
        payload["loadavg"] = list(os.getloadavg())
        with open(heavy_out, "w") as f:
            f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
