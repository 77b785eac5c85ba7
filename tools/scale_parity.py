"""Oracle VALUE parity at 8x scale (round-10 verdict item 1).

Every per-round correctness artifact so far checks values at
sf0.001/0.01/0.1; the 8x replicas (tools/bench_scale.py) were timed but
never value-checked. Precision/overflow bug classes are
scale-dependent — the round-8 n^3 BIGINT overflow and the round-10 KPSS
shared-N^2 algebra bug were both caught by extra rigor, not by small-sf
parity — so this tool points DuckDB at the SAME 8x replica the scaling
bench uses and value-checks the riskiest keys there:

  * the seeded-BFS graph family + ktruss (heaviest iterative plans),
  * the HUGEINT/decimal exact-moment stats lanes (kruskal, cvm, kpss,
    adf, jonckheere, mann-whitney, ansari, brunner-munzel, kendall,
    cointegration, variance ratio) where integer moments grow ~n^3,
  * the distributed prefix-sum percentile/median lanes,
  * the corpus pipeline (closest shape to the real 100 TB workload),
  * two >100k-row detail results exercising the in-engine checksum path.

Comparison is the order-insensitive in-engine fold
(trembita_spark/checksum.py): three scalars per engine, never a
driver-side collect — the same harness therefore scales to 32x
(SPARK_GRAFT_SCALE=32) unchanged.

Usage:
    python tools/scale_parity.py                # 8x, writes SCALE_PARITY_r{N}.json
    SPARK_GRAFT_SCALE=32 SPARK_GRAFT_SCALE_PARITY_KEYS=q_ts_kpss \\
        python tools/scale_parity.py            # subset at 32x

Writes the replica under /tmp (reusing bench_scale's builder) and the
artifact at the repo root; exits non-zero on any mismatch.
tests/test_scale_parity_guard.py asserts the committed artifact is
green and covers the pinned key set.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from tools.bench_scale import BASE, SCALE, SF_DIR, build_scaled  # noqa: E402
from trembita_spark import checksum as CK  # noqa: E402
from trembita_spark import contract  # noqa: E402
from trembita_spark.io import TABLES  # noqa: E402
from trembita_spark.session import get_session  # noqa: E402

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "11")
SCALED_TABLES = ("lineitem", "events", "orders", "documents")

# The pinned at-scale key set. Each entry names why IT is the risky one
# (the guard test enforces this exact minimum coverage).
TARGET_KEYS = [
    # iterative graph plans — heaviest shuffle/round structure
    "q_graph_ktruss",
    "q_graph_betweenness",
    "q_graph_closeness",
    "q_graph_eccentricity",
    # exact integer-moment stats lanes (HUGEINT/decimal; moments ~ n^3)
    "q_stat_kruskal",
    "q_stat_cvm",
    "q_stat_jonckheere",
    "q_stat_mannwhitney",
    "q_stat_ansari_bradley",
    "q_stat_brunner_munzel",
    "q_stat_kendall",
    # lnfact prefix-sum construction, n grows with data (r11); Barnard
    # adds the O((n1+n2)*grid) unconditional lane on top of it (r12)
    "q_stat_fisher_exact",
    "q_stat_barnard",
    # double-precision time-series lanes (shared-N^2 KPSS bug class)
    "q_ts_kpss",
    "q_ts_adf",
    "q_ts_variance_ratio",
    "q_ts_cointegration",
    # distributed prefix-sum percentile/median lanes
    "q_agg_percentile",
    "q_events_gap_percentiles",
    "q_agg_weighted_median",
    # r12: the AQE double-execution divergence class — these two keys
    # caught the zip_with_index/prefix_sum range-exchange branch bug
    # (nondeterministic __pid misalignment at 8x); pinned so every
    # round re-proves the barrier holds
    "q_sample_systematic",
    "q_ml_lift_deciles",
    # corpus pipeline — the 100 TB workload shape
    "q_pipeline_clean_corpus",
    "q_corpus_budget_select",
    # >100k-row detail results — exercises the checksum fold itself
    "q_window_rank",
    "q_quality_checksum",
    # second tranche: repeated-measures decimal lanes, iterative
    # merge-order double sums (pagerank/katz round-12 grids at 8x
    # magnitudes), the Cramer closed forms, changepoint prefix-max,
    # LSH near-dup end-to-end, and more regression-style double lanes
    "q_stat_kendall_w",
    "q_stat_icc",
    "q_stat_quade",
    "q_stat_friedman",
    "q_stat_spearman",
    "q_stat_cuped",
    "q_stat_srm",
    "q_ts_pettitt",
    "q_ts_mann_kendall",
    "q_ts_theil_sen",
    "q_events_markov_absorbing",
    "q_events_markov_stationary",
    "q_graph_pagerank",
    "q_graph_katz",
    "q_dedup_near",
    "q_dedup_near_verified",
    "q_agg_lorenz",
    "q_agg_hill_tail_index",
]


# --- staged oracle overrides -------------------------------------------
# DuckDB 1.0 executes deep MATERIALIZED-CTE chains pathologically at the
# 8x replica (measured: the committed q_graph_ktruss oracle's 2-round
# chain runs >10 min / 25 GB as ONE statement, while the IDENTICAL
# recurrence staged as temp tables runs in ~8 s — per-reference CTE-scan
# overhead plus stats-less join order inside the chain). For such keys
# the sweep runs the SAME formulation split into sequential statements:
# setup DDL into temp tables, then one final SELECT that gets folded.
# The committed single-statement oracle remains the sf0.001/0.01/0.1
# parity gate; the override is recorded in the artifact per key.
_KTRUSS_T0 = """
    CREATE OR REPLACE TEMP TABLE __kt_t0 AS
      SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_partkey < l2.l_partkey
"""


def _ktruss_round(prev: str, this: str, min_sup: int) -> list:
    return [
        f"""CREATE OR REPLACE TEMP TABLE __kt_tri_{this} AS
            SELECT ab.u AS a, ab.v AS b, bc.v AS c
            FROM {prev} ab JOIN {prev} bc ON ab.v = bc.u
            JOIN {prev} ac ON ac.u = ab.u AND ac.v = bc.v""",
        f"""CREATE OR REPLACE TEMP TABLE __kt_sup_{this} AS
            SELECT u, v, CAST(count(*) AS BIGINT) AS support FROM (
              SELECT a AS u, b AS v FROM __kt_tri_{this}
              UNION ALL SELECT a AS u, c AS v FROM __kt_tri_{this}
              UNION ALL SELECT b AS u, c AS v FROM __kt_tri_{this}
            ) GROUP BY 1, 2""",
        f"""CREATE OR REPLACE TEMP TABLE {this} AS
            SELECT e.u, e.v FROM {prev} e LEFT JOIN __kt_sup_{this} s
              ON e.u = s.u AND e.v = s.v
            WHERE COALESCE(s.support, 0) >= {min_sup}""",
    ]


# Equivalent single-statement REFORMULATIONS for oracles whose committed
# form hits a DuckDB-1.0-at-scale pathology (distinct from staging:
# different SQL, same result). Guarded by a row-for-row sf0.01 equality
# test against the committed oracle (test_scale_parity_guard.py).
# q_stream_tws_topk: the committed inequality self-join (count of prior
# same-user events with value >= mine) exceeds the 120s watchdog at 8x;
# the per-user list formulation computes the same prefix rank in O(k^2)
# per user, vectorized — 1.3s at 8x.
ALT_ORACLES = {
    # q_join_band: the committed abs(p-c) <= 0.05 predicate can't use
    # DuckDB's IEJoin (one expression mixes both sides), so 8x plans a
    # blockwise NL join (~1.2e12 comparisons, 193 s measured; r12 sweep).
    # A plain two-inequality rewrite is NOT equivalent: values are
    # cent-quantized, so a whole 1-cent bucket of pairs sits at exact
    # distance 0.05 and the rounding of c+0.05 classifies ~7% of pairs
    # differently. Instead: IEJoin-able SLACK prefilter (0.051 covers
    # every true-band pair with >1e9 ulp margin) + the exact committed
    # residual filter — bit-identical result set, 0.8 s at 8x.
    "q_join_band": """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.value AS p_value, c.value AS c_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.value <= c.value + 0.051 AND p.value >= c.value - 0.051
    WHERE abs(p.value - c.value) <= 0.05
    """,
    "q_stream_tws_topk": """
    WITH per AS (
      SELECT user_id,
             list(struct_pack(ts := ts, event_id := event_id, value := value)
                  ORDER BY ts, event_id) AS evs
      FROM events GROUP BY user_id
    ),
    ex AS (
      SELECT user_id,
             unnest(generate_series(1, len(evs))) AS i,
             evs
      FROM per
    )
    SELECT user_id, evs[i].event_id AS event_id, evs[i].ts AS ts,
           evs[i].value AS value
    FROM ex
    WHERE len(list_filter(evs[1:i-1], x -> x.value >= evs[i].value)) < 3
    """
}

# q_dedup_clusters: the committed oracle's recursive reach(node, lab)
# closure accumulates |lab-set per node| = cluster-size^2 rows, and the
# 8x replica turns every duplicate group into an (8x larger) clique —
# sum(size^2) grows ~64x and the closure alone runs >150 s even with the
# edge list pre-staged (measured, r12 sweep). The staged form runs
# MIN-LABEL PROPAGATION TO FIXPOINT instead — the same fixpoint (the
# committed closure's cluster_id is min(reachable label) = the
# component minimum, exactly what propagation converges to), state is
# one label per node instead of a label SET per node, and the loop is
# driven from Python with a convergence check (the "loop" key below).
# sf0.01 row-for-row equality vs the committed oracle is guard-tested.
_DC_EDGES = """
    CREATE OR REPLACE TEMP TABLE __dc_edges AS
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
                  CASE WHEN len(t) >= 3
                       THEN list_transform(generate_series(1, len(t) - 2),
                                           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                       ELSE [] END AS shingles
           FROM tok),
    sig AS (
      SELECT doc_id, band,
             list_min(list_transform(shingles, s -> substring(md5(concat('g', band // 4, '|', s)), 1 + 8 * (band % 4), 8))) AS sig
      FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band) bands
      WHERE len(shingles) > 0
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
"""

_DC_STEP = [
    """CREATE OR REPLACE TEMP TABLE __dc_next AS
       SELECT l.node,
              least(l.lab, coalesce(min(nl.lab), l.lab)) AS lab
       FROM __dc_lab l
       LEFT JOIN __dc_edges e ON e.d = l.node
       LEFT JOIN __dc_lab nl ON nl.node = e.s
       GROUP BY l.node, l.lab""",
]

# q_graph_hits: the committed oracle's per-iteration CTEs are referenced
# multiple times (the L1 totals are scalar subqueries over the SAME CTE),
# so DuckDB 1.0 re-executes the whole upstream chain per reference — the
# ktruss pathology in its non-MATERIALIZED form; >150 s at 8x as one
# statement, seconds as temp tables. Identical recurrence, staged.
_HITS_EDGES = """
    CREATE OR REPLACE TEMP TABLE __hits_edges AS
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _hits_round(prev: str, tag: str) -> list:
    return [
        f"""CREATE OR REPLACE TEMP TABLE __hits_au_{tag} AS
            SELECT n.node, COALESCE(ar.r, CAST(0 AS DOUBLE)) AS r
            FROM __hits_nodes n LEFT JOIN (
              SELECT e.dst AS node, sum(h.hub) AS r
              FROM __hits_edges e JOIN {prev} h ON e.src = h.node
              GROUP BY e.dst
            ) ar ON n.node = ar.node""",
        f"""CREATE OR REPLACE TEMP TABLE __hits_a_{tag} AS
            SELECT node, r / (SELECT sum(r) FROM __hits_au_{tag}) AS auth
            FROM __hits_au_{tag}""",
        f"""CREATE OR REPLACE TEMP TABLE __hits_hu_{tag} AS
            SELECT n.node, COALESCE(hr.r, CAST(0 AS DOUBLE)) AS r
            FROM __hits_nodes n LEFT JOIN (
              SELECT e.src AS node, sum(a.auth) AS r
              FROM __hits_edges e JOIN __hits_a_{tag} a ON e.dst = a.node
              GROUP BY e.src
            ) hr ON n.node = hr.node""",
        f"""CREATE OR REPLACE TEMP TABLE __hits_h_{tag} AS
            SELECT node, r / (SELECT sum(r) FROM __hits_hu_{tag}) AS hub
            FROM __hits_hu_{tag}""",
    ]


STAGED_ORACLES = {
    # q_graph_rich_club: edges/club CTEs are each referenced 2-3 times
    # (deg, nk, and BOTH sides of the e_k self-join), so DuckDB 1.0
    # re-executes the lineitem-join edge derivation per reference —
    # >150 s at 8x as one statement (r12 extras2 sweep), ~3 s staged.
    "q_graph_rich_club": {
        "setup": [
            f"""CREATE OR REPLACE TEMP TABLE __rc_edges AS
                WITH base AS ({{edges}})
                SELECT src, dst FROM base
                UNION ALL SELECT dst AS src, src AS dst FROM base""".format(
                edges="""
                  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                                  's' || CAST(l_suppkey AS VARCHAR) AS dst
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                """
            ),
            """CREATE OR REPLACE TEMP TABLE __rc_club AS
               SELECT ks.k, deg.node
               FROM (SELECT unnest([4, 8, 16]) AS k) ks
               JOIN (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
                     FROM __rc_edges GROUP BY src) deg
                 ON deg.d > ks.k""",
        ],
        "final": """
            WITH nk AS (
              SELECT k, CAST(count(*) AS BIGINT) AS n_k
              FROM __rc_club GROUP BY k
            ),
            ek AS (
              SELECT c1.k, CAST(count(*) AS BIGINT) AS e_k
              FROM __rc_edges e
              JOIN __rc_club c1 ON c1.node = e.src
              JOIN __rc_club c2 ON c2.node = e.dst AND c2.k = c1.k
              GROUP BY c1.k
            )
            SELECT nk.k, nk.n_k, COALESCE(ek.e_k, 0) AS e_k,
                   CAST(COALESCE(ek.e_k, 0) AS DOUBLE)
                     / CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE) AS phi
            FROM nk LEFT JOIN ek ON ek.k = nk.k
        """,
    },
    "q_dedup_clusters": {
        "setup": [
            _DC_EDGES,
            """CREATE OR REPLACE TEMP TABLE __dc_lab AS
               SELECT DISTINCT s AS node, s AS lab FROM __dc_edges""",
        ],
        # iterate the step statements until the check query returns 0
        # (labels unchanged = fixpoint); bounded by max_iters
        "loop": {
            "stmts": _DC_STEP
            + [
                # change count BEFORE the swap
                """CREATE OR REPLACE TEMP TABLE __dc_chg AS
                   SELECT count(*) AS n FROM __dc_next n
                   JOIN __dc_lab o ON n.node = o.node AND n.lab <> o.lab""",
                "DROP TABLE __dc_lab",
                "ALTER TABLE __dc_next RENAME TO __dc_lab",
            ],
            "check": "SELECT n FROM __dc_chg",
            "max_iters": 200,
        },
        "final": """
            SELECT d.doc_id AS doc_id,
                   coalesce(cc.lab, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN __dc_lab cc ON cc.node = d.doc_id
        """,
    },
    "q_graph_hits": {
        "setup": (
            [
                _HITS_EDGES,
                """CREATE OR REPLACE TEMP TABLE __hits_nodes AS
                   SELECT src AS node FROM __hits_edges
                   UNION SELECT dst FROM __hits_edges""",
                """CREATE OR REPLACE TEMP TABLE __hits_h_it0 AS
                   SELECT node, CAST(1 AS DOUBLE) AS hub FROM __hits_nodes""",
            ]
            + _hits_round("__hits_h_it0", "it1")
            + _hits_round("__hits_h_it1", "it2")
        ),
        "final": """
            SELECT h.node, round(h.hub, 12) AS hub, round(a.auth, 12) AS auth
            FROM __hits_h_it2 h JOIN __hits_a_it2 a ON h.node = a.node
        """,
    },
    "q_graph_ktruss": {
        "setup": (
            [_KTRUSS_T0]
            + _ktruss_round("__kt_t0", "__kt_t1", 3)
            + _ktruss_round("__kt_t1", "__kt_t2", 3)
            + _ktruss_round("__kt_t2", "__kt_fin", -1)[:2]  # tri+sup only
        ),
        "final": """
            SELECT CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
                   CAST(count(*) AS BIGINT) AS n_edges
            FROM __kt_t2 e LEFT JOIN __kt_sup___kt_fin s
              ON e.u = s.u AND e.v = s.v
            GROUP BY 1
        """,  # table names: _ktruss_round(this='__kt_fin') emits
        # __kt_tri___kt_fin / __kt_sup___kt_fin
    }
}


# --- skew replica ---------------------------------------------------------
# SPARK_GRAFT_SCALE_SKEW=1 swaps the uniform 8x replica for a HOT-KEY
# replica: the 20 lowest orderkeys get a 500x lineitem fan-out
# (l_linenumber offset keeps rows unique), everything else unscaled.
# Hot groups then carry ~500x the median rows — the shape that breaks
# naive joins/aggregations at 100 TB. Parity on this replica checks that
# the skew-sensitive keys (salted join, hash aggregates, windows, the
# TPC-H star join) stay VALUE-correct under heavy key skew, not merely
# fast. Oracle sees the identical files, so any skew-triggered plan
# change (AQE splitting, salting) that altered values would mismatch.
_SKEW_MODE = os.environ.get("SPARK_GRAFT_SCALE_SKEW", "")
SKEW = _SKEW_MODE == "1"  # hot ORDERKEY fan-out on lineitem (r11)
USKEW = _SKEW_MODE == "user"  # hot USER fan-out on events (r12): the
# per-user-series lanes (sessionization, FSM, per-user windows, the
# Holt folds) have a different worst case than join-key skew — one
# user whose bounded history is 500x everyone else's stresses the
# collect_list/fold/applyInPandas group paths the lineitem replica
# never touches.
SKEW_BASE = "/tmp/trembita_skew500"
SKEW_TABLES = ("lineitem",)
USKEW_BASE = "/tmp/trembita_uskew500"
USKEW_TABLES = ("events",)

USKEW_TARGET_KEYS = [
    "q_ts_holt_linear",   # ~50k-element hot series through the fold
    "q_ts_holt_damped",
    "q_ts_croston",       # hot user's demand epochs through the fold
    "q_fsm_sessionize",
    "q_fsm_applyinpandas",  # one pandas group carries the hot user
    "q_events_gap_percentiles",
    "q_events_streaks",
    "q_events_top_paths",
    "q_events_window_funnel",
    "q_events_markov",
    "q_events_rfm",
    "q_events_time_to_convert",
    "q_window_ewma",
    "q_window_median",
    "q_stream_session",   # streaming session windows with a hot user
    # r12 rotation 2: attribution, survival, and sequence lanes — the
    # remaining per-user-series families whose worst case is one user
    # with a 500x history (path collect, censoring windows, per-user
    # pattern matching), not join-key skew.
    "q_events_attribution",
    "q_events_attribution_lastclick",
    "q_events_attribution_linear",
    "q_events_kaplan_meier",
    "q_events_nelson_aalen",
    "q_events_logrank",
    "q_events_seq_pattern",
    "q_events_sequence_match",
    "q_events_bounce_rate",
    "q_events_stickiness",
    "q_events_cohort_ltv",
    "q_events_burstiness",
    "q_events_rmst",      # survival area with a hot user's history
    # r12 rotation 3: the final event-family lanes — the hot user
    # dominates one cohort row / the transition matrix / the funnel
    # and island windows.
    "q_cohort_retention",
    "q_events_markov_absorbing",
    "q_events_markov_stationary",
    "q_funnel",
    "q_sequence_islands",
]

SKEW_TARGET_KEYS = [
    "q_join_salted",     # THE skew key: salted join vs plain-join oracle
    "q_join_inner",
    "q_flagship_q1",
    "q_agg_rollup",
    "q_window_rank",
    "q_topk",
    "q_distinct_by",
    "q_sql_q5",
    "q_agg_percentile",
    "q_quality_checksum",
]


def build_skew(spark) -> None:
    if os.path.exists(f"{SKEW_BASE}/lineitem.parquet/_SUCCESS"):
        return
    from pyspark.sql import functions as F

    from trembita_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    hot = (
        li.select("l_orderkey").distinct().orderBy("l_orderkey").limit(20)
    )
    reps = spark.range(1, 500).withColumnRenamed("id", "rep")
    extra = (
        li.join(F.broadcast(hot), "l_orderkey")
        .crossJoin(F.broadcast(reps))
        .withColumn("l_linenumber", F.col("l_linenumber") + 10 * F.col("rep"))
        .drop("rep")
    )
    li.unionByName(extra.select(*li.columns)).write.mode("overwrite").parquet(
        f"{SKEW_BASE}/lineitem.parquet"
    )


def build_skew_user(spark) -> None:
    """Hot-USER replica: the 3 most active users get 500x their event
    history (fresh event_ids; ts jittered by rep microseconds so the
    (ts, event_id) total orders stay unique and sessions stay dense) —
    one user's 'bounded' series at ~50k rows while 1,497 others stay at
    ~600, the skew shape per-user group operators actually meet."""
    if os.path.exists(f"{USKEW_BASE}/events.parquet/_SUCCESS"):
        return
    from pyspark.sql import functions as F

    from trembita_spark.io import load_table

    ev = load_table(spark, SF_DIR, "events")
    hot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(3)
        .select("user_id")
    )
    reps = spark.range(1, 500).withColumnRenamed("id", "rep")
    extra = (
        ev.join(F.broadcast(hot), "user_id")
        .crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 100_000_000)
        .withColumn("ts", F.expr("timestampadd(MICROSECOND, rep, ts)"))
        .drop("rep")
    )
    ev.unionByName(extra.select(*ev.columns)).write.mode("overwrite").parquet(
        f"{USKEW_BASE}/events.parquet"
    )


def _replica_base() -> tuple:
    if USKEW:
        return USKEW_BASE, USKEW_TABLES
    if SKEW:
        return SKEW_BASE, SKEW_TABLES
    return BASE, SCALED_TABLES


def make_sf_dir() -> str:
    """Assemble an sf-dir-shaped directory over the replica: scaled (or
    skewed) fact tables from the replica, everything else symlinked
    unscaled."""
    import shutil

    base, scaled = _replica_base()
    d = f"{base}_sfdir"
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        link = f"{d}/{t}.parquet"
        target = (
            f"{base}/{t}.parquet" if t in scaled else f"{SF_DIR}/{t}.parquet"
        )
        if os.path.islink(link) or os.path.exists(link):
            if os.path.islink(link) and os.readlink(link) == target:
                continue
            if os.path.islink(link):
                os.remove(link)
            else:
                # a stale REAL directory (e.g. an interrupted replica
                # write) occupying the slot would make os.remove raise
                # IsADirectoryError and abort the sweep (ADVICE r11)
                shutil.rmtree(link)
        os.symlink(target, link)
    return d


def make_oracle() -> duckdb.DuckDBPyConnection:
    base, scaled = _replica_base()
    con = duckdb.connect()
    for t in TABLES:
        if t in scaled:
            # Spark-written replica = a DIRECTORY of part files
            src = f"read_parquet('{base}/{t}.parquet/*.parquet')"
        else:
            src = f"'{SF_DIR}/{t}.parquet'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def _duckdb_with_timeout(con, fn, timeout_s: float, what: str):
    """Run a DuckDB call under a watchdog: some oracle formulations
    that are fine at sf0.01 hit DuckDB 1.0 CTE pathologies at replica
    scale (the ktruss case ran >10 min); an interrupt turns an unknown
    hang into a recorded per-key skip instead of stalling the sweep."""
    import threading

    out: dict = {}

    def run():
        try:
            out["val"] = fn()
        except Exception as e:  # surfaced to the caller below
            out["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        raise TimeoutError(f"{what} exceeded {timeout_s:.0f}s (interrupted)")
    if "err" in out:
        raise out["err"]
    return out["val"]


def _fold_with_timeout(con, sql: str, cols: list, timeout_s: float):
    return _duckdb_with_timeout(
        con,
        lambda: tuple(con.execute(CK.duckdb_fold_sql(sql, cols)).fetchone()),
        timeout_s,
        "oracle fold",
    )


def run_staged(con, staged: dict, timeout_s: float = 900.0) -> str:
    """Execute a STAGED_ORACLES entry's setup (and optional fixpoint
    loop) on ``con``, each statement under the watchdog; returns the
    final SELECT. Shared by the sweep and the sf0.01 equality guard so
    the guarded sequence IS the executed sequence."""
    for stmt in staged["setup"]:
        _duckdb_with_timeout(
            con, lambda s=stmt: con.execute(s), timeout_s, "staged oracle setup"
        )
    loop = staged.get("loop")
    if loop:
        for _ in range(loop["max_iters"]):
            for stmt in loop["stmts"]:
                _duckdb_with_timeout(
                    con, lambda s=stmt: con.execute(s), timeout_s, "staged loop"
                )
            if con.execute(loop["check"]).fetchone()[0] == 0:
                break
        else:
            raise RuntimeError(
                f"staged fixpoint loop did not converge in {loop['max_iters']} iters"
            )
    return staged["final"]


def main() -> int:
    contract.load_all()
    keys = USKEW_TARGET_KEYS if USKEW else (SKEW_TARGET_KEYS if SKEW else TARGET_KEYS)
    only = os.environ.get("SPARK_GRAFT_SCALE_PARITY_KEYS")
    if only:
        keys = [k.strip() for k in only.split(",") if k.strip()]
    tranche = os.environ.get("SPARK_GRAFT_SCALE_PARITY_TRANCHE")
    if tranche and not only:
        # Rotating tranche: a deterministic per-round sample of keys
        # OUTSIDE the pinned sets, so at-scale coverage grows round
        # over round instead of re-checking the same pin (the driver's
        # rotating 50-key sample, applied to the replicas). Hash-ranked
        # by (key, round) for reproducibility.
        import hashlib

        pool = sorted(
            set(contract.ORACLES) - set(TARGET_KEYS) - set(SKEW_TARGET_KEYS)
        )
        ranked = sorted(
            pool, key=lambda k: hashlib.md5(f"{k}:{ROUND}".encode()).hexdigest()
        )
        keys = ranked[: int(tranche)]
    missing = [k for k in keys if k not in contract.ORACLES]
    if missing:
        sys.exit(f"keys without oracles: {missing}")

    spark = get_session(app_name="trembita_scale_parity")
    if USKEW:
        build_skew_user(spark)
    elif SKEW:
        build_skew(spark)
    else:
        build_scaled(spark)
    sfdir = make_sf_dir()
    con = make_oracle()

    results: dict[str, dict] = {}
    all_pass = True
    for key in keys:
        entry: dict = {}
        try:
            t0 = time.perf_counter()
            sdf = contract.QUERIES[key](spark, sfdir)
            scols = sorted(sdf.columns)
            sfold = CK.spark_checksum(sdf)
            entry["spark_sec"] = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            staged = STAGED_ORACLES.get(key)
            if staged:
                # every staged statement (setup and loop) rides the SAME
                # watchdog as the final fold: a DuckDB at-scale pathology
                # inside a staged statement (the very class staging works
                # around) must become a recorded per-key skip, not a
                # sweep-wide hang (ADVICE r11)
                sql = run_staged(
                    con,
                    staged,
                    float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "900")),
                )
                entry["oracle_staged"] = True
            elif key in ALT_ORACLES:
                sql = ALT_ORACLES[key]
                entry["oracle_alt"] = True
            else:
                sql = contract.ORACLES[key]
            cols = CK.duckdb_describe(con, sql)
            ocols = sorted(c[0] for c in cols)
            ofold = _fold_with_timeout(
                con,
                sql,
                cols,
                float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "900")),
            )
            entry["oracle_sec"] = round(time.perf_counter() - t0, 2)

            entry["n_rows"] = sfold[0]
            entry["cols_match"] = scols == ocols
            entry["rows_match"] = sfold[0] == ofold[0]
            entry["sum_match"] = sfold[1] == ofold[1]
            entry["xor_match"] = sfold[2] == ofold[2]
            entry["pass"] = all(
                entry[k] for k in ("cols_match", "rows_match", "sum_match", "xor_match")
            )
            if not entry["pass"]:
                entry["spark_fold"] = list(sfold)
                entry["oracle_fold"] = list(ofold)
        except TimeoutError as e:
            # recorded as a SKIP, not a verdict: the value check did not
            # run. The guard test still rejects a skipped PINNED key
            # (no n_rows), so skips can't silently certify the pin.
            entry["skipped"] = str(e)
            entry["pass"] = None
        except Exception as e:  # surface, keep sweeping
            entry["pass"] = False
            entry["error"] = f"{type(e).__name__}: {e}"[:500]
        if entry["pass"] is not None:
            all_pass = all_pass and entry["pass"]
        state = {True: "PASS", False: "FAIL", None: "SKIP"}[entry["pass"]]
        print(f"{key}: {state} {entry}", flush=True)
        results[key] = entry

    payload = {
        "scale": 1 if (SKEW or USKEW) else SCALE,
        "skew": (
            "20 hot orderkeys x500 lineitem fan-out"
            if SKEW
            else ("3 hot users x500 event fan-out" if USKEW else None)
        ),
        "sf_base": SF_DIR,
        "method": "in-engine order-insensitive 60-bit fold (n_rows, sum mod 2^60, xor)",
        "keys": results,
        "n_keys": len(results),
        "n_skipped": sum(1 for v in results.values() if v.get("pass") is None),
        "all_pass": all_pass,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    if USKEW:
        suffix = "_uskew"
    elif SKEW:
        suffix = "_skew"
    else:
        suffix = "" if SCALE == 8 else f"_{SCALE}x"
    out = os.path.join(REPO, f"SCALE_PARITY_r{ROUND}{suffix}.json")
    # A filtered/subset sweep must not overwrite a committed full
    # artifact with a narrower one under the same name; an explicit
    # SPARK_GRAFT_SCALE_PARITY_OUT names intentional subset artifacts
    # (e.g. the 64x overflow-lane spot check). A TRANCHE run is a
    # subset too — its non-pinned key set must not clobber the pinned
    # artifact either (ADVICE r11), so it defaults to a _tranche-
    # suffixed path at the repo root (committed per round).
    explicit = os.environ.get("SPARK_GRAFT_SCALE_PARITY_OUT")
    if explicit:
        out = explicit
        payload["keys_list"] = keys
    elif tranche and not only:
        out = os.path.join(REPO, f"SCALE_PARITY_r{ROUND}_tranche.json")
        payload["tranche"] = int(tranche)
        print(f"tranche run -> {out} (pinned artifact untouched)")
    elif only:
        out = f"/tmp/scale_parity_subset_r{ROUND}.json"
        print(f"subset run -> {out} (committed artifact untouched)")
    with open(out, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(f"wrote {out}: {len(results)} keys, all_pass={all_pass}")
    update_coverage_ledger(results)
    return 0 if all_pass else 1


def update_coverage_ledger(results: dict) -> None:
    """Union every key that PASSED this sweep into the committed
    cumulative ledger SCALE_COVERAGE.json (round-11 verdict item 1:
    at-scale value-parity coverage must be CUMULATIVE across rounds,
    not a per-round snapshot the tranche rotation forgets). The ledger
    maps key -> sorted list of evidence tags 'r{round}@{scale}x' (or
    '@skew'); tests/test_scale_parity_guard.py asserts it only grows
    and meets the pinned coverage floor. Append-only by construction:
    a red or skipped key never removes prior evidence."""
    path = os.path.join(REPO, "SCALE_COVERAGE.json")
    ledger: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            ledger = json.load(f)
    covered = ledger.setdefault("covered", {})
    if USKEW:
        tag = f"r{ROUND}@uskew"
    elif SKEW:
        tag = f"r{ROUND}@skew"
    else:
        tag = f"r{ROUND}@{SCALE}x"
    added = 0
    for key, entry in results.items():
        if entry.get("pass") is True:
            tags = covered.setdefault(key, [])
            if tag not in tags:
                tags.append(tag)
                tags.sort()
                added += 1
    ledger["n_keys_covered"] = len(covered)
    with open(path, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"coverage ledger: {ledger['n_keys_covered']} keys covered "
        f"(+{added} new evidence tags this run)"
    )


if __name__ == "__main__":
    sys.exit(main())
