"""Optimization-round measurement harness (guide §1).

For each headline key (or $SPARK_GRAFT_OPT_KEYS):
  - capture .explain("formatted") to plans/r12/<key>_<tag>.txt
  - time, separately and with the job labelled in the UI:
      build    — Python-side DataFrame construction + analysis
      noop     — df.write.format("noop") (computes every column, no
                 driver transfer; prices the PLAN — guide §1.4)
      collect  — the bench protocol's action (plan + driver transfer)
  - count plan features: Exchange nodes, join strategies, Python
    eval nodes, PushedFilters presence.

Usage: python tools/opt_measure.py <tag> [runs]
Writes plans/r12/<key>_<tag>.txt and prints one JSON line per key.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trembita_spark import contract  # noqa: E402
from trembita_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q_flagship_q1",
    "q_agg_rollup",
    "q_join_inner",
    "q_join_asof",
    "q_window_rank",
    "q_topk",
    "q_distinct_by",
    "q_agg_product",
    "q_fsm_sessionize",
    "q_dedup_near",
    "q_similarity_topk",
    "q_text_tfidf",
    "q_sql_q5",
    "q_join_salted",
    "q_pipeline_clean_corpus",
]


def plan_features(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "pushed_filters": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\]", plan),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    keys_env = os.environ.get("SPARK_GRAFT_OPT_KEYS")
    keys = [k.strip() for k in keys_env.split(",")] if keys_env else HEADLINE

    contract.load_all()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name=f"opt_measure_{tag}")
    sc = spark.sparkContext

    # Warm-up every key once (JIT, file listing, codegen caches).
    for key in keys:
        contract.QUERIES[key](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    results = {}
    for key in keys:
        build_t, noop_t, collect_t = [], [], []
        plan_txt = None
        for r in range(runs):
            t0 = time.perf_counter()
            df = contract.QUERIES[key](spark, SF_DIR)
            df._jdf.queryExecution().executedPlan()  # force analysis+planning
            build_t.append(time.perf_counter() - t0)
            if plan_txt is None:
                plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            sc.setJobDescription(f"{key}: noop")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop_t.append(time.perf_counter() - t0)
            sc.setJobDescription(f"{key}: collect")
            t0 = time.perf_counter()
            contract.QUERIES[key](spark, SF_DIR).collect()
            collect_t.append(time.perf_counter() - t0)
            sc.setJobDescription(None)
        with open(os.path.join(out_dir, f"{key}_{tag}.txt"), "w") as f:
            f.write(plan_txt)
        feats = plan_features(plan_txt)
        rec = {
            "build": round(statistics.median(build_t), 4),
            "noop": round(statistics.median(noop_t), 4),
            "collect": round(statistics.median(collect_t), 4),
            **feats,
        }
        results[key] = rec
        print(json.dumps({"key": key, **rec}), flush=True)
    total = {
        "key": "TOTAL",
        "build": round(sum(r["build"] for r in results.values()), 4),
        "noop": round(sum(r["noop"] for r in results.values()), 4),
        "collect": round(sum(r["collect"] for r in results.values()), 4),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(total), flush=True)


if __name__ == "__main__":
    main()
