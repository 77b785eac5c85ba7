"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM with N executor threads; on a real cluster the
same settings (AQE, skew-join handling, UTC session timezone, Arrow) are the
ones you want at 100 TB. Shuffle partitions default to a local-friendly
value; at cluster scale AQE coalesces / splits them at runtime, so the
static number is a starting hint, not a hard layout.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from trembita_spark.streaming.pbcompat import ensure_protobuf_env

# Must run BEFORE the first getOrCreate(): Spark python workers inherit
# the JVM's env, which is frozen at JVM launch — this is what makes
# transformWithStateInPandas (protobuf-backed state server) runnable in
# this container. No-op where protobuf is properly installed.
ensure_protobuf_env()

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "trembita_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Settings rationale (100 TB posture):

    - ``spark.sql.adaptive.enabled`` + coalesce + skewJoin: runtime re-plan
      fixes both over-partitioned small shuffles and skewed joins without
      hand-tuning per query.
    - ``spark.sql.session.timeZone=UTC``: deterministic timestamp semantics,
      matches the DuckDB oracle (UTC-naive).
    - Arrow on: vectorized Python interop for the Pandas-UDF slow path.
    - shuffle partitions ~= cores locally; on a cluster you'd size this to
      ~2-3x total executor cores and let AQE coalesce.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing floor: with the default 1 MB floor and
        # parallelismFirst, the sub-32 MB local shuffles coalesce to
        # ~10 partitions, idling 2/3 of the cores mid-query. 64 KB keeps
        # local parallelism at the session's width; at production shuffle
        # sizes (>= advisory 256 MB partitions) the floor is never the
        # binding constraint, so this is local-only in effect and
        # env-overridable for cluster tuning. Measured (noop, same box):
        # fsm 0.61->0.52, dedup_near 1.50->1.24, tfidf 0.78->0.65,
        # asof 0.48->0.35.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # 8 MB broadcast threshold, applied to BOTH the static planner and
        # AQE's runtime re-plan (which otherwise converts shuffle joins
        # back to broadcast from actual shuffle sizes). The previous 64 MB
        # let the 10.8 MB-file lineitem FACT table broadcast in the
        # sf0.1 star joins — a serial 600k-row broadcast build per query
        # that no production scale would ever plan (guide §3.1: broadcast
        # the side that fits, i.e. true dimensions; every dim here is
        # <3 MB at sf0.1 and stays broadcast). Measured on the SQL join
        # family: q5 0.89->0.77, q18 1.17->0.97, q21 1.12->0.84,
        # q9 0.78->0.64 (noop sink, quiet box). Env-overridable for
        # cluster tuning.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", str(8 * 1024 * 1024)),
        )
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", str(8 * 1024 * 1024)),
        )
        # managed-table warehouse (bucketed tables) — keep out of the repo;
        # env-overridable so concurrent gauntlet shards (tools/
        # run_gauntlet.py) don't race each other's fixed-name tables.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/trembita_spark_warehouse"
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
