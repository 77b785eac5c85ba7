"""Streaming sources.

Locally the unbounded source is the parquet-backed ``events`` table read
as a file stream (the driver fixture); on a cluster the same pipeline
reads ``format("kafka")`` / ``format("rate")`` — only this module
changes, the transformations are shared with batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet physical schema with ts as raw nanos (see io.load_table:
# Spark reads TIMESTAMP(NANOS) only as long via nanosAsLong).
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as an unbounded stream (file source). Normalizes
    ns→µs timestamps exactly like the batch reader so stream and batch
    plans are interchangeable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file source requires a directory: stream the sf dir with a glob
    # pinned to the events file (one micro-batch per discovered file).
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .option("recursiveFileLookup", "false")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_to_completion(df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drive a streaming DataFrame over the (finite) local fixture to
    completion into a memory sink; returns the result as a batch
    DataFrame. This is the 'streaming proof' harness: same logical plan,
    real micro-batch execution."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    return df.sparkSession.table(query_name)
