"""LLM training-data pipeline sample — the north-star composition:
exact dedup → near-dup clustering → quality/repetition filters →
language allowlist → deterministic stratified sample → token budget.

Run: python examples/llm_pipeline_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.operators.dedup import dedup_clusters
from trembita_spark.operators.sampling import stratified_sample
from trembita_spark.operators.text import repetition_signals, token_counts
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="llm_pipeline_sample")
    docs = table(spark, sf_dir, "documents")

    clusters = dedup_clusters(docs)  # (doc_id, cluster_id); keep representatives
    keep = clusters.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    rep = repetition_signals(docs)
    toks = token_counts(docs)

    corpus = (
        docs.join(keep, "doc_id")
        .join(rep, "doc_id")
        .join(toks, "doc_id")
        .where(
            (F.col("dup_bigram_frac") < 0.2)
            & (F.col("top_token_share") < 0.2)
            & (F.col("ws_tokens") >= 10)
            & F.col("lang").isin("en", "de", "es", "fr")
        )
    )
    sample = stratified_sample(corpus, "lang", "doc_id", 0.5)
    sample.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("ws_tokens").alias("token_budget"),
    ).orderBy("lang").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
