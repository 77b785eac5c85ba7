"""Pipeline sample — the DataPipelineT fluent surface (map / filter /
flatMap / distinct / sort / take), mirroring the reference's
per-environment examples; one engine here, Catalyst underneath.

Run: python examples/pipeline_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.pipeline import Pipeline
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="pipeline_sample")
    docs = table(spark, sf_dir, "documents")
    top_tokens = (
        Pipeline(docs)
        .filter_(F.col("lang") == "en")
        .flat_map(F.split("text", " "), alias="token", keep=["doc_id"])
        .map_({"token": F.lower("token"), "doc_id": F.col("doc_id")})
        .df.groupBy("token")
        .count()
        .orderBy(F.col("count").desc(), "token")
        .limit(10)
    )
    top_tokens.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
