"""End-to-end corpus construction sample — the round-4 operator chain a
web-crawl→training-shards pipeline runs:

markup strip → substring-span dup scoring (Lee-et-al style) →
paragraph-level dedup scrub → semantic dedup (kmeans + within-cluster
cosine) on embeddings → image near-dup (perceptual dHash bands) →
token-budget selection → deterministic shard assignment.

Every stage is the oracle-checked operator the contract registers; this
file just shows them composed.

Run: python examples/corpus_build_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.operators.sampling import budget_select, shard_assign
from trembita_spark.operators.similarity import cosine_pairs_within, kmeans
from trembita_spark.operators.text import chunk_documents, strip_markup
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="corpus_build_sample")
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")

    # 1. boilerplate removal (here: prove it is a no-op on clean text)
    clean = strip_markup(docs).select("doc_id", F.col("clean").alias("text"))
    print("stripped:", clean.count(), "docs")

    # 1b. substring-span duplication scoring: drop docs where more than
    #     half the 8-token spans also appear in another doc
    from trembita_spark.operators.dedup import duplicated_span_report

    span_scores = duplicated_span_report(clean, k=8)
    keep_ids = span_scores.where(F.col("dup_frac") <= 0.5).select("doc_id")
    clean = clean.join(keep_ids, "doc_id", "left_semi")
    print("after substring-dup filter:", clean.count(), "docs")

    # 2. paragraph-granularity dedup: drop chunks already owned by a
    #    lower-id doc, reassemble survivors
    ch = chunk_documents(clean, chunk_tokens=3, overlap=0).select(
        "doc_id", "chunk_id", "chunk_text", F.md5("chunk_text").alias("h")
    )
    owner = ch.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    kept = ch.join(owner, "h").where(F.col("doc_id") == F.col("keeper"))
    scrubbed = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                lambda s: s.getField("chunk_text"),
            ),
            " ",
        ).alias("text")
    )
    print("after paragraph scrub:", scrubbed.count(), "docs survive")

    # 3. semantic dedup on the embedding table (SemDedup shape)
    assigned = kmeans(emb, k=8, iters=2).select("vec_id", "cluster")
    clustered = emb.drop("label").join(assigned, "vec_id")
    drops = (
        cosine_pairs_within(clustered, group_col="cluster", threshold=0.32)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    print("semantic dedup drops:", drops.count(), "vectors")

    # 3b. image near-dup: perceptual dHash bands over the (synthetic)
    #     image payloads — band collisions are the LSH candidates
    from trembita_spark.operators.multimodal import attach_pixel_payload, dhash_bands

    bands = dhash_bands(attach_pixel_payload(scrubbed.select("doc_id")))
    img_cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    print("image near-dup candidates:", img_cand.count(), "pairs")

    # 4. token-budget selection (longest-first) on the scrubbed corpus
    weighted = scrubbed.select(
        "doc_id", "text", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    selected = budget_select(
        weighted,
        weight_col="n_tokens",
        order_by=[F.col("n_tokens").desc(), F.col("doc_id")],
        budget=5000,
        cum_col="cum_tokens",
    )
    print("budget-selected:", selected.count(), "docs")

    # 5. deterministic shard assignment; write partitioned by shard in a
    #    real pipeline (parquet files land pre-shuffled + reproducible)
    sharded = shard_assign(selected, id_col="doc_id", n_shards=4)
    sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("shard").show()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
