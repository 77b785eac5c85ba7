"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extraction
run as Arrow-batched ``mapInPandas`` over the bytes. The decode step is
STUBBED (no image/audio libraries in this container — see
``decode_image``) but the Spark-side plumbing — schema, batch shape,
partitioning posture — is real and tested.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` moderate, never collect payloads,
and push metadata-only predicates (size/kind/checksum) BEFORE any decode
so partition/row pruning happens on the cheap columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: synthesizes a binary payload column from text
    (the testdata has no true binary column) + the metadata struct every
    real ingest would carry."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
            F.lit("text/plain").alias("kind"),
        ),
    )


def decode_image(payload_bytes: bytes):
    """Decode an image payload to pixels. STUB: the container ships no
    imaging libraries; on a real cluster this body is
    ``PIL.Image.open(io.BytesIO(payload_bytes))``."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; plumbing (schema/batching/partitioning) is real"
    )


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (the real
    decode slot). Deterministic fake: first FEATURE_DIM byte values as
    float features + byte-sum — exercises the exact Arrow batch shape a
    real extractor (CLIP/whisper/resize) would use."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _id, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                head = list(b[:FEATURE_DIM]) + [0] * max(0, FEATURE_DIM - len(b))
                feats.append(
                    {
                        id_col: _id,
                        "features": [float(x) for x in head],
                        "byte_sum": int(sum(b)),
                    }
                )
            yield pd.DataFrame(feats)

    return df.select(id_col, payload_col).mapInPandas(
        fe, f"{id_col} long, features array<double>, byte_sum long"
    )
