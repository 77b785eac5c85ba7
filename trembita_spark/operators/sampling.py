"""Deterministic sampling operators for training-data pipelines.

Random ``df.sample``/``sampleBy`` is non-reproducible across retries
(task re-execution re-draws), which is unacceptable in a data pipeline
whose outputs feed training runs that must be auditable. Every operator
here derives its keep/drop decision from a CONTENT hash (md5 of the row
id), so the sample is a pure function of the data: re-running the job,
re-trying a task, or changing the partitioning never changes the
selected set.

Scale posture: all operators are single-pass expressions or one
window/aggregation over the stratum key — no collect, no RNG, no
cross-partition coordination. At 100 TB the stratified sampler's only
shuffle is the per-stratum window (partition count = distinct strata,
skew-safe when strata are coarse like language/source); the weighted mix
is shuffle-FREE (pure map-side filter).

Reference parity: the trembita reference has no sampling surface
(SURVEY.md §3.10 — north-star extension); semantics follow standard
corpus-construction practice (deterministic hash-mod sampling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from the 60-bit fold of the
    row id's md5 (same construction as the dedup/fingerprint operators —
    cross-engine reproducible, no RNG)."""
    h60 = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return h60 % buckets


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fraction: float,
) -> DataFrame:
    """EXACT per-stratum sampling: keeps ``ceil(fraction * n_stratum)``
    rows from every stratum, chosen by md5-rank (deterministic, content-
    addressed). Unlike ``sampleBy`` the quota is met exactly — small
    strata are never accidentally emptied, which matters when strata are
    low-resource languages in a corpus-balancing job.

    One shuffle on the stratum key (window rank + windowed count share
    the same partitioning — Catalyst plans a single Exchange).
    """
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(order, id_col)
    wn = Window.partitionBy(stratum_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .where(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rn", "_n")
    )


def weighted_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    rates: dict[str, int],
    default_rate: int = 100,
) -> DataFrame:
    """Deterministic weighted blending of corpus sources: keep a row iff
    ``hash_bucket(id) < rate[source]`` (rate in percent). The standard
    training-mixture op — upweight curated sources, downsample crawl —
    expressed as a pure map-side filter: no shuffle, no RNG, stable
    under retries, and the SAME rows survive at any scale factor.
    """
    rate = F.lit(default_rate)
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(r)).otherwise(rate)
    return df.where(_hash_bucket(F.col(id_col)) < rate)
