"""Distributed linear algebra over embedding columns.

The tall-and-skinny regime: N rows (huge) × d dims (small, fits any
executor). Second-moment statistics — covariance, Gram matrix, PCA —
reduce to ONE pass of partial aggregation: each row expands map-side to
its d² products, a single shuffle carries d² groups (4096 for d=64,
regardless of N), and everything downstream of the aggregate is
driver-trivial. This is the canonical 100 TB shape: never a self-join
on vec_id (that shuffles N·d rows), never a collect of vectors.

PCA completes on the driver: the d×d covariance is numpy-eigen-solved
locally (d² doubles — bytes, not data), then the projection matrix is
broadcast back for a map-side projection. Only the moment pass touches
the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_matrix(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Sample covariance of an ``array<float>`` column as (j, k, cov)
    rows, 0-based dims, upper triangle (j ≤ k).

    cov_jk = (Σ x_j·x_k − Σx_j·Σx_k / n) / (n − 1), computed in ONE
    scan with ZERO joins: per-row nested ``transform`` expands the d²
    (product, x_j, x_k) triples map-side (bounded by d², not by N), and
    a single groupBy(j, k) accumulates the second moment AND both first
    moments per group — every row contributes one triple to every
    (j, k), so Σ x_j within a group IS the global Σ x_j. Products are
    per-row doubles (bit-deterministic); the sums are merge-order-
    sensitive, so checked consumers round the final cov.
    """
    from trembita_spark.io import spread_scan

    # Generate ONLY the upper triangle (slice from j) instead of the
    # full d² grid filtered afterwards — halves the per-row expansion —
    # and spread the under-split scan so the d²/2-per-row explode runs
    # cluster-wide (io.spread_scan; no-op at production split counts).
    # Row set verified identical to the filtered full-grid expansion.
    pairs = spread_scan(df.select(F.col(vec_col).alias("__v")), "__v").select(
        F.explode(
            F.expr(
                """flatten(transform(__v, (xj, j) ->
                     transform(slice(__v, j + 1, size(__v) - j), (xk, i) ->
                       struct(j AS j, j + i AS k,
                              CAST(xj AS DOUBLE) * CAST(xk AS DOUBLE) AS p,
                              CAST(xj AS DOUBLE) AS xv,
                              CAST(xk AS DOUBLE) AS yv))))"""
            )
        ).alias("e")
    ).select("e.j", "e.k", "e.p", "e.xv", "e.yv")
    return (
        pairs.groupBy("j", "k")
        .agg(
            F.sum("p").alias("s_jk"),
            F.sum("xv").alias("s_j"),
            F.sum("yv").alias("s_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "j",
            "k",
            (
                (F.col("s_jk") - F.col("s_j") * F.col("s_k") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("cov"),
        )
    )


def pca_project(df: DataFrame, n_components: int = 4, vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Project vectors onto their top ``n_components`` principal axes:
    moment pass (``covariance_matrix``) → driver-side numpy eigh on the
    d×d matrix → broadcast the (d × k) projection back as a literal for
    a map-side ``aggregate`` dot product. Eigenvector SIGN is not
    canonical across LAPACK builds, so each axis is sign-fixed to make
    its largest-|coeff| component positive — deterministic output.
    Returns (id, array<double> of length k)."""
    import numpy as np

    d_rows = covariance_matrix(df, vec_col).collect()
    d = max(r.k for r in d_rows) + 1
    cov = np.zeros((d, d))
    for r in d_rows:
        cov[r.j, r.k] = cov[r.k, r.j] = r.cov
    _vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, ::-1][:, :n_components]  # eigh: ascending eigenvalues
    for c in range(top.shape[1]):
        pivot = int(np.argmax(np.abs(top[:, c])))
        if top[pivot, c] < 0:
            top[:, c] = -top[:, c]
    axes = [[float(v) for v in top[:, c]] for c in range(top.shape[1])]
    proj = F.array(
        *[
            F.expr(
                f"""aggregate(zip_with({vec_col},
                       array({', '.join(f'{w!r}D' for w in axis)}),
                       (x, w) -> CAST(x AS DOUBLE) * w),
                     CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""
            )
            for axis in axes
        ]
    )
    return df.select(F.col(id_col), proj.alias("components"))
