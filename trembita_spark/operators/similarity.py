"""Similarity search over embedding columns (``array<float>``).

North-star extension (BASELINE.json). :func:`topk` is the front door
and routes to the APPROXIMATE path by default (mirroring the dedup
design: approximate default, exact as opt-in verification). Two paths:

- :func:`ivf_topk` — the DEFAULT. IVF-style pruning: partition the
  corpus into cells (a provided/derived cluster id), compute cell
  centroids, probe only the closest ``nprobe`` cell(s) per query,
  exact-rerank inside. This is the 100 TB shape: the full corpus is
  never scanned per query — only matching cells move, and a
  cell-partitioned layout turns the probe into partition pruning.
- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; one pass, no shuffle of the corpus.
  O(|corpus|·|queries|·dim) scan-local work — use as the recall
  baseline / verification mode, or when |corpus| is small.

All arithmetic is sequential double folds (``F.aggregate`` left fold),
which DuckDB mirrors bit-exactly with ``list_reduce`` — keeping even
floating-point similarity oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in float64 (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("norm", _norm(F.col(vec_col)))


def topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    exact: bool = False,
    refined: bool = False,
    **kwargs,
) -> DataFrame:
    """Top-k similar vectors per query — the routing entry point.

    Defaults to the scalable approximate path (:func:`ivf_topk`); pass
    ``refined=True`` for the serving-quality IVF + SQ8 + exact-re-rank
    pipeline (:func:`ivf_topk_refined` — recall@10 ≥ 0.9 at nprobe=6),
    or ``exact=True`` for the brute-force verification mode
    (:func:`cosine_topk`). Keyword args are forwarded to the chosen
    implementation."""
    if exact:
        kwargs.pop("cell_col", None)
        kwargs.pop("nprobe", None)
        kwargs.pop("shortlist", None)
        return cosine_topk(corpus, queries, k=k, **kwargs)
    if refined:
        return ivf_topk_refined(corpus, queries, k=k, **kwargs)
    return ivf_topk(corpus, queries, k=k, **kwargs)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector: (query_id, vec_id,
    cos, rank). Ties broken by vec_id for determinism. The query side is
    broadcast — the corpus never shuffles."""
    q = F.broadcast(
        with_norm(queries, vec_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("norm").alias("q_norm"),
        )
    )
    # Spread the corpus so the per-row dot products run across the
    # session's cores instead of inside the one scan task of an
    # under-split local file (no-op at production split counts).
    from trembita_spark.io import spread_scan

    c = with_norm(spread_scan(corpus, id_col), vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"), F.col("norm").alias("c_norm")
    )
    scored = (
        c.join(q, F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")))
        .select("query_id", "vec_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_range(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Radius (range) search: ALL corpus vectors with cosine >=
    ``threshold`` per query — top-k's fixed-quality sibling (serving
    dedup/recall jobs want "everything at least this similar", not a
    fixed count). Returns (query_id, vec_id, cos). Same execution shape
    as cosine_topk: broadcast queries, corpus never shuffles, and the
    threshold filter is scan-local so output (not corpus) size is the
    only thing that moves. No window at all — range search needs no
    ranking."""
    q = F.broadcast(
        with_norm(queries, vec_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("norm").alias("q_norm"),
        )
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    return (
        c.join(q, F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
        .where(F.col("cos") >= threshold)
        .select("query_id", "vec_id", "cos")
    )


def cosine_pairs_within(
    df: DataFrame,
    group_col: str = "label",
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs WITHIN a bucketing column
    (cluster/LSH cell/label) with cosine >= threshold. The group column
    is the blocking key that avoids the all-pairs O(n²) — pair work is
    sum of per-bucket squares."""
    from trembita_spark.io import spread_scan

    # spread the under-split scan: the per-pair 64-dim dot fold is the
    # stage's whole cost and the build side broadcasts, so the probe
    # side otherwise grinds every bucket's pairs inside the one scan
    # task (io.spread_scan; no-op at production split counts)
    n = spread_scan(
        with_norm(df, vec_col).select(
            F.col(id_col).alias("vec_id"),
            F.col(group_col).alias("g"),
            F.col(vec_col).alias("v"),
            "norm",
        ),
        "vec_id",
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn(
            "cos",
            _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm")),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos",
        )
    )


def _cell_centroids(corpus: DataFrame, cell_col: str, vec_col: str) -> DataFrame:
    """(cell, centroid) means via exact decimal sums (order-independent)
    so the whole IVF pipeline is bit-deterministic and oracle-checkable."""
    dim_vals = corpus.select(
        F.col(cell_col).alias("cell"), F.posexplode(vec_col).alias("dim", "x")
    )
    return (
        dim_vals.groupBy("cell", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
        .select("cell", F.transform("pairs", lambda p: p.getField("m")).alias("centroid"))
    )


def _probe_cells(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Route each query to its ``nprobe`` nearest centroids (broadcast —
    the centroid table is cells·dim doubles, never the corpus)."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col("norm").alias("q_norm")
    )
    routed = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("c_norm", _norm(F.col("centroid")))
        .withColumn("cos_c", _dot(F.col("q_vec"), F.col("centroid")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_c").desc(), F.col("cell"))
    return routed.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= nprobe).select(
        "query_id", "q_vec", "q_norm", "cell"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: centroids per cell → route each query to its
    ``nprobe`` nearest centroids → exact cosine rerank INSIDE those cells
    only. At 100 TB the corpus is stored partitioned by cell, so a probe
    prunes partitions at the scan (only matching cells are read)."""
    centroids = _cell_centroids(corpus, cell_col, vec_col)
    probe = _probe_cells(queries, centroids, nprobe, vec_col, id_col)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(cell_col).alias("cell"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cell", "cos", "rank")
    )


def ivf_topk_refined(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 2,
    shortlist: int = 12,
) -> DataFrame:
    """IVF-SQ8 two-stage serving: probe ``nprobe`` cells, score the
    probed candidates against SCALAR-QUANTIZED (256-level per-dim grid)
    reconstructions to build a per-query ``shortlist``, then exact-cosine
    re-rank ONLY the shortlist rows on full-precision vectors.

    This is the standard IVF + SQ8 + re-rank pipeline: at 100 TB the
    codes table (1 byte/dim) is the hot scanned corpus — 4-8× fewer
    bytes than float vectors — and full precision is read for
    |Q|·shortlist rows only. Recall is governed by ``nprobe`` (the probe
    either contains the true neighbor's cell or nothing downstream can
    recover it) and ``shortlist`` (the SQ8 ordering must not push a true
    neighbor below the cut); the re-rank then restores exact ordering
    within the shortlist. tests/test_operators.py::
    test_ivf_refined_recall pins recall@10 ≥ 0.9 on kmeans cells at
    nprobe=6 (vs 0.648 for plain ivf_topk at nprobe=2 in
    test_ivf_recall_vs_exact).

    Deterministic / oracle-replayable end to end: quantization uses only
    exact IEEE ops (sub/div/mul/floor — no round()), per-dim [lo, hi]
    ranges come from one tiny (dim)-keyed aggregate broadcast back as
    arrays, and every dot product is the sequential double left-fold
    DuckDB mirrors with list_reduce. Corpus never shuffles: stats and
    probe broadcast in, the shortlist broadcasts into the re-rank join.
    """
    centroids = _cell_centroids(corpus, cell_col, vec_col)
    probe = _probe_cells(queries, centroids, nprobe, vec_col, id_col)
    # per-dim quantization range: one 〈dim〉-keyed agg folded into two
    # arrays on a single broadcastable row (scalar-bounds cross join).
    stats = (
        corpus.select(F.posexplode(vec_col).alias("dim", "fv"))
        .select("dim", F.col("fv").cast("double").alias("v"))
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "lo"))).alias("lp"),
            F.array_sort(F.collect_list(F.struct("dim", "hi"))).alias("hp"),
        )
        .select(
            F.transform("lp", lambda p: p.getField("lo")).alias("lo_arr"),
            F.transform("hp", lambda p: p.getField("hi")).alias("hi_arr"),
        )
    )

    def recon(x, i):
        lo = F.get(F.col("lo_arr"), i)
        hi = F.get(F.col("hi_arr"), i)
        code = F.least(F.lit(255), F.floor((x.cast("double") - lo) / (hi - lo) * 256))
        return F.when(hi == lo, lo).otherwise(
            lo + (code.cast("double") + 0.5) * (hi - lo) / 256
        )

    c = (
        corpus.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(cell_col).alias("cell"),
            F.transform(F.col(vec_col), recon).alias("recon"),
        )
        .withColumn("r_norm", _norm(F.col("recon")))
    )
    cand = (
        c.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_q",
            _dot(F.col("q_vec"), F.col("recon")) / (F.col("q_norm") * F.col("r_norm")),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("cos_q").desc(), F.col("vec_id"))
    short = (
        cand.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "vec_id", "cell")
    )
    # exact re-rank: only shortlist rows touch full-precision vectors.
    cfull = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"), F.col("norm").alias("c_norm")
    )
    qfull = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col("norm").alias("q_norm")
    )
    scored = (
        cfull.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .withColumn(
            "cos",
            _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cell", "cos", "rank")
    )


def _plane_sign(plane: int):
    """Deterministic ±1 hyperplane coefficient for (plane, dim-index):
    +1 iff the first hex char of md5('h{plane}|{index}') < '8' (an even
    16-way split). Derived from md5 so BOTH engines (and every retry /
    every executor) see the identical pseudo-random plane with no RNG,
    no seed plumbing, and no broadcast of a coefficient matrix."""

    def coef(x, i):
        cond = (
            F.substring(F.md5(F.concat(F.lit(f"h{plane}|"), i.cast("string"))), 1, 1)
            < "8"
        )
        return F.when(cond, x.cast("double")).otherwise(-x.cast("double"))

    return coef


def signlsh_signature(
    df: DataFrame,
    planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane (sign) LSH for cosine similarity: project each
    vector onto ``planes`` deterministic ±1 hyperplanes and keep the
    sign bit of each projection → a ``planes``-bit bucket signature
    (string of 0/1). Vectors with high cosine land in the same bucket
    with probability (1 - θ/π)^planes (Charikar 2002, public result).

    Scale shape: one narrow projection pass over the corpus (no shuffle,
    no pairs); the signature is then a PARTITION KEY — store the corpus
    bucketed by it and candidate generation is a bucket-local scan, the
    same posture as :func:`ivf_topk` cells. Multi-probe (flipping the
    lowest-|projection| bits) widens recall without rescanning.

    All projections are sequential double left-folds (F.aggregate), so
    a SQL oracle reproduces them bit-exactly via list_reduce.
    """
    sig = F.concat(
        *[
            F.when(
                F.aggregate(
                    F.transform(F.col(vec_col), _plane_sign(p)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(planes)
        ]
    )
    return df.select(F.col(id_col).alias("vec_id"), sig.alias("sig"))


def signlsh_buckets(
    df: DataFrame,
    planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, sig, bucket_n): each vector's sign-LSH signature plus
    its bucket's population — the candidate-set size a same-bucket ANN
    probe would rerank. One projection pass + one count agg on sig."""
    sigs = signlsh_signature(df, planes, vec_col, id_col)
    sizes = sigs.groupBy("sig").agg(F.count(F.lit(1)).alias("bucket_n"))
    return sigs.join(sizes, "sig").select("vec_id", "sig", "bucket_n")


def signlsh_candidates(
    df: DataFrame,
    planes: int = 8,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN candidate pairs: exact cosine over SAME-BUCKET pairs only —
    the sign-LSH analogue of :func:`cosine_pairs_within` with the
    signature as the blocking key (per-bucket-squared work, never
    corpus-squared)."""
    sigs = signlsh_signature(df, planes, vec_col, id_col).withColumnRenamed(
        "vec_id", "sid"
    )
    blocked = df.join(sigs, df[id_col] == sigs.sid).drop("sid")
    return cosine_pairs_within(
        blocked, group_col="sig", threshold=threshold, vec_col=vec_col, id_col=id_col
    )


def _sqdist(a: Column, b: Column) -> Column:
    """Sequential left-fold squared-L2 distance in float64: DuckDB's
    ``list_reduce`` mirrors the fold bit-exactly (0.0+x == x)."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, p: acc + p)


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic k-means: ``iters`` assign/update rounds, then a
    final assignment — returns (vec_id, cluster, dist). Init centroids
    are the vectors with the ``k`` smallest ids (deterministic, no RNG —
    same rationale as dedup's md5 sampling); a real deployment seeds
    with a k-means|| sample instead, same loop.

    Fully oracle-checkable like ivf_topk: assignment distance is a
    sequential double fold (bit-exact vs ``list_reduce``), and argmin
    ties break on cluster id. Centroid means are QUANTIZED-exact: each
    coordinate is floored to a 2^-24 grid (one float32 mantissa step)
    and summed as int64 — floor on a double is exact, integer sums are
    order-independent, and the final int64→double cast is correctly
    rounded in every engine, so the means are bit-identical with no
    decimal cast (whose last digit is engine-dependent for arbitrary
    doubles — graph.py provenance note). The 2^-24 centroid snap is a
    quantization ≤ the input's own float32 resolution.

    Scale: each round is one broadcast of k·dim doubles against the
    corpus (scan-local assignment, NO shuffle of the points) plus one
    (cluster, dim)-keyed partial aggregate — the canonical distributed
    k-means round. Clusters that lose all members drop out, matching
    the oracle's group-by semantics.
    """
    pts = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    cents = _km_centroids(pts, k, iters)
    return _km_assign(pts, cents).select("vec_id", "cluster", "d")


def _km_assign(pts: DataFrame, c_df: DataFrame) -> DataFrame:
    """Assign each (vec_id, v) point to its nearest centroid in ``c_df``
    ((cluster, c) rows, broadcast): scan-local, no shuffle of points."""
    scored = pts.crossJoin(F.broadcast(c_df)).select(
        "vec_id", "v", "cluster", _sqdist(F.col("v"), F.col("c")).alias("d")
    )
    best = scored.groupBy("vec_id").agg(
        F.min_by(F.struct("cluster", "v", "d"), F.struct("d", "cluster")).alias("a")
    )
    return best.select(
        "vec_id", F.col("a.cluster").alias("cluster"),
        F.col("a.v").alias("v"), F.col("a.d").alias("d"),
    )


def _km_centroids(pts: DataFrame, k: int, iters: int) -> DataFrame:
    """``iters`` Lloyd rounds from smallest-id init; returns the final
    (cluster, c) centroid table (see kmeans docstring for the
    quantized-exact mean construction)."""
    cents = pts.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )
    for _ in range(iters):
        assigned = _km_assign(pts, cents)
        cents = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.floor(F.col("x") * 16777216.0).cast("long")).cast("double")
                    / F.count(F.lit(1))
                    / 16777216.0
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
            .select(
                "cluster", F.transform("pairs", lambda p: p.getField("m")).alias("c")
            )
        )
    return cents


def pq_index(
    df: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 8,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization index (Jégou, Douze & Schmid 2011, public):
    split each vector into ``m`` contiguous subvectors of ``dim // m``
    dims, train a ``ksub``-centroid codebook per subspace with the same
    deterministic Lloyd loop as :func:`kmeans`, and encode every vector
    as its per-subspace nearest-centroid ids.

    Returns ``(codebook, codes)``: codebook is (sub, code, c) —
    m·ksub rows, broadcastable forever; codes is (vec_id, sub, code) —
    the corpus compressed from dim floats to m small ints per vector
    (the 64-float fixture vector becomes 4 codes ≈ 64× smaller). At
    100 TB the codes table IS the searchable corpus; full-precision
    vectors are only read to build/refresh the index.

    Deterministic end-to-end (smallest-id init, quantized-exact means,
    id-tiebroken argmin) — same oracle-replayable construction as
    kmeans, per subspace.
    """
    dsub = dim // m
    assert dsub * m == dim, (dim, m)
    pts = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("full"),
    )
    books, codes = [], []
    for j in range(m):
        pts_j = pts.select("vec_id", F.slice("full", j * dsub + 1, dsub).alias("v"))
        cents_j = _km_centroids(pts_j, ksub, iters)
        books.append(
            cents_j.select(
                F.lit(j).alias("sub"), F.col("cluster").alias("code"), "c"
            )
        )
        codes.append(
            _km_assign(pts_j, cents_j).select(
                "vec_id", F.lit(j).alias("sub"), F.col("cluster").alias("code")
            )
        )
    book = books[0]
    code = codes[0]
    for b in books[1:]:
        book = book.unionAll(b)
    for c in codes[1:]:
        code = code.unionAll(c)
    return book, code


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 4,
    ksub: int = 8,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus:
    each query precomputes a (sub, code) → partial-squared-distance
    lookup table against the broadcast codebook (m·ksub·|Q| tiny rows),
    then approx distance is the SUM of m table lookups per corpus
    vector — no full-precision vector is ever read at query time.

    The per-pair sum is decimal-exact (order-independent), so results
    are deterministic and oracle-replayable; ``adist`` is rounded to 6
    to wash the engines' double→decimal last-ulp cast difference
    (kmeans `dist` precedent). Scale: the scored pair stream is
    |corpus|·|Q| code lookups (integers, map-side joined against the
    broadcast table) reduced by one (query, vec) aggregate; for
    planet-scale corpora route through IVF cells first and run this
    inside probed cells only (IVF-PQ), same expressions.
    """
    dsub = dim // m
    book, codes = pq_index(
        corpus, dim=dim, m=m, ksub=ksub, iters=iters, vec_col=vec_col, id_col=id_col
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("full"),
    )
    qsub = qs.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.slice("full", j * dsub + 1, dsub).alias("qv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", F.col("s.sub").alias("sub"), F.col("s.qv").alias("qv"))
    dtab = qsub.join(F.broadcast(book), "sub").select(
        "query_id", "sub", "code", _sqdist(F.col("qv"), F.col("c")).alias("contrib")
    )
    scored = (
        codes.join(F.broadcast(dtab), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum(F.col("contrib").cast("decimal(18,12)"))
            .cast("double")
            .alias("adist"),
            F.count(F.lit(1)).alias("_nsub"),
        )
        .where(F.col("_nsub") == m)
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("adist", 6).alias("adist"), "rank")
    )


def pq_topk_refined(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    shortlist: int = 100,
    m: int = 8,
    ksub: int = 32,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ-ADC shortlist + exact re-rank — the standard two-stage ANN
    serving pipeline: the compressed codes produce a ``shortlist``
    (cheap, no full vectors touched), then ONLY shortlist rows read
    their full-precision vectors for an exact squared-L2 re-rank.
    Recall ≈ shortlist containment (tests/test_operators.py pins it on
    the fixture); full-vector IO is |Q|·shortlist rows instead of the
    corpus."""
    short = pq_topk(
        corpus, queries, dim=dim, k=shortlist, m=m, ksub=ksub, iters=iters,
        vec_col=vec_col, id_col=id_col,
    ).select("query_id", "vec_id")
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("c_full"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("q_full"),
    )
    scored = (
        short.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "vec_id", _sqdist(F.col("q_full"), F.col("c_full")).alias("dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dist", "rank")
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by MAXIMUM INNER PRODUCT (un-normalized dot), the
    retrieval objective of dual-encoder rankers where vector norm
    carries signal: (query_id, vec_id, dot, rank), ties by vec_id.

    Brute force here is the correctness baseline; the scale path is the
    standard MIPS->cosine reduction (Bachrach et al. 2014): augment
    corpus vectors to [x, sqrt(M^2 - |x|^2)] with M = max |x| and
    queries to [q, 0] — inner-product order becomes cosine order, so
    any cosine ANN index (the sign-LSH / IVF machinery in this module)
    answers MIPS after that one extra dimension. Queries broadcast; the
    corpus never shuffles; the per-query top-k is a partitioned
    row_number that Spark 4 prunes with WindowGroupLimit."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(q, F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", _dot(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "vec_id", "dot")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def dbscan_geo(
    points: DataFrame,
    eps_km: float,
    min_pts: int,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Distributed DBSCAN over geographic points: density clusters with
    core/border/noise roles — composed entirely from the engine's
    scale-safe primitives, the way DBSCAN distributes in practice:

    1. neighbor pairs within eps via the lossless latitude-band radius
       join (``joins.geo_radius_join`` — candidates bands-local, never
       points²);
    2. core points = >= min_pts neighbors (one partial-agg count over
       the undirected pair list);
    3. clusters = connected components of the core-core subgraph
       (pointer-jumping min-label propagation, O(log diameter) rounds);
    4. border points attach to the MIN cluster among adjacent cores
       (deterministic tie-break); everything else is noise.

    Returns (id, role, cluster) with cluster = min core id of the
    component, -1 for noise. Every step is an equi-join or partial agg;
    density explosion is bounded by the radius join's candidate shape.
    """
    from trembita_spark.operators.dedup import connected_components
    from trembita_spark.operators.joins import geo_radius_join

    pts = points.select(
        F.col(id_col).alias("id"), F.col(lat_col).alias("lat"), F.col(lon_col).alias("lon")
    ).localCheckpoint(eager=False)
    pairs = geo_radius_join(pts, eps_km).localCheckpoint(eager=False)
    und = pairs.select(F.col("id_a").alias("id"), F.col("id_b").alias("nb")).unionAll(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    deg = und.groupBy("id").agg(F.count(F.lit(1)).alias("n_nb"))
    core = deg.where(F.col("n_nb") >= min_pts).select("id").localCheckpoint(eager=False)
    core_edges = (
        pairs.join(core.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .join(core.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    comp = connected_components(core_edges).select(
        F.col("node").alias("id"), F.col("cluster_id").alias("cluster")
    )
    # isolated cores (no core neighbor) form singleton clusters
    core_clustered = core.join(comp, "id", "left").select(
        "id", F.coalesce("cluster", F.col("id")).alias("cluster")
    ).localCheckpoint(eager=False)
    border = (
        und.join(core_clustered.withColumnRenamed("id", "nb"), "nb")
        .join(core_clustered.select("id"), "id", "left_anti")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    core_out = core_clustered.select("id", F.lit("core").alias("role"), "cluster")
    border_out = border.select("id", F.lit("border").alias("role"), "cluster")
    claimed = core_out.select("id").unionAll(border_out.select("id"))
    noise = pts.join(claimed, "id", "left_anti").select(
        "id", F.lit("noise").alias("role"), F.lit(-1).cast("long").alias("cluster")
    )
    return core_out.unionAll(border_out).unionAll(noise)


def farthest_point_init(
    df: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic k-means++-style farthest-point initialization:
    center 1 is the lowest-id vector; each subsequent center is the
    candidate whose squared distance to its NEAREST already-chosen
    center is LARGEST (ties → lowest id) — the classic 2-approximation
    seeding (Gonzalez) that replaces k-means++'s D²-sampling with its
    deterministic argmax limit, keeping the result oracle-checkable.

    Returns (step, id, d2): d2 is the candidate's min squared distance
    to the previously chosen centers at selection time (NULL for the
    seed). Distances are the same sequential-fold float64 as
    :func:`kmeans` (``_sqdist``), so argmax ties are bit-stable across
    engines. Scale: each round is candidates × broadcast(chosen ≤ k)
    then ONE TakeOrdered(1) — the corpus never shuffles, and the
    chosen frame is k rows by construction."""
    if k < 1:
        raise ValueError("farthest_point_init requires k >= 1")
    cand = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    chosen = (
        cand.orderBy("id")
        .limit(1)
        .select(
            F.lit(1).alias("step"),
            "id",
            F.lit(None).cast("double").alias("d2"),
            "vec",
        )
    )
    for step in range(2, k + 1):
        centers = chosen.select(F.col("id").alias("c_id"), F.col("vec").alias("c_vec"))
        nxt = (
            cand.join(F.broadcast(centers.select("c_id")), cand.id == F.col("c_id"), "left_anti")
            .crossJoin(F.broadcast(centers))
            .select("id", "vec", _sqdist(F.col("vec"), F.col("c_vec")).alias("d"))
            .groupBy("id", "vec")
            .agg(F.min("d").alias("d2"))
            .orderBy(F.col("d2").desc(), "id")
            .limit(1)
            .select(F.lit(step).alias("step"), "id", "d2", "vec")
        )
        chosen = chosen.unionAll(nxt).localCheckpoint(eager=False)
    return chosen.select("step", "id", "d2")
