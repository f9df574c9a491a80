"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (driver mandate): brute-force cosine top-k as the
exact baseline, plus two scale paths — deterministic random-hyperplane LSH
bucketing and a centroid-free IVF-style grid — that trade recall for a
quadratic→linear join reduction.

Numerics are kept exactly reproducible: vectors are cast to double and all
dot products are sequential left-to-right ``F.aggregate`` folds, so the SQL
oracle (same fold order in DuckDB list comprehensions) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    → (query_id, neighbor_id, rank, cosine), self-matches excluded, ties
    broken by neighbor id (deterministic).

    Scale shape: the query side is broadcast (top-k search is almost always
    few-queries-vs-huge-corpus); the corpus streams through a narrow
    map-side similarity projection, and per-query top-k is a window over a
    shuffle keyed by query_id. For query sets too large to broadcast, swap
    the hint for a shuffle join — the plan is otherwise identical.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _plane_coeff(plane: int | Column, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1]:
    derived from md5(plane:dim), so every engine/run agrees without a
    trained model or a seed file."""
    p = plane if isinstance(plane, Column) else F.lit(plane)
    h = F.conv(
        F.substring(F.md5(F.concat(p.cast("string"), F.lit(":"), dim.cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(0xFFFFFFFF)) * 2.0 - 1.0


def hyperplane_bucket(vec: Column, planes: int = 8) -> Column:
    """Sign-pattern LSH bucket id: bit p = 1 iff <vec, plane_p> >= 0.

    Narrow per-row computation; vectors in the same bucket are 'probably
    close' — the classic SRP (sign random projection) sketch."""
    dims = F.sequence(F.lit(1), F.size(vec))
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                dims,
                lambda v, i: v.cast("double") * _plane_coeff(p, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2 ** p)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket,
    then exact cosine rank within candidates. 2^planes buckets ⇒ the join
    shrinks ~2^planes-fold; recall degrades gracefully (raise k or lower
    ``planes`` to trade back).

    At 100 TB the corpus is pre-bucketed once (cheap narrow column),
    written partitioned by bucket, and each query probes one partition —
    partition pruning does the candidate selection for free.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall of an approximate top-k result against the exact one.

    Both inputs use the (query_id, neighbor_id, ...) contract every top-k
    operator here returns. → (query_id, n_exact, n_hit, recall) with
    ``recall = |approx ∩ exact| / |exact|`` rounded to 6 dp.

    This is the quality gauge for the ANN scale paths: run it once per
    (planes / n_centroids / nprobe) setting on a sampled query set to pick
    the recall/cost point before committing the 100 TB index layout. Scale
    shape: two narrow projections joined on (query_id, neighbor_id) — the
    exact side is small (sampled queries × k), so the join broadcasts.
    """
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
    return (
        ex.join(ap, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall",
            F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 6),
        )
    )


def quantize_vec(vec: Column, bits: int = 8) -> Column:
    """Symmetric per-vector integer quantization of a float array.

    scale = (2^(bits-1) - 1) / max(|v|); elements map to
    ``floor(v * scale + 0.5)`` — floor(+0.5) instead of ``round`` so the
    semantics are identical in every engine (SQL ``round`` half-away vs
    half-even varies). The all-zero vector quantizes to all zeros.

    Cosine over quantized vectors needs NO dequantization: the per-vector
    scales cancel in dot/(|a||b|), so the integer arrays are the whole
    index payload — 4× smaller than float32, 8× smaller than float64,
    which at 100 TB is the difference between an in-memory and a spilled
    ANN candidate join.
    """
    qmax = float(2 ** (bits - 1) - 1)
    amax = F.array_max(F.transform(vec, lambda v: F.abs(v.cast("double"))))
    scale = F.when(amax > 0, F.lit(qmax) / amax).otherwise(F.lit(0.0))
    return F.transform(
        vec, lambda v: F.floor(v.cast("double") * scale + F.lit(0.5)).cast("long")
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors — the memory-bound ANN
    variant: same plan shape as :func:`brute_force_topk` (broadcast query
    side, narrow map-side scoring, one window shuffle), but the corpus-side
    payload is integer-quantized so candidate joins move 4-8× fewer bytes.

    Integer dot products up to ~127²·dim are exactly representable in
    doubles, so the score is deterministic and the oracle can replay it.
    → (query_id, neighbor_id, rank, qcosine).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_vec(F.col(vec_col), bits).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize_vec(F.col(vec_col), bits).alias("c_vec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
        ).alias("qcosine"),
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qcosine")
    )


def assign_to_centroid(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    cent_id_col: str = "cent_id",
    cent_vec_col: str = "cent_vec",
    n_best: int = 1,
) -> DataFrame:
    """Append a ``cell`` column: the id(s) of the ``n_best`` nearest
    centroids by cosine (rounded to 6 dp; ties broken by lower centroid id
    — deterministic). ``n_best > 1`` emits one row per probed cell — the
    multi-probe expansion used by IVF's nprobe knob.

    One broadcast nested-loop pass (N × n_centroids narrow rows) + one
    row_number window keyed on the vector id. No iterative training —
    centroids are an input (trained offline or picked deterministically),
    which is how production IVF indexes are built anyway.
    """
    scored = df.crossJoin(F.broadcast(centroids)).select(
        "*",
        F.round(
            cosine_similarity(F.col(vec_col), F.col(cent_vec_col)), 6
        ).alias("_cent_cos"),
    )
    win = Window.partitionBy(id_col).orderBy(F.desc("_cent_cos"), F.asc(cent_id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= n_best)
        .drop("_rn", "_cent_cos", cent_vec_col)
        .withColumnRenamed(cent_id_col, "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroids: DataFrame | None = None,
    n_centroids: int = 16,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: inverted-file search with a multi-probe recall knob.

    1. Centroid table (default: the ``n_centroids`` lowest-id corpus
       vectors — deterministic; pass trained centroids in production).
    2. Assign every corpus vector to its nearest-centroid ``cell`` and
       every query to its ``nprobe`` nearest cells (broadcast pass, no
       shuffle on the corpus side).
    3. Join query↔corpus on ``cell`` only — the join shrinks
       ~n_centroids/nprobe-fold vs brute force — then exact cosine top-k
       over the union of probed cells (candidates deduped when a pair is
       reachable through several probes).

    → (query_id, neighbor_id, rank, cosine). Exact within the probed
    cells; raising ``nprobe`` trades candidate volume for recall — the
    standard IVF recall knob.

    At 100 TB: write the corpus partitioned by ``cell`` once; each query
    then scans ``nprobe`` partitions — partition pruning turns the index
    lookup into an I/O-level skip, and the per-cell top-k is a window over
    one shuffle keyed by query_id.
    """
    if centroids is None:
        centroids = corpus.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
    c = assign_to_centroid(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        centroids, "neighbor_id", "c_vec",
    )
    q = assign_to_centroid(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        centroids, "query_id", "q_vec", n_best=nprobe,
    )
    cand = c.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    if nprobe > 1:
        # a (query, neighbor) pair reachable through several probed cells
        # must score once; dedup on ids before the similarity math
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
