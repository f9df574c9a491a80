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


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with the two norms supplied from precomputed columns.

    Bit-identical to :func:`cosine_similarity` (same fold, same guard,
    same op order) but lets the caller hoist each side's norm out of a
    pairwise join — one fold per PAIR instead of three, and each row's
    norm is computed once per ROW. At N queries × M corpus rows that's
    3NM folds → NM + N + M."""
    denom = norm_a * norm_b
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
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_norms(
                    F.col("q_vec"),
                    F.col("c_vec"),
                    F.col("q_norm"),
                    F.col("c_norm"),
                ),
                6,
            ).alias("cosine"),
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


def brute_force_l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact squared-L2 top-k neighbors for every query vector — the exact
    twin of the PQ path's metric (:func:`pq_topk` estimates squared L2, so
    its recall must be gauged against an L2 baseline, not the cosine one;
    unnormalized embeddings order differently under the two metrics).

    → (query_id, neighbor_id, rank, dist), self-matches excluded, distance
    rounded to 6 dp before ranking and ties broken by neighbor id, so the
    ordering is deterministic and engine-portable. Same scale shape as
    :func:`brute_force_topk`: broadcast queries, narrow distance
    projection over the corpus scan, one window shuffle keyed on query_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_sqdist(F.col("q_vec"), F.col("c_vec")), 6).alias("dist"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
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


def _sqdist(a: Column, b: Column) -> Column:
    """In-order fold of squared differences — deterministic double sum."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_refine_once(
    corpus: DataFrame,
    cb_row: DataFrame,
    vec_col: str,
    n_sub: int,
    sub_dim: int,
) -> DataFrame:
    """One per-subspace Lloyd iteration over the PQ codebook: every corpus
    subvector is assigned to its nearest code (squared distance, first-code
    tie-break — the same rule :func:`pq_topk` encodes with), then each
    (sub, code) centroid becomes the DECIMAL-exact per-dimension mean of
    its members, rounded to 6 dp (the :func:`clustering.kmeans_update`
    recipe, so the SQL oracle replays the iteration bit-for-bit). Codes
    that attract no members keep their previous centroid.

    Scale shape: one broadcast of the KB codebook over the corpus scan
    (narrow), one (sub, code, dim)-keyed agg whose map-side combine caps
    the shuffle at ``n_sub · n_codes · sub_dim`` rows per task — corpus-
    size-independent, same as a k-means round.
    """
    cb = F.col("cb")
    sv = F.transform(
        F.slice(F.col("__v"), F.col("sub") * sub_dim + 1, sub_dim),
        lambda x: x.cast("double"),
    )
    subv = (
        corpus.crossJoin(F.broadcast(cb_row))
        .select(
            cb.alias("cb"),
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub"),
            F.col(vec_col).alias("__v"),
        )
        .select("cb", "sub", sv.alias("sv"))
    )
    dists = F.transform(
        F.element_at(F.col("cb"), F.col("sub") + 1),
        lambda c: _sqdist(F.col("sv"), c),
    )
    assigned = subv.select(
        "sub",
        "sv",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("code"),
    )
    ex = assigned.select("sub", "code", F.posexplode("sv").alias("dim", "val"))
    means = ex.groupBy("sub", "code", "dim").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(27,10)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("m")
    )
    new_vecs = (
        means.groupBy("sub", "code")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("s"))
        .select(
            "sub",
            "code",
            F.expr("transform(s, x -> cast(x.m as double))").alias("cvec_new"),
        )
    )
    grid = cb_row.select(F.posexplode("cb").alias("sub", "arr")).select(
        "sub", F.posexplode("arr").alias("code", "cvec_old")
    )
    merged = grid.join(new_vecs, ["sub", "code"], "left").select(
        "sub", "code", F.coalesce("cvec_new", "cvec_old").alias("cvec")
    )
    by_sub = merged.groupBy("sub").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("code", "cvec"))),
            lambda s: s["cvec"],
        ).alias("arr")
    )
    return by_sub.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "arr"))),
            lambda s: s["arr"],
        ).alias("cb")
    )


def pq_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    refine_iters: int = 0,
) -> DataFrame:
    """Product-quantization codebook as ONE nested-array row:
    ``cb[sub][code] = centroid subvector`` (``n_sub · n_codes`` subvectors,
    ≈ KBs — broadcastable at any corpus size).

    Centroids default to the ``n_codes`` lowest-id corpus vectors sliced
    per subspace — deterministic, the same convention as :func:`ivf_topk`.
    ``refine_iters > 0`` runs that many per-subspace k-means (Lloyd)
    iterations over the seeds (:func:`_pq_refine_once`): centroids move to
    the DECIMAL-exact rounded mean of their assigned subvectors, which
    tightens quantization error and top-k recall while staying fully
    oracle-replayable.
    """
    w = Window.orderBy(id_col)
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_codes)
        .withColumn("code", F.row_number().over(w) - 1)
    )
    per_sub = seeds.select(
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub"),
        F.col(vec_col).alias("v"),
    ).select(
        "sub",
        "code",
        F.transform(
            F.slice(F.col("v"), F.col("sub") * sub_dim + 1, sub_dim),
            lambda x: x.cast("double"),
        ).alias("cvec"),
    )
    by_sub = per_sub.groupBy("sub").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("code", "cvec"))),
            lambda s: s["cvec"],
        ).alias("arr")
    )
    cb_row = by_sub.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "arr"))),
            lambda s: s["arr"],
        ).alias("cb")
    )
    for _ in range(refine_iters):
        cb_row = _pq_refine_once(corpus, cb_row, vec_col, n_sub, sub_dim)
    return cb_row


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    refine_iters: int = 0,
) -> DataFrame:
    """Product-quantization ANN: encode every corpus vector as ``n_sub``
    codebook codes (argmin subvector distance, first-code tie-break), then
    score query↔corpus pairs by ASYMMETRIC DISTANCE — the exact query
    subvector against the RECONSTRUCTED corpus subvector — and take the
    per-query top-k.

    The memory story is the point at 100 TB: a 64-dim float vector (256 B)
    compresses to ``n_sub`` bytes of codes; the codebook broadcasts and
    scoring is a narrow projection over the corpus scan (queries
    broadcast) + one window shuffle for the top-k. No join on codes, no
    distance-table shuffle.

    Determinism: per-subspace distances are in-order folds rounded to 6 dp
    and summed as DECIMAL — order-independent, so the SQL oracle replays
    the identical estimate. → (query_id, neighbor_id, rank, dist_est).
    """
    cb_row = pq_codebook(
        corpus, id_col, vec_col, n_sub, sub_dim, n_codes, refine_iters
    )
    cb = F.col("cb")

    def sub_slice(vec: Column, s: int) -> Column:
        return F.slice(vec, s * sub_dim + 1, sub_dim)

    encoded = corpus.crossJoin(F.broadcast(cb_row))

    def _dist_fn(s: int):
        # single-parameter lambda: a 2-arg lambda would be interpreted as
        # transform's (element, index) signature and clobber the closure
        return lambda c: _sqdist(sub_slice(F.col(vec_col), s), c)

    def _lut_fn(s: int):
        # the quantized sub-distance exactly as the per-pair form
        # computed it — same rounding, same decimal type, so the LUT
        # lookup sum is bit-identical to the inline fold it replaces
        return lambda c: F.round(_sqdist(sub_slice(F.col(vec_col), s), c), 6).cast(
            "decimal(18,6)"
        )

    code_cols = []
    for s in range(n_sub):
        dists = F.transform(F.element_at(cb, s + 1), _dist_fn(s))
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(f"code_{s}")
        )
    encoded = encoded.select(
        F.col(id_col).alias("neighbor_id"), *code_cols
    )

    # Round-9 (guide §1.2 step 2): classic PQ asymmetric-distance table —
    # the per-pair distance depends only on (query, sub, code), so the
    # n_sub × n_codes quantized sub-distances are computed ONCE per query
    # here (Q × 64 decimals, broadcast with the query row) and the
    # per-pair score becomes n_sub array lookups + a decimal sum instead
    # of n_sub full sub_dim-wide folds per (query, corpus) pair —
    # identical decimals in identical order, ~sub_dim× less pair CPU.
    q = queries.crossJoin(F.broadcast(cb_row)).select(
        F.col(id_col).alias("query_id"),
        F.array(
            *[
                F.transform(F.element_at(cb, s + 1), _lut_fn(s))
                for s in range(n_sub)
            ]
        ).alias("__lut"),
    )
    pairs = encoded.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    )
    est: Column | None = None
    for s in range(n_sub):
        d = F.element_at(
            F.element_at(F.col("__lut"), s + 1), F.col(f"code_{s}") + 1
        )
        est = d if est is None else est + d
    scored = pairs.select("query_id", "neighbor_id", est.alias("dist"))
    win = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.col("dist").cast("double").alias("dist_est"),
        )
    )


# --------------------------------------------------------------------------
# contrastive-pair mining + embedding-space label diagnostics
# --------------------------------------------------------------------------
def labeled_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    same_label: bool = False,
) -> DataFrame:
    """Contrastive-pair mining for embedding training data.

    ``same_label=False`` → hard-NEGATIVE mining: for each query, the k
    most-similar corpus vectors with a DIFFERENT label (the negatives a
    contrastive loss learns most from). ``same_label=True`` → positive
    mining: k most-similar with the SAME label. → (query_id, query_label,
    neighbor_id, neighbor_label, rank, cosine).

    Scale shape: identical to :func:`brute_force_topk` — broadcast query
    side, narrow map-side cosine, one per-query top-k window. The label
    predicate rides the join condition, so mismatched pairs are dropped
    before scoring.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("query_label"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("neighbor_label"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    label_pred = (
        (F.col("query_label") == F.col("neighbor_label"))
        if same_label
        else (F.col("query_label") != F.col("neighbor_label"))
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id")) & label_pred,
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        F.round(
            cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ),
            6,
        ).alias("cosine"),
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label", "rank", "cosine"
        )
    )


def knn_label_agreement(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Embedding-quality gauge: k-NN majority-vote label vs own label.

    For each query vector, take its k exact nearest neighbors (cosine,
    self excluded), majority-vote their labels (ties → smallest label),
    and aggregate per true label: → (label, n_queries, n_agree,
    agreement). High agreement ⇒ the embedding space separates that
    class; low ⇒ label noise or entangled clusters — exactly the triage
    signal used when curating labeled embedding datasets.

    One broadcast join + two keyed shuffles (per-query top-k window, then
    the vote/agg); the corpus side streams narrow.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("true_label"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("neighbor_label"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "true_label",
        "neighbor_id",
        "neighbor_label",
        F.round(
            cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ),
            6,
        ).alias("cosine"),
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    knn = scored.withColumn("rank", F.row_number().over(win)).where(F.col("rank") <= k)
    votes = knn.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    vote_win = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("neighbor_label")
    )
    picked = (
        votes.withColumn("vr", F.row_number().over(vote_win))
        .where(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("neighbor_label").alias("voted_label"))
    )
    return (
        picked.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(
                F.when(F.col("voted_label") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_agree"),
        )
        .select(
            "label",
            "n_queries",
            "n_agree",
            F.round(
                F.col("n_agree").cast("double") / F.col("n_queries").cast("double"), 6
            ).alias("agreement"),
        )
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k0: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N candidate
    rankings into one hybrid list — the standard way to combine a sparse
    lexical ranking (BM25) with a dense embedding ranking without score
    calibration, since RRF consumes only the RANKS:

    ``rrf(d) = Σ_lists 1 / (k0 + rank_list(d))``

    Each input DataFrame is an already-truncated top-N list of
    ``(id_col, rank_col)`` rows (rank 1-based); a document missing from a
    list contributes 0 for it. Per-list contributions are rounded to 6 dp
    and summed as DECIMAL(18,6) → integer micro-score, so the fused order
    is engine-portable despite the float reciprocal.

    Scale shape: the candidate pool is the UNION of the input top-N lists
    — bounded by N×|lists| per query, never corpus-sized — so the fuse is
    one union + one keyed agg; the final ordering window runs over that
    bounded pool. Multi-query fusion = same call with a composite id
    (query_id, doc_id) carried in ``id_col`` upstream and the window
    partitioned by query — this single-query shape is the building block.

    → ``(id_col, <name>_rank ... per input list [0 = absent],
    rrf_micro, fused_rank)``, top-``topk`` rows by fused score
    (ties broken by id).
    """
    from pyspark.sql import Window

    if not rankings:
        raise ValueError(
            "rrf_fuse needs at least one ranking (got an empty dict)"
        )
    parts = [
        df.select(
            F.col(id_col).alias("__id"),
            F.lit(name).alias("__list"),
            F.col(rank_col).cast("int").alias("__rank"),
        )
        for name, df in rankings.items()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = F.round(
        F.lit(1.0) / (F.lit(float(k0)) + F.col("__rank").cast("double")), 6
    ).cast("decimal(18,6)")
    fused = u.groupBy("__id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("__list") == name, F.col("__rank"))),
                F.lit(0),
            ).alias(f"{name}_rank")
            for name in rankings
        ],
        (F.sum(contrib) * F.lit(1000000)).cast("long").alias("rrf_micro"),
    )
    w = Window.orderBy(F.desc("rrf_micro"), F.asc("__id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= topk)
        .withColumnRenamed("__id", id_col)
    )


# position-discount table for ndcg_at_k: W[i] = round(10^6 / log2(i+1)).
# Materialized ONCE in Python so the Spark operator and the SQL oracle
# share literal integers — no engine ever evaluates the log.
def _ndcg_weights(k: int) -> list[tuple[int, int]]:
    import math

    return [(i, round(1_000_000 / math.log2(i + 1))) for i in range(1, k + 1)]


def ndcg_at_k(
    ranked: DataFrame,
    query_col: str,
    pos_col: str,
    rel_col: str,
    rel_totals: DataFrame,
    k: int = 10,
) -> DataFrame:
    """nDCG@k + MRR per query over an already-ranked candidate table
    with binary relevance — the retrieval-eval pair every RAG/search
    rollout gates on (Järvelin & Kekäläinen 2002, public), computed
    WITHOUT a single engine-evaluated logarithm: the position
    discounts ``1/log2(i+1)`` are micro-integer LITERALS materialized
    in Python (k ≤ 20 contract), so DCG and IDCG are exact BIGINT sums
    and only the final ratio is a double shape rounded to 6.

    ``rel_totals`` supplies (query, n_relevant) — corpus-wide relevant
    counts, so IDCG uses the ideal top-min(R, k) prefix, the standard
    definition. MRR is ``10^6 div first-relevant-position`` (0 when
    nothing relevant was retrieved).

    Scale: the ranking is the caller's cost; this is a broadcast join
    of a k-row weight table + one keyed agg over queries × k rows.

    → ``(query, n_retrieved, n_relevant_total, dcg_micro, idcg_micro,
    ndcg, mrr_micro)``.
    """
    if k > 20:
        raise ValueError(f"ndcg_at_k supports k <= 20, got {k}")
    spark = ranked.sparkSession
    weights = _ndcg_weights(k)
    wdf = spark.createDataFrame(weights, "pos long, w_micro long")
    cum = []
    acc = 0
    for _, w in weights:
        acc += w
        cum.append(acc)
    # IDCG lookup: m relevant (capped at k) -> sum of the first m weights
    idcg_rows = [(0, 0)] + [(i + 1, c) for i, c in enumerate(cum)]
    idf = spark.createDataFrame(idcg_rows, "m long, idcg_micro long")
    base = ranked.select(
        F.col(query_col).alias("query"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(rel_col).cast("boolean").alias("rel"),
    ).where(F.col("pos") <= k)
    scored = base.join(F.broadcast(wdf), "pos")
    per_q = scored.groupBy("query").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum(F.when(F.col("rel"), F.col("w_micro")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dcg_micro"),
        F.min(F.when(F.col("rel"), F.col("pos"))).alias("__first_rel"),
    )
    tot = rel_totals.select(
        F.col(rel_totals.columns[0]).alias("query"),
        F.col(rel_totals.columns[1]).cast("long").alias("n_relevant_total"),
    )
    # FULL outer join: a query present in rel_totals but with zero
    # retrieved rows within top-k must still surface (n_retrieved=0,
    # dcg=0, ndcg=0, mrr=0) — dropping it would silently overstate a
    # downstream mean over this table. Queries retrieved but absent
    # from rel_totals keep the n_relevant_total=0 treatment.
    joined = (
        per_q.join(tot, "query", "full")
        .withColumn(
            "n_retrieved",
            F.coalesce(F.col("n_retrieved"), F.lit(0).cast("long")),
        )
        .withColumn(
            "dcg_micro",
            F.coalesce(F.col("dcg_micro"), F.lit(0).cast("long")),
        )
        .withColumn(
            "n_relevant_total",
            F.coalesce(F.col("n_relevant_total"), F.lit(0).cast("long")),
        )
        .withColumn(
            "__m", F.least(F.col("n_relevant_total"), F.lit(int(k)).cast("long"))
        )
        .join(F.broadcast(idf), F.col("__m") == F.col("m"))
    )
    ndcg = F.when(
        F.col("idcg_micro") > 0,
        F.round(
            F.col("dcg_micro").cast("double")
            / F.col("idcg_micro").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    mrr = F.when(
        F.col("__first_rel").isNotNull(),
        F.expr("CAST(1000000 div __first_rel AS BIGINT)"),
    ).otherwise(F.lit(0).cast("long"))
    return joined.select(
        "query",
        "n_retrieved",
        "n_relevant_total",
        "dcg_micro",
        "idcg_micro",
        ndcg.alias("ndcg"),
        mrr.alias("mrr_micro"),
    )
