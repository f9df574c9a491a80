"""Distributed clustering building blocks (k-means / IVF training side).

The IVF index (`operators.similarity.ivf_topk`) consumes centroids; this
module produces them. One Lloyd iteration = assign + per-dimension mean —
both expressed as DataFrame ops so the loop is a handful of narrow passes
per round, exactly the shape MLlib's KMeans runs under the hood, but
oracle-checkable because every step is deterministic:

- assignment reuses `similarity.assign_to_centroid` (rounded cosine,
  centroid-id tie-break);
- the new centroid is a per-(cluster, dimension) mean computed with a
  DECIMAL-cast sum, so the aggregate is order-independent and hash-matches
  the SQL oracle despite float inputs.

Scale shape per iteration: one broadcast pass over the corpus for
assignment (centroid table is tiny by construction), one posexplode
(rows × dims, all narrow), one groupBy (cluster, dim) with map-side
partial aggregation — shuffle volume is n_clusters × dims, independent of
corpus size. Iterate driver-side; each round is a fresh short job (the
same pattern as `dedup.connected_components`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.similarity import (
    assign_to_centroid,
)


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Label every vector with its nearest centroid (cosine, deterministic
    ties) → input columns + ``cell``."""
    return assign_to_centroid(df, centroids, id_col, vec_col)


def kmeans_update(
    assigned: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "cell",
) -> DataFrame:
    """Recompute centroids from an assignment: per-(cluster, dimension)
    mean → (cluster, dim, centroid, n). ``centroid`` is rounded to 6 dp;
    the sum underneath is DECIMAL-exact so the result is identical on any
    engine and any partitioning."""
    exploded = assigned.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(vec_col).alias("dim", "val"),
    )
    dec = F.col("val").cast("double").cast("decimal(27,10)")
    return (
        exploded.groupBy("cluster", "dim")
        .agg(
            F.sum(dec).alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "cluster",
            F.col("dim").cast("int").alias("dim"),
            F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6)
            .alias("centroid"),
            "n",
        )
    )


def kmeans_step(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration: assign to nearest centroid, then per-cluster
    per-dimension mean → (cluster, dim, centroid, n). Feed the result back
    (collected to a literal table or re-joined) for the next round."""
    assigned = kmeans_assign(df, centroids, id_col, vec_col)
    return kmeans_update(assigned, vec_col)


def centroids_of(update: DataFrame) -> DataFrame:
    """Rebuild a centroid table (cent_id, cent_vec) from a
    :func:`kmeans_update` result. The vector is assembled from the
    ROUNDED per-dimension means in dim order, so a rebuilt centroid is
    identical on every engine — what makes a multi-iteration run
    oracle-checkable end to end."""
    return (
        update.groupBy(F.col("cluster").alias("cent_id"))
        .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("s"))
        .select(
            "cent_id",
            F.expr("transform(s, x -> cast(x.centroid as double))").alias("cent_vec"),
        )
    )


def kmeans_train(
    df: DataFrame,
    centroids: DataFrame,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations, returning the final centroid table
    (cent_id, cent_vec). Driver-side loop, one short job per round —
    the same iterate-and-truncate pattern as
    ``dedup.connected_components``: ``localCheckpoint`` caps lineage so
    the logical plan doesn't grow with the iteration count."""
    cents = centroids
    for _ in range(iters):
        update = kmeans_update(kmeans_assign(df, cents, id_col, vec_col), vec_col)
        cents = centroids_of(update)
        if checkpoint:
            cents = cents.localCheckpoint(eager=True)
    return cents
