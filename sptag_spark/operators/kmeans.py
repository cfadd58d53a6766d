"""Balanced k-means partitioning — the reference's build-side clustering.

SPTAG's BKT layer is Lloyd's k-means with a balance penalty: assignment
cost = dist + lambda*count[cluster] so partitions stay bounded
(BKTree.h:219-333; lambda auto-tune DynamicFactorSelect :437-486; the MPI
twin BalancedDataPartition/main.cpp:460-700). The Spark restatement:

- partial/final aggregation of per-cluster sums == groupBy(cluster)
  .agg(sum(vec), count) — the reference's tid-strided partial arrays
  merged serially (:234-331) are exactly Spark's map-side partial agg +
  shuffle reduce (A1/A2);
- the assignment scan is a broadcast argmin over the centroid table
  (J1's shape);
- the balance penalty is applied per ITERATION from the previous
  iteration's counts (synchronized Lloyd), not per-row sequentially as
  the reference's shared atomic counters do — documented divergence, same
  fixed point in practice, and the only form that makes sense when the
  scan is distributed.

Centroids live on the driver between iterations (k x dim doubles — tiny);
the data never leaves executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a.cast("double") - b)
                   * (a.cast("double") - b)),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    counts: np.ndarray | None = None,
    lam: float = 0.0,
    out_col: str = "cluster",
) -> DataFrame:
    """argmin over centroids with optional balance penalty
    cost_k = ||x - c_k||^2 + lam * count_k (reference BKTree.h:250-251).
    Pure column expressions: centroids are inlined literals (broadcast by
    the plan), the scan is whole-stage codegen, no shuffle."""
    k = len(centroids)
    pen = counts if counts is not None else np.zeros(k)
    costs = F.array(*[
        _sq_dist(F.col(vec_col), centroids[i]) + F.lit(float(lam * pen[i]))
        for i in range(k)
    ])
    # argmin with lowest-index tiebreak
    best = F.array_position(costs, F.array_min(costs)).cast("int") - 1
    return df.withColumn(out_col, best)


def init_centroids(
    df: DataFrame, k: int, id_col: str, vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic seeding: the k rows with smallest xxhash64(id) — the
    reference's sampled head selection (SPANNIndex.cpp:901-938).
    TakeOrdered (orderBy+limit), not a global window: distributed."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    return np.array([[float(x) for x in r[vec_col]] for r in rows])


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 10,
    lam: float = 0.0,
) -> tuple[np.ndarray, DataFrame]:
    """Lloyd iterations with optional balance penalty; returns (centroids,
    df+cluster). Per iteration: one broadcast-argmin scan + one
    groupBy(cluster) partial/final aggregation (two narrow jobs)."""
    centroids = init_centroids(df, k, id_col, vec_col)
    counts = np.zeros(k)
    dim = centroids.shape[1]
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col,
                                   counts=counts, lam=lam)
        # per-cluster vector sums: aggregate the array elementwise (JVM),
        # the reference's newCenters/newCounts partials (BKTree.h:234-295)
        agg = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new_centroids = centroids.copy()
        counts = np.zeros(k)
        for row in agg:
            c = row["cluster"]
            counts[c] = row["n"]
            new_centroids[c] = [row[f"s{i}"] / row["n"] for i in range(dim)]
        if np.allclose(new_centroids, centroids, atol=1e-12):
            centroids = new_centroids
            break
        centroids = new_centroids
    final = assign_clusters(df, centroids, vec_col, counts=counts, lam=lam)
    return centroids, final


def partition_sizes(assigned: DataFrame) -> dict[int, int]:
    return {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
