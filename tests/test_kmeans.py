"""Balanced k-means tests: convergence on separable data, determinism,
and the balance penalty actually balancing (reference BKTree.h:250-251
lambda semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from sptag_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    partition_sizes,
)


@pytest.fixture(scope="module")
def blobs(spark):
    """3 well-separated 2-D blobs, 60/30/10 skewed sizes, deterministic."""
    rng = np.random.default_rng(42)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    sizes = [60, 30, 10]
    rows = []
    i = 0
    for c, n in zip(centers, sizes):
        for _ in range(n):
            p = c + rng.normal(0, 0.5, 2)
            rows.append((i, [float(p[0]), float(p[1])]))
            i += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


def test_converges_to_true_blobs(blobs):
    cents, assigned = kmeans_fit(blobs, k=3, iters=15)
    # every true blob center is within 0.5 of some fitted centroid
    true = np.array([[0, 0], [10, 10], [-10, 10]], dtype=float)
    for t in true:
        assert min(np.linalg.norm(cents - t, axis=1)) < 0.5
    # cluster purity: points 0..59 share one label, 60..89 another, etc.
    lab = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert len({lab[i] for i in range(60)}) == 1
    assert len({lab[i] for i in range(60, 90)}) == 1
    assert len({lab[i] for i in range(90, 100)}) == 1


def test_deterministic(blobs):
    c1, _ = kmeans_fit(blobs, k=3, iters=5)
    c2, _ = kmeans_fit(blobs, k=3, iters=5)
    assert np.array_equal(c1, c2)


def test_balance_penalty_semantics(spark):
    """cost = dist^2 + lam*count: a point slightly nearer the crowded
    centroid flips to the emptier one once lam*count_delta exceeds the
    distance advantage (BKTree.h:250-251)."""
    df = spark.createDataFrame([(0, [4.0, 0.0])], ["vec_id", "embedding"])
    cents = np.array([[0.0, 0.0], [10.0, 0.0]])  # dists^2: 16 vs 36
    counts = np.array([100.0, 0.0])
    near = assign_clusters(df, cents, counts=counts, lam=0.0).first()
    assert near["cluster"] == 0
    flipped = assign_clusters(df, cents, counts=counts, lam=1.0).first()
    assert flipped["cluster"] == 1  # 16+100 > 36+0


def test_small_lambda_preserves_separable_clustering(blobs):
    """On well-separated blobs a penalty far below the inter-blob distance
    scale must not disturb the geometry-optimal solution."""
    _, plain = kmeans_fit(blobs, k=3, iters=10, lam=0.0)
    _, mild = kmeans_fit(blobs, k=3, iters=10, lam=0.01)
    assert sorted(partition_sizes(plain).values()) == \
        sorted(partition_sizes(mild).values()) == [10, 30, 60]


def test_assign_is_argmin(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0])], ["vec_id", "embedding"]
    )
    cents = np.array([[0.0, 0.0], [6.0, 6.0]])
    got = {r["vec_id"]: r["cluster"]
           for r in assign_clusters(df, cents).collect()}
    assert got == {0: 0, 1: 1}
