"""Product quantization (PQ) — compressed vectors + ADC search.

The reference trains per-subspace k-means(256) codebooks and scores with
asymmetric distance (ADC) lookup tables (PQQuantizer.h:23-208, training
src/Quantizer/main.cpp:116-175, ADC tables PQQuantizer.h:111-130). Spark
restatement:

- train  = m independent balanced-kmeans fits over vector slices
  (operators/kmeans.py — each fit is a broadcast-argmin scan + one
  aggregation per iteration);
- encode = per-slice argmin against codebook literals, emitting
  array<int> codes — one codegen scan, 4 bytes/subspace here
  (uint8 at rest via parquet dictionary encoding);
- ADC    = per query, precompute the m x k table of
  ||q_slice - codeword||^2 on the driver (tiny numpy), inline it as
  array literals, and score every encoded row with m element_at gathers
  + adds — no Python, no join, whole-stage codegen (the exact LUT-probe
  structure of the reference's m_DistanceTables);
- reconstruct = codeword gather, for residual/debug use.

Approximate by construction: tests gate recall vs brute_force_topk
(reference TruthSet.h:242-285 harness shape).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sptag_spark.operators.kmeans import kmeans_fit


def _slice_col(vec_col: str, start: int, length: int) -> Column:
    return F.slice(F.col(vec_col), start + 1, length)


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 8,
) -> np.ndarray:
    """Train codebooks; returns array (m, k, dim/m)."""
    dim = len(df.select(vec_col).first()[0])
    assert dim % m == 0, "dim must divide into m subspaces"
    dsub = dim // m
    books = []
    for s in range(m):
        sliced = df.select(
            F.col(id_col),
            _slice_col(vec_col, s * dsub, dsub).alias("embedding"),
        )
        centroids, _ = kmeans_fit(
            sliced, k=k, id_col=id_col, vec_col="embedding", iters=iters
        )
        books.append(centroids)
    return np.stack(books)


def _argmin_code(vec_slice: Column, codebook: np.ndarray) -> Column:
    """Index of the nearest codeword (squared L2), lowest-index tiebreak."""
    dists = F.array(*[
        F.aggregate(
            F.zip_with(
                vec_slice,
                F.array(*[F.lit(float(x)) for x in cw]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for cw in codebook
    ])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m) — one codegen scan."""
    m, _, dsub = codebooks.shape
    codes = F.array(*[
        _argmin_code(_slice_col(vec_col, s * dsub, dsub), codebooks[s])
        for s in range(m)
    ])
    return df.select(F.col(id_col), codes.alias("codes"))


def pq_reconstruct(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Driver-side decode of a (n, m) code matrix -> (n, dim) vectors."""
    n, m = codes.shape
    return np.concatenate(
        [codebooks[s][codes[:, s]] for s in range(m)], axis=1
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: approx ||q - x||^2 = sum_s T_s[code_s]
    with T_s[j] = ||q_s - codeword_sj||^2 (PQQuantizer.h:111-130)."""
    m, kk, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    assert q.shape[0] == m * dsub
    dist = F.lit(0.0)
    for s in range(m):
        qs = q[s * dsub:(s + 1) * dsub]
        table = ((codebooks[s] - qs) ** 2).sum(axis=1)  # (k,)
        tlit = F.array(*[F.lit(float(t)) for t in table])
        dist = dist + F.element_at(tlit, F.element_at("codes", s + 1) + 1)
    return (
        encoded.withColumn("adc_dist", dist)
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "adc_dist")
    )
