"""Two-level centroid hierarchy — the BKT shape for large head counts.

The reference builds a *tree* of balanced k-means so head selection costs
O(log C) per probe instead of O(C) (BKTree.h:524-865); at 100 TB you want
~10^5 heads and a flat argmin over that many centroids neither compiles
as expressions nor matmuls cheaply. The Spark restatement is two levels
(the regime where C = k1*k2 up to ~10^5, k1,k2 <= ~316 each):

- fit: coarse balanced k-means (operators/kmeans.py — broadcast-argmin
  scans + one agg per iteration), then ONE applyInPandas pass fits k2
  fine centroids inside every coarse cell in parallel (numpy Lloyd per
  cell, deterministic id-ordered init). Total heads = k1 * k2.
- assign: per Arrow batch, greedy descent — cosine argmax over k1 coarse
  heads, then argmax over that cell's k2 fine heads: k1 + k2 dots per
  row instead of k1*k2 (the BKT tree walk, BKTree.h:799-827). Greedy
  descent is approximate exactly the way the reference's tree search is.
- probe: top-p coarse cells per query, score those cells' fine heads,
  global top-nprobe buckets — then the standard partition-pruned
  candidate scan + exact quantized-cosine top-k.

bucket id = coarse_cell * k2 + fine_idx, so the persisted layout is the
same partitionBy('bucket') contract ivf_build writes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sptag_spark.functions.vecarrow import list_to_matrix
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from sptag_spark.operators.kmeans import kmeans_fit


def hierarchical_heads_fit(
    df: DataFrame,
    k1: int = 32,
    k2: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_iters: int = 8,
    cell_iters: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit (coarse (k1, dim), fine (k1, k2, dim)) centroid tiers.

    Cells with fewer than k2 rows pad by repeating their first centroid:
    padded copies tie exactly with the original and argmax's first-index
    rule means they are never selected, so no bucket ids are wasted on
    phantom heads beyond the cell's real count.
    """
    coarse, assigned = kmeans_fit(
        df, k1, id_col=id_col, vec_col=vec_col, iters=coarse_iters
    )
    dim = coarse.shape[1]

    out_schema = StructType([
        StructField("cell", IntegerType()),
        StructField("fine_idx", IntegerType()),
        StructField("n_fine", IntegerType()),
        StructField("centroid", ArrayType(DoubleType())),
    ])

    def fit_cell(pdf):
        import pandas as pd

        from sptag_spark.operators.pq import _np_kmeans

        pdf = pdf.sort_values(id_col, kind="mergesort")
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        kk = min(k2, len(X))
        C = _np_kmeans(X, kk, iters=cell_iters)
        cell = int(pdf["cluster"].iloc[0])
        return pd.DataFrame({
            "cell": [cell] * kk,
            "fine_idx": list(range(kk)),
            "n_fine": [kk] * kk,
            "centroid": [list(map(float, c)) for c in C],
        })

    rows = (
        assigned.select(id_col, vec_col, "cluster")
        .groupBy("cluster")
        .applyInPandas(fit_cell, schema=out_schema)
        .collect()
    )
    fine = np.zeros((k1, k2, dim))
    n_fine = np.zeros(k1, dtype=np.int64)
    for r in rows:
        fine[r["cell"], r["fine_idx"]] = r["centroid"]
        n_fine[r["cell"]] = r["n_fine"]
    # pad: short cells repeat their fine_idx 0 centroid for the unused
    # slots >= n_fine (explicit count from fit_cell — a legitimately
    # all-zero fine centroid is NOT mistaken for padding); empty cells
    # repeat the coarse centroid (nothing assigns there anyway). Padded
    # copies tie exactly with the original and argmax's first-index rule
    # means they are never selected.
    for c in range(k1):
        base = fine[c, 0] if n_fine[c] > 0 else coarse[c]
        fine[c, n_fine[c]:] = base
    return coarse, fine


def _cos_scores(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Cosine of float64 rows X against centroid rows C (assignment
    metric — internal to head selection, no cross-engine contract)."""
    xn = np.sqrt((X * X).sum(axis=1))
    cn = np.sqrt((C * C).sum(axis=1))
    cn = np.where(cn == 0, 1.0, cn)
    xn = np.where(xn == 0, 1.0, xn)
    return (X @ C.T) / (xn[:, None] * cn[None, :])


def hierarchical_assign(
    corpus: DataFrame,
    coarse: np.ndarray,
    fine: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """corpus + bucket (= cell * k2 + fine_idx) via greedy two-level
    descent: one (n, k1) + one (n_cell, k2) matmul per Arrow batch."""
    import pyarrow as pa
    from pyspark.sql.types import LongType

    k1, k2, _ = fine.shape
    out_schema = StructType(
        list(corpus.schema.fields) + [StructField("bucket", LongType())]
    )
    out_names = [f.name for f in out_schema.fields]

    def run(batches):
        for batch in batches:
            X = list_to_matrix(batch.column(vec_col), np.float64)
            if len(X) == 0:
                buckets = np.array([], dtype=np.int64)
            else:
                cells = _cos_scores(X, coarse).argmax(axis=1)
                buckets = np.empty(len(X), dtype=np.int64)
                for c in np.unique(cells):
                    idx = np.where(cells == c)[0]
                    fi = _cos_scores(X[idx], fine[c]).argmax(axis=1)
                    buckets[idx] = int(c) * k2 + fi
            yield pa.RecordBatch.from_arrays(
                [batch.column(n) for n in out_names[:-1]]
                + [pa.array(buckets)],
                names=out_names,
            )

    return corpus.mapInArrow(run, schema=out_schema)


def _probe_buckets_hierarchical(
    queries: DataFrame,
    coarse: np.ndarray,
    fine: np.ndarray,
    nprobe: int,
    coarse_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, bucket): top-coarse_probe cells, then global
    top-nprobe among those cells' fine heads."""
    import pyarrow as pa
    from pyspark.sql.types import LongType

    k1, k2, _ = fine.shape
    cp = min(coarse_probe, k1)
    out_schema = StructType([
        StructField("query_id", queries.schema[id_col].dataType),
        StructField("bucket", LongType()),
    ])

    def run(batches):
        for batch in batches:
            X = list_to_matrix(batch.column(vec_col), np.float64)
            if len(X) == 0:
                continue
            qid = batch.column(id_col)
            if isinstance(qid, pa.ChunkedArray):
                qid = qid.combine_chunks()
            qids = qid.to_numpy(zero_copy_only=False)
            top_cells = np.argsort(
                -_cos_scores(X, coarse), axis=1, kind="stable"
            )[:, :cp]
            out_q, out_b = [], []
            for r in range(len(X)):
                cells = top_cells[r]
                heads = np.concatenate([fine[c] for c in cells])
                ids = np.concatenate(
                    [np.arange(k2, dtype=np.int64) + int(c) * k2
                     for c in cells]
                )
                s = _cos_scores(X[r:r + 1], heads)[0]
                order = np.argsort(-s, kind="stable")[:nprobe]
                chosen = np.unique(ids[order])
                out_q.extend([qids[r]] * len(chosen))
                out_b.extend(chosen.tolist())
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q), pa.array(out_b, pa.int64())],
                names=["query_id", "bucket"],
            )

    q = queries.select(id_col, vec_col)
    return q.mapInArrow(run, schema=out_schema)


def ivf_build_hierarchical(
    corpus: DataFrame,
    path: str,
    k1: int = 32,
    k2: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the two-level index: bucketed postings (same layout
    contract as knn.ivf_build) + both centroid tiers as parquet."""
    spark = corpus.sparkSession
    coarse, fine = hierarchical_heads_fit(
        corpus, k1, k2, id_col=id_col, vec_col=vec_col
    )
    bucketed = hierarchical_assign(corpus, coarse, fine, id_col, vec_col)
    bucketed.write.mode("overwrite").partitionBy("bucket") \
        .parquet(f"{path}/postings")
    k1_, k2_, dim = fine.shape
    spark.createDataFrame(
        [(int(c), [float(x) for x in coarse[c]]) for c in range(k1_)],
        ["cell", "centroid"],
    ).write.mode("overwrite").parquet(f"{path}/coarse")
    spark.createDataFrame(
        [(int(c), int(j), [float(x) for x in fine[c, j]])
         for c in range(k1_) for j in range(k2_)],
        ["cell", "fine_idx", "centroid"],
    ).write.mode("overwrite").parquet(f"{path}/fine")


def ivf_probe_hierarchical(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 32,
    coarse_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
    probe_mode: str = "auto",
) -> DataFrame:
    """Probe the persisted two-level index: descend the tiers for bucket
    ids, then the SHARED partition-pruned scoring tail
    (knn.probe_pruned_topk — one probe-kernel execution, optional
    pushed metadata predicate, driver/join probe-selection split)."""
    from sptag_spark.operators.knn import probe_pruned_topk

    c_rows = spark.read.parquet(f"{path}/coarse").collect()
    f_rows = spark.read.parquet(f"{path}/fine").collect()
    k1 = len(c_rows)
    k2 = max(r["fine_idx"] for r in f_rows) + 1
    dim = len(c_rows[0]["centroid"])
    coarse = np.zeros((k1, dim))
    fine = np.zeros((k1, k2, dim))
    for r in c_rows:
        coarse[r["cell"]] = r["centroid"]
    for r in f_rows:
        fine[r["cell"], r["fine_idx"]] = r["centroid"]

    probes = _probe_buckets_hierarchical(
        queries, coarse, fine, nprobe, coarse_probe, id_col, vec_col
    )
    return probe_pruned_topk(spark, path, probes, queries, k,
                             id_col, vec_col, predicate,
                             probe_mode=probe_mode)
