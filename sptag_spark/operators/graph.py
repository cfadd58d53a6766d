"""k-NN graph construction + RNG pruning — the reference's neighborhood
graph, relationally.

SPTAG builds an N x 32 neighbor graph by scoring all pairs inside TPT
leaves (NeighborhoodGraph.h:328-442) and prunes each adjacency list with
the Relative Neighborhood Graph rule: candidate j (in ascending distance
order) is kept only if no already-accepted neighbor l is closer to j than
the query is (RelativeNeighborhoodGraph.h:18-35) — the rule that keeps
edges *diverse* instead of clustered.

Spark restatement:
- build_knn_graph: blocked exact scoring (one int64 numpy matmul per
  unordered block pair, as in knn.cosine_near_dup_pairs_blocked), but
  each block pair emits only its LOCAL top-k per row — the true global
  top-k is always inside the union of per-block top-k (every true
  neighbor lives in exactly one block) — then ONE window takes the
  global top-k per source. Shuffle volume is O(N * k * n_blocks), never
  O(N^2).
- rng_prune: grouped vectorized pass per source row over its (tiny,
  <= k) candidate list — numpy inside applyInPandas, no per-row Python
  at the Spark API.

Distances are quantized-cosine (engine-standard, exact ints + IEEE
float64) so results are reproducible everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from sptag_spark.functions.vecarrow import exact_int_matmul
from sptag_spark.operators.knn import _with_quantized


def build_knn_graph(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """(src, dst, cosine, rank) — exact top-k neighbors per row."""
    q = _with_quantized(df, id_col, vec_col)
    blk = q.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks)).cast("int")
    )

    def pairs_for(b):
        entries = []
        for i in range(n_blocks):
            for j in range(i, n_blocks):
                pid = i * n_blocks + j
                side = (
                    F.when(b == i, F.lit("L")).otherwise(F.lit("R"))
                    if i != j else F.lit("B")
                )
                entries.append(
                    F.when((b == i) | (b == j),
                           F.struct(F.lit(pid).alias("pid"),
                                    side.alias("side")))
                )
        return F.filter(F.array(*entries), lambda x: x.isNotNull())

    tagged = blk.select(
        "_id", "_q", "_norm", F.explode(pairs_for(F.col("_blk"))).alias("_p")
    ).select("_id", "_q", "_norm",
             F.col("_p.pid").alias("_pid"), F.col("_p.side").alias("_side"))

    out_schema = StructType([
        StructField("src", df.schema[id_col].dataType),
        StructField("dst", df.schema[id_col].dataType),
        StructField("cosine", DoubleType()),
    ])

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        def mats(sub):
            ids = sub["_id"].to_numpy()
            X = np.array(sub["_q"].tolist(), dtype=np.int64)
            nrm = np.sqrt(sub["_norm"].to_numpy(dtype=np.float64))
            return ids, X, nrm

        def emit(ids_a, cos, ids_b):
            """per row of `ids_a`, all entries >= the row's k-th cosine —
            ties at the boundary are INCLUDED (argpartition alone could
            drop a tied true neighbor; the final global window breaks
            ties on dst id exactly). Non-finite entries (the -inf masked
            diagonal) are dropped: when a row has fewer than k real
            candidates the k-th cosine is -inf and `cos >= kth` would
            otherwise emit the masked self edge as a bogus candidate."""
            kk = min(k, cos.shape[1])
            kth = -np.partition(-cos, kk - 1, axis=1)[:, kk - 1]
            rows, cols = np.where((cos >= kth[:, None]) & np.isfinite(cos))
            keep = ids_a[rows] != ids_b[cols]
            return pd.DataFrame({
                "src": ids_a[rows][keep], "dst": ids_b[cols][keep],
                "cosine": cos[rows, cols][keep],
            })

        both = pdf[pdf["_side"] == "B"]
        if len(both):
            ids, X, nrm = mats(both)
            cos = exact_int_matmul(X, X.T) / (nrm[:, None] * nrm[None, :])
            np.fill_diagonal(cos, -np.inf)  # no self edges
            return emit(ids, cos, ids)
        left = pdf[pdf["_side"] == "L"]
        right = pdf[pdf["_side"] == "R"]
        if not len(left) or not len(right):
            return pd.DataFrame({"src": [], "dst": [], "cosine": []})
        ids_l, X_l, n_l = mats(left)
        ids_r, X_r, n_r = mats(right)
        cos = exact_int_matmul(X_l, X_r.T) / (n_l[:, None] * n_r[None, :])
        return pd.concat([
            emit(ids_l, cos, ids_r),
            emit(ids_r, cos.T.copy(), ids_l),
        ])

    candidates = tagged.groupBy("_pid").applyInPandas(
        local_topk, schema=out_schema
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def rebalance_indegree(
    candidates: DataFrame,
    k: int,
    max_indegree: int | None = None,
) -> DataFrame:
    """Indegree-aware edge selection (reference A11: NeighborhoodGraph.h
    :486-594 counts fan-in and rewrites out-edges toward low-indegree
    targets so no node hubs the graph).

    `candidates` is a WIDER candidate list than the final degree — e.g.
    build_knn_graph(k=2k) — with (src, dst, cosine, rank). One stats
    pass measures each dst's indegree over the top-k prefix (what the
    naive graph would produce); each src then re-selects its k out-edges
    preferring, in rank order, candidates whose naive fan-in is within
    max_indegree (default 2x the average = 2k), topping up with the
    remaining best-ranked candidates when too few targets are cold.
    Quality is bounded: every chosen edge still comes from the src's own
    candidate list in rank order.

    Distributed shape: indegree = one agg over the top-k prefix; the
    re-selection is a per-src grouped numpy pass (applyInPandas).
    Returns (src, dst, cosine, rank) with rank 1..k per src.
    """
    if max_indegree is None:
        max_indegree = 2 * k
    naive = candidates.filter(F.col("rank") <= k)
    indeg = naive.groupBy("dst").agg(F.count(F.lit(1)).alias("_indeg"))
    enriched = candidates.join(indeg, "dst", "left").fillna(
        {"_indeg": 0}
    )

    out_schema = StructType([
        StructField("src", candidates.schema["src"].dataType),
        StructField("dst", candidates.schema["dst"].dataType),
        StructField("cosine", DoubleType()),
        StructField("rank", LongType()),
    ])
    cap = int(max_indegree)

    def reselect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["rank", "dst"], kind="mergesort")
        cold = pdf[pdf["_indeg"] <= cap]
        chosen = cold.head(k)
        if len(chosen) < k:
            rest = pdf[~pdf.index.isin(chosen.index)]
            chosen = pd.concat([chosen, rest.head(k - len(chosen))])
        chosen = chosen.sort_values(["cosine", "dst"],
                                    ascending=[False, True],
                                    kind="mergesort")
        return pd.DataFrame({
            "src": chosen["src"].to_numpy(),
            "dst": chosen["dst"].to_numpy(),
            "cosine": chosen["cosine"].to_numpy(),
            "rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
        })

    return enriched.groupBy("src").applyInPandas(reselect, schema=out_schema)


def rng_prune(
    graph: DataFrame,
    df: DataFrame,
    max_degree: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Relative-neighborhood pruning of a knn graph: walk each source's
    candidates in ascending distance (descending cosine); accept j unless
    some accepted l has cosine(l, j) > cosine(src, j) (l 'occludes' j).
    Returns (src, dst, cosine, rng_rank) with <= max_degree edges/src."""
    qv = _with_quantized(df, id_col, vec_col).select(
        F.col("_id").alias("dst"), F.col("_q").alias("_dq"),
        F.col("_norm").alias("_dnorm"),
    )
    enriched = graph.join(qv, "dst")

    out_schema = StructType([
        StructField("src", graph.schema["src"].dataType),
        StructField("dst", graph.schema["dst"].dataType),
        StructField("cosine", DoubleType()),
        StructField("rng_rank", LongType()),
    ])

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cosine", "dst"], ascending=[False, True])
        X = np.array(pdf["_dq"].tolist(), dtype=np.int64)
        nrm = np.sqrt(pdf["_dnorm"].to_numpy(dtype=np.float64))
        cos_qj = pdf["cosine"].to_numpy()
        accepted: list[int] = []
        for j in range(len(pdf)):
            if len(accepted) >= max_degree:
                break
            ok = True
            for l in accepted:
                cos_lj = float(X[l] @ X[j]) / (nrm[l] * nrm[j])
                if cos_lj > cos_qj[j]:
                    ok = False
                    break
            if ok:
                accepted.append(j)
        sel = pdf.iloc[accepted]
        return pd.DataFrame({
            "src": sel["src"].to_numpy(),
            "dst": sel["dst"].to_numpy(),
            "cosine": sel["cosine"].to_numpy(),
            "rng_rank": np.arange(1, len(sel) + 1, dtype=np.int64),
        })

    return enriched.groupBy("src").applyInPandas(prune, schema=out_schema)
