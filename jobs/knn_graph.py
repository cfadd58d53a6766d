"""spark-submit entry point: kNN-graph construction + graph-walk search
(the reference's neighborhood-graph pipeline as cluster jobs).

Build (default):

    spark-submit --py-files sptag_spark.zip jobs/knn_graph.py \
        --in /data/embeddings.parquet --out /data/knn_graph \
        [--k 8] [--trees 3] [--leaf-size 1000] [--seed 42] \
        [--refine-iters 2] [--max-degree 0] [--method tpt|exact]

Mirrors the reference's full graph build (NeighborhoodGraph.h:444-465):
BuildInitKNNGraph — per-leaf all-pairs over `trees` random-projection
trees with mean splits (build_knn_graph_tpt, the 100-TB path) —
followed by `--refine-iters` rounds of RefineGraph (neighbor-of-
neighbor expansion + exact re-rank, default 2 = m_iRefineIter), then an
optional Relative-Neighborhood prune when --max-degree > 0
(RelativeNeighborhoodGraph.h:18-35). `--method exact` runs the blocked
O(N^2) oracle twin instead of the TPT build (small corpora /
truth-set generation).

Search (--queries given): beam search over an EXISTING graph parquet
(the reference's in-memory query path, BKTIndex.cpp SearchIndex):

    ... jobs/knn_graph.py --in /data/embeddings.parquet \
        --graph /data/knn_graph --queries /data/q.parquet \
        --out /data/results [--k 10] [--beam 8] [--rounds 4] \
        [--n-seeds 8]

Emits one JSON metrics line on stdout.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--trees", type=int, default=3)
    ap.add_argument("--leaf-size", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--refine-iters", type=int, default=2)
    ap.add_argument("--max-degree", type=int, default=0,
                    help="RNG-prune each adjacency list to this degree "
                         "after refinement (0 = no prune)")
    ap.add_argument("--score-unordered", action="store_true",
                    help="score each unordered candidate pair once and "
                         "mirror (valid with reverse edges; values "
                         "identical): halves the wide vector exchange "
                         "— use when the refine shuffle spills")
    ap.add_argument("--forward-only", action="store_true",
                    help="refine without reverse edges: exactly N*k^2 "
                         "candidate pairs per iteration (~5x less "
                         "shuffle at ~-0.04 recall on the contract "
                         "corpus)")
    ap.add_argument("--max-indegree", type=int, default=0,
                    help="rebalance edges toward targets whose naive "
                         "fan-in is within this bound (reference A11; "
                         "0 = off). Applied before refinement, on a "
                         "2k-wide candidate list.")
    ap.add_argument("--method", default="tpt", choices=["tpt", "exact"])
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--queries", default=None,
                    help="switch to SEARCH mode: beam-search these "
                         "query vectors over --graph")
    ap.add_argument("--graph", default=None,
                    help="search mode: existing graph parquet")
    ap.add_argument("--beam", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n-seeds", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from sptag_spark.operators.graph import (
        build_knn_graph,
        build_knn_graph_tpt,
        graph_beam_search,
        rebalance_indegree,
        refine_knn_graph,
        rng_prune,
    )

    spark = SparkSession.builder.appName("knn_graph") \
        .config("spark.sql.execution.arrow.pyspark.enabled", "true") \
        .getOrCreate()
    t0 = time.time()
    df = spark.read.parquet(args.inp)
    if args.queries is not None:
        if args.graph is None:
            print(json.dumps({"error": "--queries (search mode) "
                              "requires --graph (an existing graph "
                              "parquet built by this job)"}))
            spark.stop()
            return 2
        g = spark.read.parquet(args.graph)
        qs = spark.read.parquet(args.queries)
        res = graph_beam_search(
            g, df, qs, k=args.k, beam=args.beam, rounds=args.rounds,
            n_seeds=args.n_seeds, id_col=args.id_col,
            vec_col=args.vec_col)
        res.write.mode("overwrite").parquet(args.out)
        out = spark.read.parquet(args.out)
        print(json.dumps({
            "job": "knn_graph_search",
            "results": out.count(),
            "queries": out.select("query_id").distinct().count(),
            "k": args.k, "beam": args.beam, "rounds": args.rounds,
            "elapsed_sec": round(time.time() - t0, 3),
        }))
        spark.stop()
        return 0
    # indegree rebalance selects k edges from a 2k-wide candidate list
    build_k = 2 * args.k if args.max_indegree > 0 else args.k
    if args.method == "exact":
        g = build_knn_graph(df, k=build_k, id_col=args.id_col,
                            vec_col=args.vec_col)
    else:
        g = build_knn_graph_tpt(df, k=build_k, trees=args.trees,
                                leaf_size=args.leaf_size,
                                id_col=args.id_col,
                                vec_col=args.vec_col, seed=args.seed)
    if args.max_indegree > 0:
        g = rebalance_indegree(g, args.k,
                               max_indegree=args.max_indegree)
    if args.refine_iters > 0:
        g = refine_knn_graph(g, df, k=args.k, iters=args.refine_iters,
                             id_col=args.id_col, vec_col=args.vec_col,
                             include_reverse=not args.forward_only,
                             score_unordered=args.score_unordered)
    if args.max_degree > 0:
        g = rng_prune(g, df, max_degree=args.max_degree,
                      id_col=args.id_col, vec_col=args.vec_col)
    g.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    metrics = {
        "job": "knn_graph",
        "method": args.method,
        "nodes": out.select("src").distinct().count(),
        "edges": out.count(),
        "k": args.k,
        "refine_iters": args.refine_iters,
        "max_degree": args.max_degree,
        "forward_only": bool(args.forward_only),
        "max_indegree": args.max_indegree,
        "elapsed_sec": round(time.time() - t0, 3),
    }
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
