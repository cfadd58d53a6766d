"""N -> 4N scaling evidence for the RefineGraph pass (VERDICT r5 next
#1's remaining leg: the refinement rounds must parallelize like the TPT
build they follow).

Protocol (identical to tools/tpt_scaling.py): deterministic synthetic
clustered embeddings in 64 files; a TPT init graph is built ONCE per
cores-level run (untimed — tpt_scaling.py owns that campaign) and
written to parquet; the TIMED region is refine_knn_graph(iters) read
from that parquet, materialized via the eager per-iteration
localCheckpoint plus a parquet write of the final edges. Fresh JVM per
run, small warm refine first (worker forks + codegen outside the timed
region), INTERLEAVED N/4N repeats, min-of-N.

Per-iteration work is one bounded ids-only self-join (out-degree
exactly k, 2k with reversals) + two vector joins + one Arrow dot kernel
+ one per-src top-k window — all O(N*k^2) rows, nothing wider than one
src's candidate list, so the pass should scale like the leaf kernel.

Usage: python tools/refine_scaling.py [n_vecs] [N] [repeats] [iters]
Prints one JSON line; the BENCH.md section is maintained by hand.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
TREES = 3
LEAF_SIZE = 2000
K = 8


def _gen(spark, n: int, out: str) -> None:
    spec = importlib.util.spec_from_file_location(
        "ann_scaling", os.path.join(REPO, "tools", "ann_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.gen_embeddings(spark, n, out, salt="rfn")


def _one_run(cores: int, corpus: str, init_graph: str, warm_corpus: str,
             warm_graph: str, out: str, iters: int):
    from sptag_spark.operators.graph import refine_knn_graph
    from sptag_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(app_name=f"refine_scaling_{cores}", cores=cores,
                      shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    refine_knn_graph(spark.read.parquet(warm_graph),
                     spark.read.parquet(warm_corpus), k=K, iters=1) \
        .write.format("noop").mode("overwrite").save()
    emb = spark.read.parquet(corpus)
    g0 = spark.read.parquet(init_graph)
    t0 = time.time()
    refine_knn_graph(g0, emb, k=K, iters=iters) \
        .write.mode("overwrite").parquet(out)
    dt = time.time() - t0
    stop_spark()
    return dt


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    small_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    big_n = 4 * small_n

    from sptag_spark.operators.graph import build_knn_graph_tpt
    from sptag_spark.session import get_spark, stop_spark

    tmp = tempfile.mkdtemp(prefix="refine_scaling_")
    corpus = os.path.join(tmp, "emb")
    warm_corpus = os.path.join(tmp, "warm_emb")
    init_graph = os.path.join(tmp, "g0")
    warm_graph = os.path.join(tmp, "g0_warm")
    spark = get_spark(app_name="refine_scaling_gen", cores=8,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    _gen(spark, n_vecs, corpus)
    _gen(spark, 20_000, warm_corpus)
    build_knn_graph_tpt(spark.read.parquet(corpus), k=K, trees=TREES,
                        leaf_size=LEAF_SIZE) \
        .write.mode("overwrite").parquet(init_graph)
    build_knn_graph_tpt(spark.read.parquet(warm_corpus), k=K, trees=2,
                        leaf_size=200) \
        .write.mode("overwrite").parquet(warm_graph)
    stop_spark()

    res = {c: [] for c in (small_n, big_n)}
    for i in range(repeats):
        for c in (small_n, big_n):
            res[c].append(_one_run(
                c, corpus, init_graph, warm_corpus, warm_graph,
                os.path.join(tmp, f"out_c{c}"), iters))

    def level(c):
        t = res[c]
        return {
            "cores": c,
            "refine_sec": [round(x, 2) for x in t],
            "refine_min": round(min(t), 2),
            "refine_median": round(statistics.median(t), 2),
            "vecs_per_sec": round(n_vecs / min(t), 1),
        }

    s, b = level(small_n), level(big_n)
    ratio = big_n / small_n
    eff = round((s["refine_min"] / b["refine_min"]) / ratio, 3)
    out = {
        "metric": "refine_graph_scaling_Nto4N",
        "value": eff,
        "unit": "fraction",
        "n_vecs": n_vecs, "dim": DIM,
        "config": {"trees": TREES, "leaf_size": LEAF_SIZE, "k": K,
                   "iters": iters},
        "small": s, "big": b,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
