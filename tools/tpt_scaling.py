"""N -> 4N scaling evidence for the TPT approximate kNN-graph build
(VERDICT r4 #1: the campaign that shows build_knn_graph_tpt's
O(N * leaf * trees) design actually parallelizes — the exact
build_knn_graph baseline is O(N^2) compute and cannot run at this N).

Protocol (identical to tools/ann_scaling.py): deterministic synthetic
clustered embeddings written as 64 files so the scan parallelizes at
4N; fresh JVM per run; in-JVM warmup on a small corpus the first
iteration of each level; INTERLEAVED N/4N repeats (host stalls land on
both levels equally); min-of-N as the capability metric. The graph is
materialized with a noop write (CLAUDE.md rule 11 — count() would
column-prune the kernel away).

Usage: python tools/tpt_scaling.py [n_vecs] [N] [repeats]
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
# the reference's TPT leaf default (NeighborhoodGraph.h:39
# m_iTPTLeafSize = 2000): the leaf all-pairs kernel is the phase that
# scales near-ideally (0.94 N->4N measured), so the reference's own
# config point is also the right one to evidence scaling at
LEAF_SIZE = 2000
K = 8


def _gen(spark, n: int, out: str) -> None:
    spec = importlib.util.spec_from_file_location(
        "ann_scaling", os.path.join(REPO, "tools", "ann_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.gen_embeddings(spark, n, out, salt="tpt")


def _one_run(cores: int, corpus: str, warm_corpus: str, warmup: bool):
    from sptag_spark.operators.graph import build_knn_graph_tpt
    from sptag_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(app_name=f"tpt_scaling_{cores}", cores=cores,
                      shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    if warmup:
        build_knn_graph_tpt(
            spark.read.parquet(warm_corpus), k=K, trees=TREES,
            leaf_size=LEAF_SIZE,
        ).write.format("noop").mode("overwrite").save()
    emb = spark.read.parquet(corpus)
    t0 = time.time()
    build_knn_graph_tpt(
        emb, k=K, trees=TREES, leaf_size=LEAF_SIZE,
    ).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    stop_spark()
    return dt


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    small_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    big_n = 4 * small_n

    from sptag_spark.session import get_spark, stop_spark

    tmp = tempfile.mkdtemp(prefix="tpt_scaling_")
    corpus = os.path.join(tmp, "emb")
    warm_corpus = os.path.join(tmp, "warm_emb")
    spark = get_spark(app_name="tpt_scaling_gen", cores=8,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    _gen(spark, n_vecs, corpus)
    _gen(spark, 20_000, warm_corpus)
    stop_spark()

    res = {c: [] for c in (small_n, big_n)}
    for i in range(repeats):
        for c in (small_n, big_n):
            # warm EVERY run: each _one_run is a fresh JVM, so an
            # unwarmed repeat times Python-worker forks + codegen, not
            # the build (the warmup corpus is 2% of the campaign's)
            res[c].append(_one_run(c, corpus, warm_corpus, warmup=True))

    def level(c):
        t = res[c]
        return {
            "cores": c,
            "build_sec": [round(x, 2) for x in t],
            "build_min": round(min(t), 2),
            "build_median": round(statistics.median(t), 2),
            "vecs_per_sec_build": round(n_vecs / min(t), 1),
        }

    s, b = level(small_n), level(big_n)
    ratio = big_n / small_n
    eff = round((s["build_min"] / b["build_min"]) / ratio, 3)
    out = {
        "metric": "tpt_graph_scaling_Nto4N",
        "value": eff,
        "unit": "fraction",
        "n_vecs": n_vecs, "dim": DIM,
        "config": {"trees": TREES, "leaf_size": LEAF_SIZE, "k": K},
        "small": s, "big": b,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
