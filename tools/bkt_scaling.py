"""N -> 4N scaling evidence for the multi-level BKT index build
(bkt.bkt_build — the round-5 Q5 operator): distributed root k-means +
per-level sampled cell fits + vectorized greedy descent + bucketed
posting write, end to end including the disk write (the build IS a
write job).

Protocol identical to tools/tpt_scaling.py: deterministic synthetic
clustered embeddings as 64 files; fresh JVM per run; per-run warmup on
a small corpus (every repeat — fresh JVMs would otherwise time worker
forks); INTERLEAVED N/4N repeats; min-of-N as the capability metric.

Usage: python tools/bkt_scaling.py [n_vecs] [N] [repeats]
Prints one JSON line; the BENCH.md section is maintained by hand.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
BRANCH = 8
LEAF_MAX = 2000


def _gen(spark, n: int, out: str) -> None:
    spec = importlib.util.spec_from_file_location(
        "ann_scaling", os.path.join(REPO, "tools", "ann_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.gen_embeddings(spark, n, out, salt="bkt")


def _one_run(cores: int, corpus: str, warm_corpus: str, scratch: str):
    from sptag_spark.operators.bkt import bkt_build
    from sptag_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(app_name=f"bkt_scaling_{cores}", cores=cores,
                      shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    warm_idx = os.path.join(scratch, "warm_idx")
    shutil.rmtree(warm_idx, ignore_errors=True)
    bkt_build(spark.read.parquet(warm_corpus), warm_idx,
              branch=4, leaf_max=256, cell_iters=4)
    idx = os.path.join(scratch, f"idx_{cores}")
    shutil.rmtree(idx, ignore_errors=True)
    emb = spark.read.parquet(corpus)
    t0 = time.time()
    bkt_build(emb, idx, branch=BRANCH, leaf_max=LEAF_MAX)
    dt = time.time() - t0
    stop_spark()
    shutil.rmtree(idx, ignore_errors=True)
    return dt


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    small_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    big_n = 4 * small_n

    from sptag_spark.session import get_spark, stop_spark

    tmp = tempfile.mkdtemp(prefix="bkt_scaling_")
    corpus = os.path.join(tmp, "emb")
    warm_corpus = os.path.join(tmp, "warm_emb")
    spark = get_spark(app_name="bkt_scaling_gen", cores=8,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    _gen(spark, n_vecs, corpus)
    _gen(spark, 20_000, warm_corpus)
    stop_spark()

    res = {c: [] for c in (small_n, big_n)}
    for _ in range(repeats):
        for c in (small_n, big_n):
            res[c].append(_one_run(c, corpus, warm_corpus, tmp))

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
    eff = round((s["build_min"] / b["build_min"]) / (big_n / small_n), 3)
    print(json.dumps({
        "metric": "bkt_build_scaling_Nto4N",
        "value": eff,
        "unit": "fraction",
        "n_vecs": n_vecs, "dim": DIM,
        "config": {"branch": BRANCH, "leaf_max": LEAF_MAX},
        "small": s, "big": b,
        "pass": eff >= 0.8,
    }))
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
