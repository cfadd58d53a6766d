"""N -> 4N scaling evidence for the corpus-dedup path (the LLM-ops
counterpart of tools/scaling_bench.py's token-pipeline evidence).

Job: MinHash-LSH candidate generation + exact-Jaccard verify
(`jaccard_pairs_lsh`) over a deterministic synthetic text corpus, noop
sink. Same protocol as scaling_bench: identical input, fresh JVM per
run, in-JVM warmup, interleaved N/4N repeats, min-of-N capability
metric (this host stalls at random — see BENCH.md).

The corpus is written as 64 files and the sessions set
spark.sql.files.maxPartitionBytes/openCostInBytes so the SCAN stage
parallelizes: a synthetic few-MB corpus otherwise packs into 1-2 input
splits and the serial parquet decode Amdahl-caps every level (measured
eff 0.28 on a pure projection!) — a real multi-TB corpus has thousands
of files, so many-splits is the faithful single-box analog.

Usage: python tools/corpus_scaling.py [n_docs] [N] [repeats]
Prints one JSON line; BENCH.md section is maintained by hand.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _one_run(cores: int, corpus: str, warmup: bool) -> float:
    from sptag_spark.operators.dedup import jaccard_pairs_lsh
    from sptag_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(
        app_name=f"corpus_scaling_{cores}", cores=cores,
        shuffle_partitions=2 * cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 18))
    docs = spark.read.parquet(corpus)
    if warmup:
        jaccard_pairs_lsh(docs.limit(2000), threshold=0.5) \
            .write.format("noop").mode("overwrite").save()
    t0 = time.time()
    jaccard_pairs_lsh(docs, threshold=0.5) \
        .write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    stop_spark()
    return dt


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    small_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    big_n = 4 * small_n

    from tools.corpus_smoke import gen_corpus

    from sptag_spark.session import get_spark, stop_spark

    tmp = tempfile.mkdtemp(prefix="corpus_scaling_")
    corpus = os.path.join(tmp, "corpus")
    spark = get_spark(app_name="corpus_scaling_gen", cores=8,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    gen_corpus(spark, n_docs, corpus)
    # re-write as 64 files so the scan stage can parallelize at 4N
    df = spark.read.parquet(corpus)
    df.repartition(64).write.mode("overwrite").parquet(corpus + "_64")
    corpus = corpus + "_64"
    stop_spark()

    small_t, big_t = [], []
    for i in range(repeats):
        small_t.append(_one_run(small_n, corpus, warmup=(i == 0)))
        big_t.append(_one_run(big_n, corpus, warmup=(i == 0)))
    s_min, b_min = min(small_t), min(big_t)
    eff = (s_min / b_min) / (big_n / small_n)
    print(json.dumps({
        "metric": "corpus_dedup_scaling_Nto4N",
        "value": round(eff, 3),
        "unit": "fraction",
        "speedup": round(s_min / b_min, 2),
        "n_docs": n_docs,
        "small": {"cores": small_n, "times_sec":
                  [round(t, 2) for t in small_t], "min_sec": round(s_min, 2),
                  "median_sec": round(statistics.median(small_t), 2),
                  "docs_per_sec": round(n_docs / s_min, 1)},
        "big": {"cores": big_n, "times_sec":
                [round(t, 2) for t in big_t], "min_sec": round(b_min, 2),
                "median_sec": round(statistics.median(big_t), 2),
                "docs_per_sec": round(n_docs / b_min, 1)},
        "pass": eff >= 0.8,
    }))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
