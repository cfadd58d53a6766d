"""N -> 4N scaling evidence for the END-TO-END prepare_corpus pipeline
(VERDICT r2 #6: dedup and the token pipeline have per-stage campaigns;
this one drives jobs/prepare_corpus.py — quality + repetition gates,
decontamination, MinHash-LSH dedup, mixture weighting, packing, real
parquet output writes — through the same measurement protocol).

Protocol (identical to tools/corpus_scaling.py / scaling_bench.py):
deterministic synthetic corpus (tools/corpus_smoke.gen_corpus) written
as 64 files so the scan parallelizes at 4N; fresh JVM per run; in-JVM
warmup on a small corpus the first iteration of each level; INTERLEAVED
N/4N repeats (host stalls land on both levels equally); min-of-N as the
capability metric.

Usage: python tools/prep_scaling.py [n_docs] [N] [repeats]
Prints one JSON line; the BENCH.md section is maintained by hand.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_job():
    spec = importlib.util.spec_from_file_location(
        "prepare_corpus_job", os.path.join(REPO, "jobs", "prepare_corpus.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_ARGS = ["--min-quality", "0.3", "--max-rep-ratio", "0.5",
         "--dedup", "jaccard_lsh", "--threshold", "0.5",
         "--mix", "src0=800,src3=2000", "--default-weight", "1000",
         "--capacity", "2048"]


def _one_run(cores: int, corpus: str, bench: str, warm_corpus: str,
             out_root: str, warmup: bool) -> float:
    from sptag_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(
        app_name=f"prep_scaling_{cores}", cores=cores,
        shuffle_partitions=2 * cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 18))
    pc = _load_job()
    if warmup:
        with contextlib.redirect_stdout(io.StringIO()):
            pc.main(["--in", warm_corpus, "--out", f"{out_root}/warm",
                     "--benchmark", bench, *_ARGS])
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        pc.main(["--in", corpus, "--out", f"{out_root}/c{cores}",
                 "--benchmark", bench, *_ARGS])
    dt = time.time() - t0
    stop_spark()
    return dt


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    small_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    big_n = 4 * small_n

    from tools.corpus_smoke import gen_corpus

    from sptag_spark.session import get_spark, stop_spark

    tmp = tempfile.mkdtemp(prefix="prep_scaling_")
    corpus = os.path.join(tmp, "corpus")
    warm_corpus = os.path.join(tmp, "warm_corpus")
    bench = os.path.join(tmp, "bench")
    out_root = os.path.join(tmp, "out")
    spark = get_spark(app_name="prep_scaling_gen", cores=8,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    gen_corpus(spark, n_docs, corpus + "_raw")
    df = spark.read.parquet(corpus + "_raw")
    df.repartition(64).write.mode("overwrite").parquet(corpus)
    df.filter("doc_id % 1000 = 7").write.mode("overwrite").parquet(bench)
    gen_corpus(spark, 5_000, warm_corpus)
    stop_spark()

    small_t, big_t = [], []
    for i in range(repeats):
        small_t.append(_one_run(small_n, corpus, bench, warm_corpus,
                                out_root, warmup=(i == 0)))
        big_t.append(_one_run(big_n, corpus, bench, warm_corpus,
                              out_root, warmup=(i == 0)))
    s_min, b_min = min(small_t), min(big_t)
    eff = (s_min / b_min) / (big_n / small_n)
    print(json.dumps({
        "metric": "prepare_corpus_scaling_Nto4N",
        "value": round(eff, 3),
        "unit": "fraction",
        "speedup": round(s_min / b_min, 2),
        "n_docs": n_docs,
        "small": {"cores": small_n,
                  "times_sec": [round(t, 2) for t in small_t],
                  "min_sec": round(s_min, 2),
                  "median_sec": round(statistics.median(small_t), 2),
                  "docs_per_sec": round(n_docs / s_min, 1)},
        "big": {"cores": big_n,
                "times_sec": [round(t, 2) for t in big_t],
                "min_sec": round(b_min, 2),
                "median_sec": round(statistics.median(big_t), 2),
                "docs_per_sec": round(n_docs / b_min, 1)},
        "pass": eff >= 0.8,
    }))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
