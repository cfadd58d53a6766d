"""Large-run smoke for the corpus-preparation pipeline.

Synthesizes a deterministic N-doc text corpus (hash-drawn words over a
small vocabulary, zipf-ish source mix, ~1 in 500 docs duplicated as a
near-dup to give dedup real work), a benchmark slice, then drives
jobs/prepare_corpus.py THROUGH THE REAL spark-submit BINARY at
local[$SPARK_GRAFT_CPUS] and prints the job's metrics line plus
docs/sec. Evidence for BENCH.md.

Usage: python tools/corpus_smoke.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = ("key agg row scan slow fast table value part hash merge batch "
         "spark line sort window join shuffle plan codegen filter group "
         "the a of and to in is cache skew salt probe build").split()


def gen_corpus(spark, n_docs: int, out: str) -> None:
    from pyspark.sql import functions as F

    # ~30k-word synthetic vocabulary (w0..w29999) with every ~6th word a
    # real stopword: big enough that 3-gram collisions between unrelated
    # docs are rare (tiny vocabs make chance shingle overlap flag the
    # whole corpus as benchmark-contaminated), small enough to exercise
    # the stop-shingle df-cap.
    stop = F.array(*[F.lit(w) for w in WORDS[-8:]])
    rng = spark.range(0, n_docs, 1, spark.sparkContext.defaultParallelism)
    h = lambda *c: F.abs(F.xxhash64(*c))  # noqa: E731
    n_words = (h(F.col("id"), F.lit("len")) % 90 + 12).cast("int")
    # ~1 in 500 docs is a copy of its neighbor (a real near-dup)
    base = F.when(F.col("id") % 500 == 1, F.col("id") - 1) \
        .otherwise(F.col("id"))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: F.when(
                h(base, i, F.lit("s")) % 6 == 0,
                F.element_at(stop, (h(base, i, F.lit("sw")) % 8 + 1)
                             .cast("int")),
            ).otherwise(
                F.concat(F.lit("w"), (h(base, i, F.lit("w")) % 30000)
                         .cast("string"))
            ),
        ), " ",
    )
    src = h(F.col("id"), F.lit("src")) % 100
    source = (
        F.when(src < 70, "src0").when(src < 85, "src1")
        .when(src < 95, "src2").otherwise("src3")
    )
    rng.select(
        F.col("id").alias("doc_id"), text.alias("text"),
        F.lit("en").alias("lang"), source.alias("source"),
        F.length(text).alias("n_chars"),
    ).write.mode("overwrite").parquet(out)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else \
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    tmp = tempfile.mkdtemp(prefix="corpus_smoke_")
    corpus = os.path.join(tmp, "corpus")
    bench = os.path.join(tmp, "bench")
    out = os.path.join(tmp, "prepared")

    from sptag_spark.session import get_spark

    spark = get_spark(app_name="corpus_smoke_gen", cores=cpus,
                      shuffle_partitions=2 * int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    gen_corpus(spark, n_docs, corpus)
    spark.read.parquet(corpus).filter("doc_id % 1000 = 7") \
        .write.mode("overwrite").parquet(bench)
    spark.stop()

    zpath = os.path.join(tmp, "sptag_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sptag_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    import pyspark
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                          "spark-submit")
    t0 = time.time()
    proc = subprocess.run(
        [submit, "--master", f"local[{cpus}]",
         "--conf", f"spark.sql.shuffle.partitions={2 * int(cpus)}",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--conf", "spark.driver.memory=16g",
         "--py-files", zpath,
         os.path.join(REPO, "jobs", "prepare_corpus.py"),
         "--in", corpus, "--out", out, "--benchmark", bench,
         "--min-quality", "0.3", "--max-rep-ratio", "0.5",
         "--dedup", "jaccard_lsh", "--threshold", "0.5",
         "--mix", "src0=800,src3=2000", "--default-weight", "1000",
         "--capacity", "2048"],
        capture_output=True, text=True, timeout=3600,
        env=dict(os.environ, PYSPARK_PYTHON=sys.executable,
                 PYSPARK_DRIVER_PYTHON=sys.executable),
    )
    wall = time.time() - t0
    json_lines = [ln for ln in proc.stdout.splitlines()
                  if ln.startswith("{")]
    if proc.returncode != 0 or not json_lines:
        print(proc.stdout[-2000:])
        print(proc.stderr[-4000:])
        print(f"(smoke artifacts kept for debugging: {tmp})")
        return 1
    m = json.loads(json_lines[-1])
    m["spark_submit_wall_sec"] = round(wall, 1)
    m["n_docs"] = n_docs
    m["cpus"] = int(cpus)
    print(json.dumps(m))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)  # GBs of parquet per run
    return 0


if __name__ == "__main__":
    sys.exit(main())
