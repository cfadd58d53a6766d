"""Benchmark harness — the driver's per-round feedback loop.

Times every driver-contract query (``__spark_entry__.queries()``) plus the
end-to-end tokenized-corpus feature pipeline at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, and prints
exactly ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "sequences_per_sec": ..., "tokens_per_sec": ...}

Each query is materialized with a noop-format write so the whole plan
(including every output column) executes without driver-side collect
overhead — the Spark analog of the reference's QPS harness
(AnnService/inc/SSDServing/SSDIndex.h:61-97), which times search + result
write, not result printing.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> int:
    """Force full execution of every column; return row count."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    import __spark_entry__ as ent
    from sptag_spark.datagen import write_corpus
    from sptag_spark.pipeline import run_pipeline
    from sptag_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=cpus,
                      shuffle_partitions=2 * int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (codegen, shuffle, window) AND the Python/Arrow worker
    # pool with throwaway queries so the first timed query doesn't absorb
    # JIT + worker-fork costs (both are per-session, not per-query).
    from pyspark.sql import Window, functions as F
    warm = spark.range(100_000).withColumn(
        "r", F.row_number().over(Window.partitionBy(F.col("id") % 8)
                                 .orderBy("id")))
    materialize(warm)

    def _identity(batches):
        yield from batches
    materialize(
        spark.range(10_000).repartition(int(cpus))
        .mapInArrow(_identity, schema="id long")
    )
    import pandas as pd  # noqa: F401
    materialize(
        spark.range(4_000).withColumn("g", F.col("id") % 16)
        .groupBy("g").applyInPandas(lambda p: p, schema="id long, g long")
    )

    # Per-query timing = MIN over N interleaved warm repeats.
    # One un-timed warm pass first absorbs one-off costs that otherwise
    # land on whichever query executes a codepath first (md5/codegen JIT,
    # broadcast-thread spin-up — VERDICT r2 "ordering artifact").  Then
    # REPEATS full passes over the suite in round-robin order, so a host
    # stall (this machine freezes multi-second at random, CLAUDE.md rule
    # 7) lands on different queries in different passes and min-of-N
    # recovers the capability number; max-min spread is reported per
    # query so the artifact itself shows which timings hit a stall
    # (VERDICT r4 "What's wrong" #4).  A FRESH DataFrame is built per
    # run (fn() re-invoked), so shuffle map stages re-execute and every
    # repeat times the whole plan (CLAUDE.md rule 14).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    qfns = ent.queries()
    samples: dict[str, list[float]] = {name: [] for name in qfns}
    for name, fn in qfns.items():  # warm pass, untimed
        materialize(fn(spark, sf_dir))
    for _ in range(repeats):
        for name, fn in qfns.items():
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            samples[name].append(time.time() - t0)
    timings: dict[str, float] = {
        name: round(min(ts), 3) for name, ts in samples.items()
    }
    spread = {
        name: round(max(ts) - min(ts), 3) for name, ts in samples.items()
    }

    # End-to-end token pipeline: generate the north-rule corpus at a scale
    # proportional to the sf, then ingest -> featurize -> as-of serve.
    # Best of 3 repeats: this host stalls multi-second at random
    # (kcompactd/THP); the headline throughput should measure the engine,
    # not whichever repeat a host stall landed on (CLAUDE.md rule 7).
    with tempfile.TemporaryDirectory() as tmp:
        n_docs = max(2_000, int(200_000 * float(sf)))
        write_corpus(spark, tmp, n_docs=n_docs, n_probes=n_docs // 2, seed=42)
        best, metrics = None, None
        for _ in range(3):
            t0 = time.time()
            m = run_pipeline(
                spark,
                os.path.join(tmp, "sequences.parquet"),
                probes_path=os.path.join(tmp, "asof_probes.parquet"),
            )
            dt = time.time() - t0
            if best is None or dt < best:
                best, metrics = dt, m
        timings["token_pipeline"] = round(best, 3)

    # Build/probe attribution for the persisted-index queries — a
    # separate field, NOT added to the suite total (the queries dict
    # already times build+probe end-to-end). Runs after the main loop,
    # so every codepath is warm.
    subtimings = ent.bench_index_subtimings(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "feature_engineering_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "repeats": repeats,
        "subtimings": subtimings,
        "sf": sf,
        "cpus": int(cpus),
        "sequences_per_sec": round(metrics["sequences_per_sec"], 1),
        "tokens_per_sec": round(metrics["tokens_per_sec"], 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
