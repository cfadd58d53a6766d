"""spark-submit entry point: the full training-data preparation pipeline.

    spark-submit --py-files sptag_spark.zip jobs/prepare_corpus.py \
        --in /data/documents.parquet --out /data/prepared \
        [--benchmark /data/eval_docs.parquet] \
        [--min-quality 0.5] [--max-rep-ratio 0.2] \
        [--dedup exact|jaccard_lsh|none] [--threshold 0.5] \
        [--mix src0=1000,src1=500] [--capacity 2048]

One job chaining every corpus-preparation stage this engine ships, in
the order a production LLM data pipeline runs them:

  1. quality filter   — composite score + repetition (Gopher) gates
  2. decontaminate    — drop docs sharing any 3-gram with the benchmark
  3. dedup            — keep-first exact or MinHash-LSH + exact verify
  4. mixture weight   — per-source per-mille rates (up/downsampling)
  5. pack             — concat-and-chunk doc→chunk spans at --capacity

Each stage is the same operator the contract queries verify against
DuckDB; this job is plumbing, not new semantics. Output: `documents/`
(the surviving mixed corpus incl. copy_idx) and `spans/` (the packing
table). Emits one JSON metrics line with per-stage survivor counts.

Reference analog: the BuildIndex ETL chain (IndexBuilder/main.cpp:
1-150) — scan, transform, filter, partition, write, with stage stats.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_mix(s: str | None) -> dict[str, int] | None:
    if not s:
        return None
    out = {}
    for part in s.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--benchmark", default=None,
                    help="parquet of eval docs to decontaminate against")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--max-rep-ratio", type=float, default=0.5)
    ap.add_argument("--dedup", default="jaccard_lsh",
                    choices=["exact", "jaccard_lsh", "none"])
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--mix", default=None,
                    help="per-source per-mille weights, e.g. src0=1500,src1=500")
    ap.add_argument("--default-weight", type=int, default=1000)
    ap.add_argument("--capacity", type=int, default=2048)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sptag_spark.functions.text import with_text_stats_arrow
    from sptag_spark.operators.corpus import (
        contamination_report, pack_chunks, repetition_stats, weighted_mix,
    )
    from sptag_spark.operators.dedup import exact_dedup, jaccard_pairs_lsh
    from sptag_spark.operators.upsert import apply_deletes

    spark = SparkSession.builder.appName("prepare_corpus").getOrCreate()
    t0 = time.time()
    docs = spark.read.parquet(args.inp)
    counts = {"in": docs.count()}
    # Each stage ends in persist() + count(): the count is the stage
    # metric AND materializes the stage once — without it every later
    # action (next stage, write, packing) would re-run the whole
    # upstream pipeline from the raw scan.
    cached = []
    stage_sec = {}
    last = [time.time()]

    def _stage(df, name):
        df = df.persist()
        cached.append(df)
        counts[name] = df.count()
        stage_sec[name] = round(time.time() - last[0], 2)
        last[0] = time.time()
        return df

    # 1. quality + repetition gates
    scored = with_text_stats_arrow(docs.select("doc_id", "text")) \
        .select("doc_id", "quality_score")
    rep = repetition_stats(docs).select("doc_id", "rep_ratio")
    keep_ids = (
        scored.join(rep, "doc_id")
        .filter(
            (F.col("quality_score") >= args.min_quality)
            & (F.col("rep_ratio") <= args.max_rep_ratio)
        )
        .select("doc_id")
    )
    docs = _stage(docs.join(keep_ids, "doc_id"), "after_quality")

    # 2. decontamination
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        contaminated = (
            contamination_report(docs, bench)
            .filter("is_contaminated = 1")
            .select("doc_id")
        )
        docs = _stage(apply_deletes(docs, contaminated, ["doc_id"]),
                      "after_decontaminate")

    # 3. dedup (keep-first)
    if args.dedup == "exact":
        kept = exact_dedup(docs).filter("is_duplicate = 0") \
            .select("doc_id").join(docs, "doc_id")
    elif args.dedup == "jaccard_lsh":
        losers = jaccard_pairs_lsh(docs, threshold=args.threshold) \
            .select(F.col("id_b").alias("doc_id"))
        kept = apply_deletes(docs, losers, ["doc_id"])
    else:
        kept = docs
    docs = _stage(kept, "after_dedup")

    # 4. mixture weighting (identity when --mix is omitted); sources not
    # named in --mix get --default-weight (no driver-side source scan)
    mix = _parse_mix(args.mix)
    if mix is not None:
        docs = weighted_mix(docs, mix, default_weight=args.default_weight)
        max_w = max([*mix.values(), args.default_weight])
    else:
        docs = docs.withColumn("copy_idx", F.lit(0).cast("long"))
        max_w = 1000

    docs.write.mode("overwrite").parquet(args.out + "/documents")
    for c in cached:
        c.unpersist()
    docs = spark.read.parquet(args.out + "/documents")
    counts["after_mix"] = docs.count()
    stage_sec["mix_write"] = round(time.time() - last[0], 2)
    last[0] = time.time()

    # 5. pack what survived (per source; copies are distinct pack units).
    # pack_id is collision-free for any weight: the copy stride covers
    # the largest possible copy_idx. Pack order is a hash interleave so
    # upsampled copies of a doc land in different chunks, not adjacent
    # slots of the same training context.
    stride = max_w // 1000 + 2
    sized = docs.select(
        "doc_id", "source", "copy_idx",
        F.size(F.split(F.trim("text"), "\\s+")).cast("long")
        .alias("n_tokens"),
    ).withColumn(
        "pack_id", F.col("doc_id") * stride + F.col("copy_idx"),
    ).withColumn("pack_order", F.xxhash64("pack_id"))
    spans = pack_chunks(
        sized.drop("doc_id", "copy_idx"), capacity=args.capacity,
        id_col="pack_id", order_col="pack_order",
    )
    spans.write.mode("overwrite").parquet(args.out + "/spans")
    counts["chunks"] = (
        spark.read.parquet(args.out + "/spans")
        .agg(F.countDistinct("source", "chunk_id")).collect()[0][0]
    )

    stage_sec["pack_write"] = round(time.time() - last[0], 2)
    elapsed = time.time() - t0
    print(json.dumps({
        "job": "prepare_corpus",
        "elapsed_sec": round(elapsed, 3),
        **counts,
        "stage_sec": stage_sec,
        "docs_per_sec": round(counts["in"] / elapsed, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
