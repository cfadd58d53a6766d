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

    from sptag_spark.functions.text import with_text_stats
    from sptag_spark.operators.corpus import (
        contamination_report, pack_chunks, repetition_stats, weighted_mix,
    )
    from sptag_spark.operators.dedup import exact_dedup, jaccard_pairs_lsh
    from sptag_spark.operators.upsert import apply_deletes

    spark = SparkSession.builder.appName("prepare_corpus").getOrCreate()
    t0 = time.time()
    docs = spark.read.parquet(args.inp)
    counts = {"in": docs.count()}

    # 1. quality + repetition gates
    scored = with_text_stats(docs.select("doc_id", "text")) \
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
    docs = docs.join(keep_ids, "doc_id")
    counts["after_quality"] = docs.count()

    # 2. decontamination
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        contaminated = (
            contamination_report(docs, bench)
            .filter("is_contaminated = 1")
            .select("doc_id")
        )
        docs = apply_deletes(docs, contaminated, ["doc_id"])
        counts["after_decontaminate"] = docs.count()

    # 3. dedup (keep-first)
    if args.dedup == "exact":
        docs = exact_dedup(docs).filter("is_duplicate = 0") \
            .select("doc_id").join(docs, "doc_id")
    elif args.dedup == "jaccard_lsh":
        losers = jaccard_pairs_lsh(docs, threshold=args.threshold) \
            .select(F.col("id_b").alias("doc_id"))
        docs = apply_deletes(docs, losers, ["doc_id"])
    counts["after_dedup"] = docs.count()

    # 4. mixture weighting (identity when --mix is omitted)
    mix = _parse_mix(args.mix)
    if mix is not None:
        sources = [r["source"] for r in
                   docs.select("source").distinct().collect()]
        weights = {s: mix.get(s, args.default_weight) for s in sources}
        docs = weighted_mix(docs, weights)
    else:
        docs = docs.withColumn("copy_idx", F.lit(0).cast("long"))
    counts["after_mix"] = docs.count()

    docs.write.mode("overwrite").parquet(args.out + "/documents")

    # 5. pack what survived (per source; copies are distinct pack units)
    sized = docs.select(
        "doc_id", "source", "copy_idx",
        F.size(F.split(F.trim("text"), "\\s+")).cast("long")
        .alias("n_tokens"),
    ).withColumn(
        # doc_id * max_copies + copy_idx keeps the pack order unique and
        # deterministic when upsampling duplicates doc_ids
        "pack_id", F.col("doc_id") * 1000 + F.col("copy_idx"),
    )
    spans = pack_chunks(
        sized.drop("doc_id", "copy_idx"), capacity=args.capacity,
        id_col="pack_id",
    )
    spans.write.mode("overwrite").parquet(args.out + "/spans")
    counts["chunks"] = (
        spark.read.parquet(args.out + "/spans")
        .agg(F.countDistinct("source", "chunk_id")).collect()[0][0]
    )

    elapsed = time.time() - t0
    print(json.dumps({
        "job": "prepare_corpus",
        "elapsed_sec": round(elapsed, 3),
        **counts,
        "docs_per_sec": round(counts["in"] / elapsed, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
