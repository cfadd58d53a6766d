"""spark-submit entry point: corpus deduplication (training-data hygiene).

    spark-submit --py-files sptag_spark.zip jobs/dedup_corpus.py \
        --in /data/documents.parquet --out /data/documents_dedup \
        [--method exact|jaccard_lsh|simhash] [--threshold 0.5] \
        [--max-hamming 3]

Keep-first policy throughout (the reference's exceptIDS anti-set,
VectorIndex.cpp:1169-1172): for `exact`, the minimum doc_id per content
fingerprint survives; for the near-dup methods, every doc that appears
as the LOSING side (id_b, the larger id) of a detected pair is dropped.
`jaccard_lsh` is the 100-TB path — MinHash-LSH banded candidates
verified with exact Jaccard, never a raw shingle self-join. Emits one
JSON metrics line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--method", default="jaccard_lsh",
                    choices=["exact", "jaccard_lsh", "simhash"])
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--max-hamming", type=int, default=3)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sptag_spark.operators.dedup import (
        exact_dedup, jaccard_pairs_lsh, simhash_pairs,
    )
    from sptag_spark.operators.upsert import apply_deletes

    spark = SparkSession.builder.appName("dedup_corpus").getOrCreate()
    t0 = time.time()
    docs = spark.read.parquet(args.inp)
    n_in = docs.count()
    if args.method == "exact":
        kept = exact_dedup(docs).filter("is_duplicate = 0") \
            .select("doc_id").join(docs, "doc_id")
    else:
        if args.method == "jaccard_lsh":
            pairs = jaccard_pairs_lsh(docs, threshold=args.threshold)
        else:
            pairs = simhash_pairs(docs, max_hamming=args.max_hamming)
        losers = pairs.select(F.col("id_b").alias("doc_id"))
        kept = apply_deletes(docs, losers, ["doc_id"])
    kept.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    elapsed = time.time() - t0
    print(json.dumps({
        "job": "dedup_corpus",
        "method": args.method,
        "elapsed_sec": round(elapsed, 3),
        "docs_in": n_in,
        "docs_kept": n_out,
        "docs_dropped": n_in - n_out,
        "docs_per_sec": round(n_in / elapsed, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
