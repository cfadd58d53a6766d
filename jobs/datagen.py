"""spark-submit entry point: deterministic corpus generation.

    spark-submit --py-files sptag_spark.zip jobs/datagen.py \
        --out /data/corpus --docs 1000000 [--probes 500000] [--seed 42]

Fully distributed (spark.range + column expressions; no driver data), so
the 10^12-row corpus is the same command with a bigger --docs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--probes", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from sptag_spark.datagen import write_corpus

    spark = SparkSession.builder.appName("datagen").getOrCreate()
    t0 = time.time()
    write_corpus(spark, args.out, n_docs=args.docs, n_probes=args.probes,
                 seed=args.seed, partitions=args.partitions)
    n = spark.read.parquet(f"{args.out}/sequences.parquet").count()
    print(json.dumps({
        "job": "datagen",
        "elapsed_sec": round(time.time() - t0, 3),
        "sequences": n,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
