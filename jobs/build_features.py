"""spark-submit entry point: resumable feature-build job.

    spark-submit --py-files sptag_spark.zip jobs/build_features.py \
        --sequences /data/sequences.parquet --out /data/features \
        --buckets 64 [--key doc_id]

Reads the tokenized corpus, computes per-row Arrow token features plus
per-doc windowed features (lag / rolling / backfill-ready columns), and
writes bucket-partitioned parquet with a per-bucket lineage manifest
(bucket id, row count, min/max ts, order-insensitive digest). Rerunning
the same command resumes: completed buckets are skipped via the manifest
(reference checkpoint/recovery, SPANN/Index.h:256-281; batch resume,
ExtraStaticSearcher.h:35-66).

Emits one JSON metrics line on stdout (the reference harness's QPS report
shape, SSDIndex.h:61-97).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sequences", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--fail-after", type=int, default=None,
                    help="inject a crash after N buckets (resume testing)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from sptag_spark.pipeline import featurize
    from sptag_spark.sources.manifest import run_resumable

    # Under spark-submit the master/conf come from the launcher; the
    # builder only fills gaps when run directly (dev convenience).
    spark = SparkSession.builder.appName("build_features").getOrCreate()
    t0 = time.time()
    stats = run_resumable(
        spark,
        source=lambda s: s.read.parquet(args.sequences),
        process=featurize,
        out_dir=args.out,
        key=args.key,
        n_buckets=args.buckets,
        ts_col=args.ts_col,
        fail_after=args.fail_after,
    )
    elapsed = time.time() - t0
    print(json.dumps({
        "job": "build_features",
        "elapsed_sec": round(elapsed, 3),
        "rows": stats["rows"],
        "rows_per_sec": round(stats["rows"] / elapsed, 1),
        "buckets_done": stats["buckets_done"],
        "digest": stats["digest"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
