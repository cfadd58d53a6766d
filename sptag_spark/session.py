"""SparkSession factory with scale-appropriate defaults.

Defaults mirror what we'd set on a 1000-executor cluster reading 100 TB,
translated to local[N] for tests: AQE on (runtime coalesce + skew-join
split — the Spark analog of SPTAG's posting split/merge maintenance,
cf. reference ExtraDynamicSearcher.h:637-1146), Arrow enabled for every
pandas/Arrow UDF path, UTC session timezone so parquet timestamps compare
bit-for-bit with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One place to change scale knobs. At 100 TB these become cluster-level
# settings (spark.sql.shuffle.partitions sized ~2-3x total cores, 128 MB
# target partition bytes); locally we keep them small so tests are fast.
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch sizing is a throughput cliff in both directions: measured
    # on the token kernel, 4096-row batches (~1M tokens, ~25 MB of numpy
    # temporaries — cache-resident) run 2x faster than 64k-row batches
    # (~550 MB churn per batch -> allocator/THP pressure) and scale 2->8
    # cores at ~0.94 efficiency net of fixed costs. Keep batches small
    # enough that a batch's working set stays near L3.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.shuffle.partitions": "32",
}


def get_spark(
    app_name: str = "sptag_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: int N -> local[N]; "*" -> local[*]; None -> $SPARK_GRAFT_CPUS or *.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cores}]")
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
