"""Snapshot-versioned tables: Iceberg-style append/time-travel on plain
parquet (the documented fallback when no Iceberg catalog exists — same
interface, swap the implementation for `spark.table` + `VERSION AS OF`
when a catalog is available).

Layout:
    <root>/snap-000001/...parquet      immutable data of snapshot 1
    <root>/snap-000002/...parquet      rows APPENDED by snapshot 2
    <root>/_snapshots.json             ordered snapshot log with stats

A snapshot is the union of all appends up to and including it — exactly
the reference's incremental Dataset (base block + append-only incBlocks,
Dataset.h:225-461) and its persisted checkpoint (SPANN/Index.h:256-281).
read(version=N) gives bit-stable time travel; resume-from-snapshot =
start processing at the first snapshot id you haven't recorded.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from sptag_spark.sources.manifest import digest_frame

_LOG = "_snapshots.json"


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- log ---------------------------------------------------------------
    def _log_path(self) -> str:
        return os.path.join(self.root, _LOG)

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log_path()):
            return []
        with open(self._log_path()) as f:
            return json.load(f)

    def current_version(self) -> int:
        snaps = self.snapshots()
        return snaps[-1]["version"] if snaps else 0

    # -- write -------------------------------------------------------------
    def append(self, df: DataFrame, ts_col: str | None = None) -> dict:
        """Write one immutable snapshot directory + a log entry (rows,
        digest, min/max ts). The log write is atomic (tmp + replace)."""
        version = self.current_version() + 1
        path = os.path.join(self.root, f"snap-{version:06d}")
        df.write.mode("errorifexists").parquet(path)
        spark = df.sparkSession
        stats = digest_frame(spark.read.parquet(path), ts_col=ts_col)
        entry = {
            "version": version,
            "path": path,
            "committed_at": time.time(),
            **stats,
        }
        snaps = self.snapshots() + [entry]
        tmp = self._log_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, self._log_path())
        return entry

    # -- read --------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Time travel: the table as of `version` (default: latest)."""
        snaps = self.snapshots()
        if version is not None:
            snaps = [s for s in snaps if s["version"] <= version]
        if not snaps:
            raise ValueError(f"no snapshots at or before version {version}")
        paths = [s["path"] for s in snaps]
        return spark.read.parquet(*paths)

    def read_changes(self, spark: SparkSession, after_version: int,
                     to_version: int | None = None) -> DataFrame:
        """Incremental read: only rows appended in (after, to] — the
        resume primitive (reference batched range scan S5)."""
        snaps = [s for s in self.snapshots() if s["version"] > after_version
                 and (to_version is None or s["version"] <= to_version)]
        if not snaps:
            raise ValueError("no snapshots in range")
        return spark.read.parquet(*[s["path"] for s in snaps])
