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
    def append(self, df: DataFrame, ts_col: str | None = None,
               op: str = "append") -> dict:
        """Write one immutable snapshot directory + a log entry (rows,
        digest, min/max ts, operation kind). The log write is atomic
        (tmp + replace)."""
        version = self.current_version() + 1
        path = os.path.join(self.root, f"snap-{version:06d}")
        df.write.mode("errorifexists").parquet(path)
        spark = df.sparkSession
        stats = digest_frame(spark.read.parquet(path), ts_col=ts_col)
        entry = {
            "version": version,
            "path": path,
            "op": op,
            "committed_at": time.time(),
            **stats,
        }
        snaps = self.snapshots() + [entry]
        tmp = self._log_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, self._log_path())
        return entry

    # -- KV (merge-on-read) -------------------------------------------------
    # The reference's KV posting store (SPDK/RocksDB backends behind
    # IExtraSearcher: upsert a posting by key, tombstone-delete, read the
    # merged current state, compact) — restated as snapshot operations:
    # every upsert/delete is an immutable snapshot, the merge happens at
    # READ time (latest snapshot version wins per key; tombstones drop
    # keys), and checkpoint() rewrites the merged state as a new base so
    # reads stop replaying history (the reference's merge/compaction,
    # ExtraDynamicSearcher merge path).

    def upsert(self, df: DataFrame, ts_col: str | None = None) -> dict:
        """One snapshot of rows that REPLACE any earlier row sharing the
        key (applied at read time)."""
        return self.append(df, ts_col=ts_col, op="upsert")

    def delete(self, keys_df: DataFrame) -> dict:
        """Tombstone snapshot: keys whose rows disappear from reads at
        and after this version (time travel before it still sees them)."""
        return self.append(keys_df, op="delete")

    def read_kv(self, spark: SparkSession, keys: list[str],
                version: int | None = None) -> DataFrame:
        """Merged current state as of `version`: latest upsert per key,
        minus keys whose latest operation is a tombstone.

        Plan shape: one scan per LIVE snapshot (bounded by checkpointing)
        unioned with a literal version column, one window per key —
        a single shuffle on the key, same as the reference's merge-on-
        read posting chain walk."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        snaps = self.snapshots()
        if version is not None:
            snaps = [s for s in snaps if s["version"] <= version]
        # replay only from the newest base/checkpoint snapshot
        base_idx = 0
        for i, s in enumerate(snaps):
            if s.get("op") == "base":
                base_idx = i
        snaps = snaps[base_idx:]
        if not snaps:
            raise ValueError(f"no snapshots at or before version {version}")
        parts = []
        # data_cols = ordered UNION of columns across all non-delete
        # snapshots in the replay range: a later upsert that ADDS a
        # column keeps it (older snapshots null-fill), instead of the
        # first snapshot's schema silently dropping it — and dropping it
        # permanently at the next checkpoint. Same name at a different
        # type is genuine drift we cannot merge: raise.
        data_cols: list[tuple[str, str]] = []
        col_types: dict[str, str] = {}
        for s in snaps:
            if s.get("op") == "delete":
                continue
            df = spark.read.parquet(s["path"])
            for c in df.columns:
                if c in keys:
                    continue
                t = df.schema[c].dataType.simpleString()
                if c not in col_types:
                    col_types[c] = t
                    data_cols.append((c, t))
                elif col_types[c] != t:
                    raise ValueError(
                        f"schema drift on column {c!r}: snapshot "
                        f"v{s['version']} has type {t}, earlier "
                        f"snapshots have {col_types[c]}"
                    )
        for s in snaps:
            df = spark.read.parquet(s["path"])
            is_del = s.get("op") == "delete"
            parts.append(
                (df if not is_del else df.select(*keys))
                .withColumn("__v", F.lit(s["version"]))
                .withColumn("__del", F.lit(1 if is_del else 0))
            )
        # align schemas (delete snapshots carry only the key columns;
        # pre-drift snapshots lack later-added columns)
        aligned = []
        for p in parts:
            for c, t in (data_cols or []):
                if c not in p.columns:
                    p = p.withColumn(c, F.lit(None).cast(t))
            aligned.append(p.select(*keys,
                                    *[c for c, _ in (data_cols or [])],
                                    "__v", "__del"))
        u = aligned[0]
        for p in aligned[1:]:
            u = u.unionByName(p)
        # content-hash tiebreak: if one snapshot carries a key twice the
        # winner is deterministic (identical rows are interchangeable) —
        # version alone would pick by shuffle order (CLAUDE.md rule 1).
        w = Window.partitionBy(*keys).orderBy(
            F.col("__v").desc(),
            F.xxhash64(*[F.col(c) for c, _ in (data_cols or [])]).desc()
            if data_cols else F.lit(0),
        )
        return (
            u.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col("__del") == 0))
            .drop("__v", "__del", "__rn")
        )

    def checkpoint(self, spark: SparkSession, keys: list[str]) -> dict:
        """Materialize the merged KV state as a new BASE snapshot:
        subsequent read_kv calls replay from here instead of the full
        history (compaction; the log keeps every older snapshot for time
        travel)."""
        state = self.read_kv(spark, keys)
        return self.append(state, op="base")

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
