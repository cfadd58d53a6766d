"""Snapshot table tests: append-only versioning, time travel, incremental
reads, and snapshot-resume of a processing job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sptag_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_append_and_time_travel(spark, table):
    table.append(_batch(spark, 0, 10))
    table.append(_batch(spark, 10, 30))
    table.append(_batch(spark, 30, 35))
    assert table.current_version() == 3
    assert table.read(spark).count() == 35
    assert table.read(spark, version=1).count() == 10
    assert table.read(spark, version=2).count() == 30
    # time travel is bit-stable: same version, same digest
    from sptag_spark.sources.manifest import digest_frame
    d1 = digest_frame(table.read(spark, version=2))
    d2 = digest_frame(table.read(spark, version=2))
    assert d1["digest"] == d2["digest"]


def test_incremental_read(spark, table):
    table.append(_batch(spark, 0, 10))
    table.append(_batch(spark, 10, 30))
    inc = table.read_changes(spark, after_version=1)
    assert inc.count() == 20
    assert inc.agg(F.min("id")).first()[0] == 10


def test_snapshot_resume_processing(spark, table, tmp_path):
    """A consumer records the last snapshot it processed; restart
    processes only newer snapshots (reference T7 checkpoint/recovery)."""
    out = []

    def process_new(last_done: int) -> int:
        cur = table.current_version()
        if cur > last_done:
            rows = table.read_changes(spark, after_version=last_done,
                                      to_version=cur).count()
            out.append(rows)
            return cur
        return last_done

    table.append(_batch(spark, 0, 100))
    done = process_new(0)
    table.append(_batch(spark, 100, 150))
    table.append(_batch(spark, 150, 160))
    done = process_new(done)
    assert out == [100, 60]  # second pass saw ONLY the two new snapshots
    assert done == 3
    # idempotent when nothing new
    assert process_new(done) == 3 and len(out) == 2


def test_read_before_first_version_raises(spark, table):
    with pytest.raises(ValueError):
        table.read(spark, version=0)


def test_kv_merge_on_read_upsert_delete_timetravel(spark, tmp_path):
    """S8 KV posting store: latest upsert wins per key, tombstones drop
    keys from the merged state, and time travel still sees pre-delete
    history (reference merge-on-read posting chain)."""
    from sptag_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "kv"))
    v1 = t.upsert(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], ["k", "payload", "n"]))
    v2 = t.upsert(spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], ["k", "payload", "n"]))
    v3 = t.delete(spark.createDataFrame([(1,)], ["k"]))

    cur = {r["k"]: (r["payload"], r["n"])
           for r in t.read_kv(spark, ["k"]).collect()}
    assert cur == {2: ("b2", 21), 3: ("c", 30)}  # 1 tombstoned, 2 updated

    asof_v1 = {r["k"]: r["payload"]
               for r in t.read_kv(spark, ["k"], version=v1["version"]).collect()}
    assert asof_v1 == {1: "a", 2: "b"}
    asof_v2 = {r["k"]: r["payload"]
               for r in t.read_kv(spark, ["k"], version=v2["version"]).collect()}
    assert asof_v2 == {1: "a", 2: "b2", 3: "c"}


def test_kv_checkpoint_compacts_replay(spark, tmp_path):
    """checkpoint() materializes a base snapshot; reads after it replay
    only from the base and still return the same merged state (plus
    later changes)."""
    from sptag_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "kv"))
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"]))
    t.delete(spark.createDataFrame([(2,)], ["k"]))
    before = {r["k"]: r["p"] for r in t.read_kv(spark, ["k"]).collect()}
    base = t.checkpoint(spark, ["k"])
    assert base["op"] == "base"
    after = {r["k"]: r["p"] for r in t.read_kv(spark, ["k"]).collect()}
    assert after == before == {1: "a"}
    # post-checkpoint changes still apply on top of the base
    t.upsert(spark.createDataFrame([(1, "a2"), (4, "d")], ["k", "p"]))
    final = {r["k"]: r["p"] for r in t.read_kv(spark, ["k"]).collect()}
    assert final == {1: "a2", 4: "d"}
    # a reader pinned before the checkpoint is unaffected
    old = {r["k"]: r["p"]
           for r in t.read_kv(spark, ["k"], version=1).collect()}
    assert old == {1: "a", 2: "b"}


def test_kv_schema_evolution_keeps_added_columns(spark, tmp_path):
    """A later upsert that ADDS a column must keep it in the merged view
    (older snapshots null-fill) and survive checkpointing — the old
    first-snapshot-wins column list silently and permanently dropped it
    (ADVICE r2)."""
    t = SnapshotTable(str(tmp_path / "kv"))
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"]))
    t.upsert(spark.createDataFrame(
        [(2, "b2", 99), (3, "c", 30)], ["k", "p", "extra"]))
    cur = {r["k"]: (r["p"], r["extra"])
           for r in t.read_kv(spark, ["k"]).collect()}
    assert cur == {1: ("a", None), 2: ("b2", 99), 3: ("c", 30)}
    # the added column survives compaction too
    t.checkpoint(spark, ["k"])
    after = {r["k"]: (r["p"], r["extra"])
             for r in t.read_kv(spark, ["k"]).collect()}
    assert after == cur


def test_kv_schema_type_conflict_raises(spark, tmp_path):
    """Same column name at a different type is unmergeable drift: loud
    error instead of silent coercion/drop."""
    t = SnapshotTable(str(tmp_path / "kv"))
    t.upsert(spark.createDataFrame([(1, 10)], ["k", "v"]))
    t.upsert(spark.createDataFrame([(2, "s")], ["k", "v"]))
    with pytest.raises(ValueError, match="schema drift"):
        t.read_kv(spark, ["k"]).collect()
