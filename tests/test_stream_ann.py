"""Streaming ANN ingest (stream_ann_ingest): the reference's
update-while-search freshness loop (SPFresh foreground append +
background posting split, ExtraDynamicSearcher.h:637-894) as a
Structured Streaming foreachBatch sink over a persisted IVF / IVF-PQ
index.

Gates: (1) ingest across multiple micro-batches probes IDENTICALLY to
one batch ivf_append of the same vectors; (2) a replayed micro-batch
(foreachBatch is at-least-once) changes nothing — the (id, bucket)
posting multiset is unchanged after the replay; (3) with
max_posting_size set, sustained ingest keeps every posting within the
limit with ZERO vectors dropped; (4) a composed (ivf_pq) index routes
through ivf_pq_append — appended rows carry codes and ADC probes keep
working."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sptag_spark.operators.ivfpq import ivf_pq_build, ivf_pq_probe
from sptag_spark.operators.knn import ivf_append, ivf_build, ivf_probe
from sptag_spark.streaming.jobs import (
    _ann_ingest_handler,
    stream_ann_ingest,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def _pairs(spark, path):
    return sorted(
        (r["vec_id"], r["bucket"]) for r in
        spark.read.parquet(f"{path}/postings")
        .select("vec_id", "bucket").collect()
    )


def _probe_sorted(spark, path, q, **kw):
    return sorted(
        (r["query_id"], r["vec_id"], r["rank"], r["cosine"])
        for r in ivf_probe(spark, path, q, **kw).collect()
    )


def _drain(stream_q):
    stream_q.awaitTermination()


def _extras_source(spark, emb, tmp_path, n_files=4):
    """extras (vec_id >= 300) written as n_files parquet files so
    maxFilesPerTrigger=1 forces n_files micro-batches."""
    src = str(tmp_path / "extras_src")
    emb.filter("vec_id >= 300").repartition(n_files) \
        .write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    return stream


def test_stream_ingest_matches_batch_append(spark, emb, tmp_path):
    base = emb.filter("vec_id < 300")
    streamed = str(tmp_path / "streamed")
    ivf_build(base, 8, streamed, replica_count=2)
    _drain(stream_ann_ingest(
        _extras_source(spark, emb, tmp_path), streamed,
        str(tmp_path / "ckpt")))

    twin = str(tmp_path / "twin")
    ivf_build(base, 8, twin, replica_count=2)
    ivf_append(spark, twin, emb.filter("vec_id >= 300"))

    assert _pairs(spark, streamed) == _pairs(spark, twin)
    q = emb.filter("vec_id < 8")
    got = _probe_sorted(spark, streamed, q, k=5, nprobe=4)
    assert got and got == _probe_sorted(spark, twin, q, k=5, nprobe=4)


def test_ingest_batch_replay_is_idempotent(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    ivf_build(emb.filter("vec_id < 300"), 8, path, replica_count=2)
    batch = emb.filter("vec_id >= 300")
    handle = _ann_ingest_handler(path, "vec_id", "embedding", None,
                                 marker_dir=str(tmp_path / "markers"),
                                 is_pq=False)
    handle(batch, 7)
    after_first = _pairs(spark, path)
    handle(batch, 7)                       # marker short-circuits
    assert _pairs(spark, path) == after_first
    # the (id, bucket) anti-join guard alone (partial-commit window,
    # marker absent) also appends nothing the second time
    ivf_append(spark, path, batch, idempotent=True)
    assert _pairs(spark, path) == after_first
    # marker GC: a later batch retires the batch-7 marker
    import os
    handle(batch.limit(0), 8)              # empty batch: no-op, no GC
    assert os.path.exists(str(tmp_path / "markers" / "batch-7"))
    handle(emb.filter("vec_id = 299"), 9)  # ids already indexed: no rows
    assert not os.path.exists(str(tmp_path / "markers" / "batch-7"))
    assert _pairs(spark, path) == after_first


def test_stream_ingest_split_bounds_postings(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    base = emb.filter("vec_id < 300")
    ivf_build(base, 4, path)               # few heads -> postings grow
    n = emb.count()
    _drain(stream_ann_ingest(
        _extras_source(spark, emb, tmp_path), path,
        str(tmp_path / "ckpt"), max_posting_size=60))
    post = spark.read.parquet(f"{path}/postings")
    assert post.count() == n               # zero vectors dropped
    assert post.select("vec_id").distinct().count() == n
    sizes = [r["n"] for r in post.groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert max(sizes) <= 60
    # probes see the evolved head set immediately
    q = emb.filter("vec_id < 8")
    assert ivf_probe(spark, path, q, k=5, nprobe=4).count() == 40


def test_cli_ingest_verb(spark, emb, tmp_path):
    """jobs/ann_index.py ingest drives stream_ann_ingest end-to-end
    (in-process main — the spark-submit chain is covered by the
    lifecycle test; this gates the verb's wiring + metrics)."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "ann_index_job", os.path.join(os.path.dirname(__file__),
                                      "..", "jobs", "ann_index.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    path = str(tmp_path / "idx")
    src = str(tmp_path / "extras_src")
    emb.filter("vec_id >= 300").repartition(3) \
        .write.mode("overwrite").parquet(src)
    ivf_build(emb.filter("vec_id < 300"), 4, path)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["ingest", "--in", src, "--index", path,
                  "--checkpoint", str(tmp_path / "ckpt"),
                  "--max-posting-size", "60"])
    m = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert m["ingested"] == 200 and m["rows"] == 500
    sizes = [r["n"] for r in spark.read.parquet(f"{path}/postings")
             .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
             .collect()]
    assert max(sizes) <= 60 and m["heads"] > 4


def test_stream_ingest_composed_index_encodes(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    ivf_pq_build(emb.filter("vec_id < 300"), 8, path, m=4, k_codes=16)
    _drain(stream_ann_ingest(
        _extras_source(spark, emb, tmp_path), path,
        str(tmp_path / "ckpt")))
    post = spark.read.parquet(f"{path}/postings")
    new_rows = post.filter("vec_id >= 300")
    assert new_rows.count() > 0
    assert new_rows.filter(F.col("codes").isNull()).count() == 0
    res = ivf_pq_probe(spark, path, emb.filter("vec_id < 8"),
                       k=5, nprobe=8, rerank=64)
    assert res.count() == 40


def test_marker_gc_ignores_stray_files(spark, emb, tmp_path):
    """A stray non-numeric 'batch-*' file in the marker dir must not
    break marker GC (it used to ValueError and permanently fail every
    subsequent micro-batch)."""
    import os

    path = str(tmp_path / "idx")
    ivf_build(emb.filter("vec_id < 300"), 8, path)
    markers = tmp_path / "markers"
    markers.mkdir()
    (markers / "batch-README.tmp").write_text("stray")
    (markers / "batch-1").write_text("")
    handle = _ann_ingest_handler(path, "vec_id", "embedding", None,
                                 marker_dir=str(markers), is_pq=False)
    handle(emb.filter("vec_id >= 300"), 5)   # must not raise
    assert os.path.exists(str(markers / "batch-README.tmp"))  # skipped
    assert not os.path.exists(str(markers / "batch-1"))       # GC'd
    assert os.path.exists(str(markers / "batch-5"))


def test_within_batch_duplicate_ids_pick_deterministic_survivor(
        spark, emb, tmp_path):
    """Duplicate ids inside one micro-batch must keep the SAME payload
    regardless of row order (min payload hash), so a replay after a
    partially committed append can never re-assign the id to a
    different bucket and duplicate it."""
    a = emb.filter("vec_id >= 300")
    # second copy of every id with a different (reversed) embedding
    b = a.withColumn("embedding", F.reverse("embedding"))
    dup_fwd = a.unionByName(b)
    dup_rev = b.unionByName(a)

    pairs = []
    for i, batch in enumerate((dup_fwd, dup_rev)):
        path = str(tmp_path / f"idx{i}")
        ivf_build(emb.filter("vec_id < 300"), 8, path)
        handle = _ann_ingest_handler(
            path, "vec_id", "embedding", None,
            marker_dir=str(tmp_path / f"markers{i}"), is_pq=False)
        handle(batch, 0)
        pairs.append(_pairs(spark, path))
    assert pairs[0] == pairs[1]
