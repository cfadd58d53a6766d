"""Posting split on overflow — head-set evolution (reference SPFresh
split, ExtraDynamicSearcher.h:637-894): over-limit postings 2-means into
two sub-heads registered in the centroid table; vectors are NEVER
dropped, sizes stay bounded under append-heavy load, and the split is
deterministic. Probing every bucket of a split index is exact search, so
recall at full nprobe must be 1.0 — the invariant that proves the split
lost nothing semantically, not just count-wise."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from sptag_spark.operators.ivfpq import ivf_pq_build, ivf_pq_probe
from sptag_spark.operators.knn import (
    brute_force_topk,
    ivf_append,
    ivf_build,
    ivf_compact,
    ivf_probe,
    ivf_split,
    recall_at_k,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def _sizes(spark, path):
    return sorted(
        r["n"] for r in spark.read.parquet(f"{path}/postings")
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    )


def test_split_bounds_sizes_drops_nothing_stays_consistent(spark, emb,
                                                           tmp_path):
    path = str(tmp_path / "idx")
    ivf_build(emb, 4, path)                  # ~125-row postings
    n = emb.count()
    n_splits = ivf_split(spark, path, max_posting_size=60)
    assert n_splits > 0
    sizes = _sizes(spark, path)
    assert max(sizes) <= 60
    post = spark.read.parquet(f"{path}/postings")
    assert post.count() == n                 # zero vectors dropped
    assert post.select("vec_id").distinct().count() == n
    # every posting bucket is a live centroid (probe reachability)
    cents = {r["centroid_id"] for r in spark.read
             .parquet(f"{path}/centroids").collect()}
    bks = {r["bucket"] for r in post.select("bucket").distinct().collect()}
    assert bks <= cents


def test_split_index_probed_everywhere_is_exact(spark, emb, tmp_path):
    """nprobe >= #heads scans every posting — on a lossless layout that
    IS brute force, so recall must be exactly 1.0; and a moderate nprobe
    keeps a practical floor."""
    path = str(tmp_path / "idx")
    ivf_build(emb, 4, path)
    ivf_split(spark, path, max_posting_size=60)
    q = emb.filter("vec_id < 16")
    exact = brute_force_topk(emb, q, k=10)
    n_heads = spark.read.parquet(f"{path}/centroids").count()
    r_all = recall_at_k(
        ivf_probe(spark, path, q, k=10, nprobe=n_heads), exact)
    assert r_all == 1.0, r_all
    r_half = recall_at_k(
        ivf_probe(spark, path, q, k=10, nprobe=max(2, n_heads // 2)),
        exact)
    assert r_half > 0.5, r_half


def test_split_is_deterministic(spark, emb, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (pa, pb):
        ivf_build(emb, 4, p)
        ivf_split(spark, p, max_posting_size=60)
    rows = lambda p: sorted(map(tuple, spark.read.parquet(f"{p}/postings")
                                .select("vec_id", "bucket").collect()))
    assert rows(pa) == rows(pb)


def test_append_heavy_lifecycle_stays_bounded(spark, emb, tmp_path):
    """The reference's steady-state update loop: append waves + split
    keep every posting within the limit with zero loss — the lossless
    counterpart of the compaction cap."""
    path = str(tmp_path / "idx")
    ivf_build(emb, 4, path)
    ivf_split(spark, path, max_posting_size=60)
    n = emb.count()
    for wave in (1, 2):
        more = emb.select(
            (F.col("vec_id") + 10_000 * wave).alias("vec_id"),
            "embedding", "label")
        ivf_append(spark, path, more)
        ivf_split(spark, path, max_posting_size=60)
        sizes = _sizes(spark, path)
        assert max(sizes) <= 60
        assert spark.read.parquet(f"{path}/postings").count() == \
            n * (wave + 1)
    # appended ids are findable
    got = ivf_probe(spark, path,
                    emb.filter("vec_id = 3").select(
                        (F.col("vec_id") + 10_000).alias("vec_id"),
                        "embedding"),
                    k=1, nprobe=4, vec_col="embedding").collect()
    assert got and got[0]["cosine"] > 0.999   # its own twin (vec 3)


def test_split_composed_ivfpq_index(spark, emb, tmp_path):
    """Codes ride along: splitting an ivf_pq index re-buckets rows
    (codes unchanged — codebooks are pinned) and the ADC probe still
    works against the enlarged head set."""
    path = str(tmp_path / "idx")
    ivf_pq_build(emb, 4, path, m=4, k_codes=16)
    ivf_split(spark, path, max_posting_size=60)
    assert max(_sizes(spark, path)) <= 60
    q = emb.filter("vec_id < 8")
    res = ivf_pq_probe(spark, path, q, k=5, nprobe=8, rerank=64)
    assert res.count() == 40
    exact = brute_force_topk(emb, q, k=5)
    assert recall_at_k(res, exact) > 0.3


def test_split_replicated_index_keeps_all_copies(spark, emb, tmp_path):
    """Split re-buckets each (vector, replica) posting row
    independently; no vector loses copies and probes still dedupe."""
    from sptag_spark.operators.knn import replica_histogram

    path = str(tmp_path / "idx")
    ivf_build(emb, 4, path, replica_count=2)
    before = {r["copies"]: r["n_vectors"]
              for r in replica_histogram(spark, path).collect()}
    ivf_split(spark, path, max_posting_size=80)
    after = {r["copies"]: r["n_vectors"]
             for r in replica_histogram(spark, path).collect()}
    assert before == after
    res = ivf_probe(spark, path, emb.filter("vec_id < 8"), k=10, nprobe=4)
    pairs = [(r["query_id"], r["vec_id"]) for r in res.collect()]
    assert len(pairs) == len(set(pairs)) > 0


def test_split_crash_orphan_sweep(spark, emb, tmp_path):
    """A crash between the centroid swap and the source-partition
    deletion leaves an orphan partition; the entry-time sweep (split or
    compact) removes it instead of letting a full-postings read
    resurrect duplicate rows."""
    path = str(tmp_path / "idx")
    ivf_build(emb, 4, path)
    ivf_split(spark, path, max_posting_size=60)
    n = emb.count()
    # simulate the crash: copy a live partition under a dead bucket id
    post_dir = f"{path}/postings"
    some = next(d for d in os.listdir(post_dir) if d.startswith("bucket="))
    shutil.copytree(os.path.join(post_dir, some),
                    os.path.join(post_dir, "bucket=999999"))
    assert spark.read.parquet(post_dir).count() > n   # duplicates visible
    ivf_compact(spark, path)
    assert spark.read.parquet(post_dir).count() == n
