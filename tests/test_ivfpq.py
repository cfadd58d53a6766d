"""IVF x PQ composed index (reference ExtraStaticSearcher.h:260-411
ProcessPosting + PQQuantizer.h:111-130 ADC): exactness of the re-rank
tail, recall vs brute force, and the two plan properties that make it
the 100-TB shape — codes-only pruned ADC scan, vectors read only for
re-rank candidates."""

from __future__ import annotations

import re

import pytest

from sptag_spark.operators.ivfpq import ivf_pq_build, ivf_pq_probe
from sptag_spark.operators.knn import brute_force_topk, ivf_build, \
    ivf_probe, recall_at_k

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    ivf_pq_build(emb, n_centroids=16, path=path, m=4, k_codes=16)
    return path


def test_unbounded_rerank_equals_exact_ivf_probe(spark, emb, index,
                                                 tmp_path):
    """With rerank >= every candidate, ADC prunes nothing and the exact
    re-rank must reproduce plain ivf_probe bit-for-bit (same centroids,
    same bucketing kernel, same scoring tail) — the quantization layer
    only ever DROPS candidates, never rescores survivors."""
    q = emb.filter("vec_id < 4")
    got = sorted(
        (r["query_id"], r["vec_id"], r["rank"], r["cosine"])
        for r in ivf_pq_probe(spark, index, q, k=5, nprobe=4,
                              rerank=10**6).collect()
    )
    ivf_path = str(tmp_path / "ivf")
    ivf_build(emb, n_centroids=16, path=ivf_path)
    want = sorted(
        (r["query_id"], r["vec_id"], r["rank"], r["cosine"])
        for r in ivf_probe(spark, ivf_path, q, k=5, nprobe=4).collect()
    )
    assert got == want


def test_recall_gate_vs_brute_force(spark, emb, tmp_path):
    """The ADC funnel must recover most of what the IVF layer can see:
    absolute floor vs brute force AND >= 80% of the exact-IVF recall at
    the same nprobe (the IVF candidate set caps recall at ~0.65 on this
    near-random synthetic corpus — a data property, so the relative gate
    is the meaningful one; threshold style mirrors the reference recall
    harness, TruthSet.h:242-285)."""
    path = str(tmp_path / "idx8")
    ivf_pq_build(emb, n_centroids=16, path=path, m=8, k_codes=16)
    q = emb.filter("vec_id < 8")
    exact = brute_force_topk(emb, q, k=10)
    approx = ivf_pq_probe(spark, path, q, k=10, nprobe=8, rerank=128)
    r = recall_at_k(approx, exact)
    ivf_path = str(tmp_path / "ivf")
    ivf_build(emb, n_centroids=16, path=ivf_path)
    r_ivf = recall_at_k(
        ivf_probe(spark, ivf_path, q, k=10, nprobe=8), exact)
    assert r >= 0.5, f"recall@10 = {r}"
    assert r >= 0.8 * r_ivf, f"ADC funnel lost too much: {r} vs IVF {r_ivf}"


def test_probe_is_deterministic(spark, emb, index):
    q = emb.filter("vec_id < 4")
    a = sorted(map(tuple, ivf_pq_probe(spark, index, q, k=5).collect()))
    b = sorted(map(tuple, ivf_pq_probe(spark, index, q, k=5).collect()))
    assert a == b


def test_adc_scan_never_reads_embeddings(spark, emb, index):
    """The plan-shape contract: BOTH postings scans are partition-pruned
    on bucket; the ADC scan reads codes WITHOUT the embedding column;
    vectors appear only in the re-rank scan."""
    import contextlib
    import io

    out = ivf_pq_probe(spark, index, emb.filter("vec_id < 4"), k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    # detail entries only (the tree section mentions "Scan parquet"
    # without Location/ReadSchema)
    scans = [s for s in p.split("Scan parquet")[1:]
             if "Location" in s and "ReadSchema" in s
             and "postings" in s.split("Location")[1].splitlines()[0]]
    assert len(scans) == 2, p
    schemas = [s.split("ReadSchema: ")[1].splitlines()[0] for s in scans]
    adc = [s for s in schemas if "codes" in s]
    rer = [s for s in schemas if "embedding" in s]
    assert len(adc) == 1 and len(rer) == 1, schemas
    assert "embedding" not in adc[0], adc[0]
    assert "codes" not in rer[0], rer[0]
    for s in scans:
        assert re.search(r"PartitionFilters: \[bucket#\d+ IN", s), s
    assert out.count() > 0


def test_ivf_pq_join_mode_equals_driver_mode(spark, emb, index):
    """The wave path (executor-side probe table + DPP + executor-built
    ADC tables, no query collect anywhere) must reproduce the driver
    path bit-for-bit."""
    q = emb.filter("vec_id < 16")
    a = sorted(map(tuple, ivf_pq_probe(
        spark, index, q, k=5, nprobe=4, rerank=32,
        probe_mode="driver").collect()))
    b = sorted(map(tuple, ivf_pq_probe(
        spark, index, q, k=5, nprobe=4, rerank=32,
        probe_mode="join").collect()))
    assert a == b and len(a) == 80


def test_opq_rotation_composes_into_ivfpq(spark, tmp_path):
    """Q10 composed (VERDICT r3 #5): ivf_pq_build(rotation='opq')
    stores the learned rotation beside the index; heads/codes/ADC live
    in rotated space while the exact re-rank stays in the original
    space. On the anisotropic fixture the OPQ tier must not lose to the
    identity-rotation tier with the same trainer budget, and the float
    training must be deterministic per host (no oracle — documented in
    COVERAGE.md)."""
    from test_pq import _anisotropic_fixture

    df, _ = _anisotropic_fixture(spark)
    df = df.cache()
    q = df.filter("vec_id < 8")
    exact = brute_force_topk(df, q, k=10)
    rec = {}
    for rot in ("pq", "opq"):
        p = str(tmp_path / rot)
        ivf_pq_build(df, n_centroids=8, path=p, m=4, k_codes=16,
                     rotation=rot, opq_sample_size=384)
        rec[rot] = recall_at_k(
            ivf_pq_probe(spark, p, q, k=10, nprobe=4, rerank=48), exact)
    assert rec["opq"] >= rec["pq"], rec
    assert rec["opq"] >= 0.5, rec
    # per-host determinism: a second build probes bit-identically
    p2 = str(tmp_path / "opq2")
    ivf_pq_build(df, n_centroids=8, path=p2, m=4, k_codes=16,
                 rotation="opq", opq_sample_size=384)
    a = sorted(map(tuple, ivf_pq_probe(
        spark, str(tmp_path / "opq"), q, k=5, nprobe=4).collect()))
    b = sorted(map(tuple, ivf_pq_probe(spark, p2, q, k=5,
                                       nprobe=4).collect()))
    assert a == b
    df.unpersist()


def test_opq_ivfpq_append_rotates_new_vectors(spark, emb, tmp_path):
    """The incremental path must rotate appended vectors with the
    STORED R before assign+encode: an appended vector probed by its own
    (re-identified) embedding at nprobe=1 lands in the same head and
    surfaces as the top hit with cosine ~1 — impossible if the append
    skipped the rotation."""
    from pyspark.sql import functions as F

    from sptag_spark.operators.ivfpq import ivf_pq_append

    path = str(tmp_path / "idx")
    ivf_pq_build(emb.filter("vec_id < 400"), 16, path, m=4, k_codes=16,
                 rotation="opq", opq_sample_size=400)
    ivf_pq_append(spark, path, emb.filter("vec_id >= 400"))
    twins = emb.filter("vec_id >= 400 AND vec_id < 408").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    got = ivf_pq_probe(spark, path, twins, k=1, nprobe=1, rerank=16)
    rows = {r["query_id"]: (r["vec_id"], r["cosine"])
            for r in got.collect()}
    assert len(rows) == 8
    for qid, (vid, cos) in rows.items():
        assert vid == qid - 10_000 and cos > 0.999, rows


def test_ivf_pq_incremental_lifecycle_matches_rebuild(spark, emb,
                                                      tmp_path):
    """Append/delete/compact on the COMPOSED index: new vectors are
    assigned AND PQ-encoded against the existing heads + codebooks; at
    every step probing equals a from-scratch rebuild over the surviving
    corpus with both quantization tiers pinned."""
    import os

    from sptag_spark.operators.ivfpq import (
        _read_codebooks, ivf_pq_append,
    )
    from sptag_spark.operators.knn import ivf_compact, ivf_delete

    path = str(tmp_path / "idx")
    ivf_pq_build(emb.filter("vec_id < 300"), n_centroids=16, path=path,
                 m=4, k_codes=16)
    centroids = spark.read.parquet(f"{path}/centroids")
    books = _read_codebooks(spark, path)
    ivf_pq_append(spark, path, emb.filter("vec_id >= 300"))
    ivf_delete(spark, path, emb.filter("vec_id % 7 = 0").select("vec_id"))

    q = emb.filter("vec_id < 8 AND vec_id % 7 != 0")
    probe = lambda p: sorted(map(tuple, ivf_pq_probe(
        spark, p, q, k=5, nprobe=4, rerank=32).collect()))
    inc = probe(path)
    assert inc and all(r[1] % 7 != 0 for r in inc)

    rebuilt = str(tmp_path / "rebuilt")
    ivf_pq_build(emb.filter("vec_id % 7 != 0"), n_centroids=16,
                 path=rebuilt, centroids=centroids, codebooks=books)
    assert inc == probe(rebuilt)

    # a join-mode probe leaves a side table; compact cleans it AND the
    # tombstones, preserving results
    ivf_pq_probe(spark, path, q, k=5, nprobe=4, rerank=32,
                 probe_mode="join").collect()
    assert os.path.isdir(f"{path}/_probes")
    ivf_compact(spark, path)
    assert not os.path.isdir(f"{path}/tombstones")
    assert not os.path.isdir(f"{path}/_probes")
    assert inc == probe(path)
