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
