"""End-to-end spark-submit evidence (north rule: jobs run via
spark-submit --py-files on a cluster).

Packages sptag_spark into a zip, launches the real spark-submit binary
(local master standing in for the cluster manager), and drives the full
datagen -> build_features (with injected crash + resume) -> serve_asof
chain through the CLI surface, asserting resume skips completed buckets
and the final digest matches a clean run."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(tmp) -> str:
    zpath = os.path.join(tmp, "sptag_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sptag_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath, script, *args, expect_fail=False):
    # locate spark-submit shipped inside the pyspark wheel
    import pyspark
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                          "spark-submit")
    cmd = [
        submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", script),
        *args,
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          env=env)
    if expect_fail:
        assert proc.returncode != 0, proc.stdout + proc.stderr
        return None
    assert proc.returncode == 0, proc.stdout + proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def test_spark_submit_pipeline_with_resume(tmp_path):
    tmp = str(tmp_path)
    zpath = _zip_package(tmp)
    corpus = os.path.join(tmp, "corpus")
    feats = os.path.join(tmp, "features")
    feats_clean = os.path.join(tmp, "features_clean")
    served = os.path.join(tmp, "served")

    m = _submit(zpath, "datagen.py", "--out", corpus, "--docs", "2000",
                "--probes", "1000")
    assert m["sequences"] > 2000  # versions fan out

    seq = os.path.join(corpus, "sequences.parquet")
    # crash after 3 of 8 buckets, then resume
    _submit(zpath, "build_features.py", "--sequences", seq, "--out", feats,
            "--buckets", "8", "--fail-after", "3", expect_fail=True)
    resumed = _submit(zpath, "build_features.py", "--sequences", seq,
                      "--out", feats, "--buckets", "8")
    assert resumed["buckets_done"] == 8
    # a bucket completed before the crash is not recomputed on resume
    assert resumed["rows"] == m["sequences"]

    clean = _submit(zpath, "build_features.py", "--sequences", seq,
                    "--out", feats_clean, "--buckets", "8")
    assert clean["digest"] == resumed["digest"]  # identical output digest

    s = _submit(zpath, "serve_asof.py",
                "--features", os.path.join(feats, "data"),
                "--probes", os.path.join(corpus, "asof_probes.parquet"),
                "--out", served)
    assert s["probes_served"] == 1000


def test_spark_submit_dedup_corpus(tmp_path):
    """The dedup CLI drives the LSH+verify pipeline through the real
    spark-submit binary and drops exactly the planted near-dups."""
    import duckdb

    tmp = str(tmp_path)
    zpath = _zip_package(tmp)
    out = os.path.join(tmp, "kept")
    src = "/root/testdata/sf0.01/documents.parquet"

    m = _submit(zpath, "dedup_corpus.py", "--in", src, "--out", out,
                "--method", "jaccard_lsh", "--threshold", "0.5")
    assert m["docs_in"] == m["docs_kept"] + m["docs_dropped"]
    # oracle: the contract query's loser count on the same corpus
    n_in = duckdb.sql(f"SELECT count(*) FROM '{src}'").fetchone()[0]
    assert m["docs_in"] == n_in
    assert m["docs_dropped"] > 0  # the corpus has planted near-dups

    m2 = _submit(zpath, "dedup_corpus.py", "--in", src,
                 "--out", os.path.join(tmp, "kept_exact"),
                 "--method", "exact")
    assert m2["docs_kept"] <= m["docs_in"]


def test_spark_submit_prepare_corpus(tmp_path):
    """The full prepare pipeline (quality -> decontaminate -> dedup ->
    mix -> pack) through the real spark-submit binary: stage counts are
    monotone, upweighted sources duplicate, spans tile the capacity."""
    import duckdb

    tmp = str(tmp_path)
    zpath = _zip_package(tmp)
    out = os.path.join(tmp, "prepared")
    src = "/root/testdata/sf0.01/documents.parquet"
    bench = os.path.join(tmp, "bench.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM '{src}' WHERE doc_id % 50 = 0) TO "
        f"'{bench}' (FORMAT parquet)"
    )

    m = _submit(zpath, "prepare_corpus.py", "--in", src, "--out", out,
                "--benchmark", bench, "--min-quality", "0.4",
                "--max-rep-ratio", "0.3", "--dedup", "jaccard_lsh",
                "--mix", "src0=1500", "--default-weight", "1000",
                "--capacity", "64")
    # monotone survivor funnel until the mix stage
    assert (m["in"] >= m["after_quality"] >= m["after_decontaminate"]
            >= m["after_dedup"])
    assert m["after_dedup"] > 0
    # upsampling src0 at 1500 per-mille grows the mixed corpus
    assert m["after_mix"] >= m["after_dedup"]
    assert m["chunks"] > 0

    docs = duckdb.sql(
        f"SELECT * FROM '{out}/documents/*.parquet'").df()
    spans = duckdb.sql(f"SELECT * FROM '{out}/spans/*.parquet'").df()
    assert len(docs) == m["after_mix"]
    # every benchmark doc_id is gone (decontamination removes overlap
    # sources; the planted bench slice shares its own shingles exactly)
    bench_ids = set(duckdb.sql(
        f"SELECT doc_id FROM '{bench}'").df()["doc_id"])
    assert not (set(docs["doc_id"]) & bench_ids)
    # spans tile each pack unit exactly: per pack_id, covered tokens ==
    # n_tokens of its source row
    got = spans.groupby("pack_id").apply(
        lambda g: (g["tok_end"] - g["tok_begin"]).sum(),
        include_groups=False,
    )
    # stride = max_weight//1000 + 2 (max of --mix 1500 / --default 1000)
    toks = docs.assign(
        pack_id=docs["doc_id"] * 3 + docs["copy_idx"],
        n_tokens=docs["text"].str.strip().str.split().str.len(),
    ).set_index("pack_id")["n_tokens"]
    assert all(got[pid] == toks[pid] for pid in got.index)
    # full chunks hold exactly capacity tokens
    fill = spans.assign(span=spans["tok_end"] - spans["tok_begin"]) \
        .groupby(["source", "chunk_id"])["span"].sum()
    assert fill.max() <= 64 and (fill == 64).sum() > 0


def test_spark_submit_ann_index_lifecycle(tmp_path):
    """The ANN index CLI (reference IndexBuilder/SSDServing mains)
    through real spark-submit: build ivf_pq on half the corpus, append
    the rest, tombstone deletes, search (deletes invisible), compact,
    search again (same result count)."""
    tmp = str(tmp_path)
    zpath = _zip_package(tmp)
    src = "/root/testdata/sf0.001/embeddings.parquet"
    idx = os.path.join(tmp, "idx")
    out1, out2 = os.path.join(tmp, "r1"), os.path.join(tmp, "r2")

    import duckdb
    half = os.path.join(tmp, "half.parquet")
    rest = os.path.join(tmp, "rest.parquet")
    dels = os.path.join(tmp, "dels.parquet")
    qs = os.path.join(tmp, "q.parquet")
    duckdb.sql(f"COPY (SELECT * FROM '{src}' WHERE vec_id < 300) TO "
               f"'{half}' (FORMAT PARQUET)")
    duckdb.sql(f"COPY (SELECT * FROM '{src}' WHERE vec_id >= 300) TO "
               f"'{rest}' (FORMAT PARQUET)")
    duckdb.sql(f"COPY (SELECT vec_id FROM '{src}' WHERE vec_id % 7 = 0) "
               f"TO '{dels}' (FORMAT PARQUET)")
    duckdb.sql(f"COPY (SELECT * FROM '{src}' WHERE vec_id < 8 AND "
               f"vec_id % 7 <> 0) TO '{qs}' (FORMAT PARQUET)")

    m = _submit(zpath, "ann_index.py", "build", "--in", half,
                "--index", idx, "--type", "ivf_pq",
                "--centroids", "16", "--m", "4", "--k-codes", "16")
    assert m["rows"] == 300
    m = _submit(zpath, "ann_index.py", "append", "--in", rest,
                "--index", idx)
    assert m["appended"] == 200
    m = _submit(zpath, "ann_index.py", "delete", "--keys", dels,
                "--index", idx)
    assert m["tombstoned"] > 0
    m = _submit(zpath, "ann_index.py", "search", "--index", idx,
                "--queries", qs, "--out", out1, "--k", "5",
                "--nprobe", "4", "--rerank", "32")
    assert m["queries"] == 6 and m["results"] == 30
    hits = duckdb.sql(
        f"SELECT count(*) FROM '{out1}/*.parquet' WHERE vec_id % 7 = 0"
    ).fetchone()[0]
    assert hits == 0  # tombstoned ids never surface
    m = _submit(zpath, "ann_index.py", "compact", "--index", idx)
    assert m["rows"] == 500 - len(range(0, 500, 7))
    m = _submit(zpath, "ann_index.py", "search", "--index", idx,
                "--queries", qs, "--out", out2, "--k", "5",
                "--nprobe", "4", "--rerank", "32")
    assert m["results"] == 30
    same = duckdb.sql(
        f"SELECT count(*) FROM (SELECT * FROM '{out1}/*.parquet' "
        f"EXCEPT SELECT * FROM '{out2}/*.parquet')").fetchone()[0]
    assert same == 0  # merge-on-read == post-compact
    # head-set evolution: split over-limit postings (lossless), then
    # search the enlarged head set
    n_live = 500 - len(range(0, 500, 7))
    m = _submit(zpath, "ann_index.py", "split", "--index", idx,
                "--max-posting-size", "25")
    assert m["splits"] > 0 and m["rows"] == n_live and m["heads"] > 16
    out3 = os.path.join(tmp, "r3")
    m = _submit(zpath, "ann_index.py", "search", "--index", idx,
                "--queries", qs, "--out", out3, "--k", "5",
                "--nprobe", "8", "--rerank", "32")
    assert m["results"] == 30
    # post-split neighborhood reassignment: placements re-derive
    # against the evolved head set (lossless; codes pinned)
    m = _submit(zpath, "ann_index.py", "reassign", "--index", idx)
    assert m["moved"] >= 0 and m["rows"] == n_live
    out3b = os.path.join(tmp, "r3b")
    m = _submit(zpath, "ann_index.py", "search", "--index", idx,
                "--queries", qs, "--out", out3b, "--k", "5",
                "--nprobe", "8", "--rerank", "32")
    assert m["results"] == 30
    # merge-on-underflow: with >16 heads over 429 live rows, pigeonhole
    # guarantees under-26 postings exist (post-reassign sizes may move,
    # so "all but the largest retire" is no longer exact); retiring
    # heads fold rows into survivors losslessly and search keeps working
    m = _submit(zpath, "ann_index.py", "merge", "--index", idx,
                "--min-posting-size", "26")
    assert m["merged"] > 0 and m["rows"] == n_live and m["heads"] >= 1
    out4 = os.path.join(tmp, "r4")
    m = _submit(zpath, "ann_index.py", "search", "--index", idx,
                "--queries", qs, "--out", out4, "--k", "5",
                "--nprobe", "8", "--rerank", "32")
    assert m["results"] == 30


def test_spark_submit_knn_graph(tmp_path):
    """The graph-build CLI (reference BuildInitKNNGraph + RefineGraph +
    RNG prune pipeline) through real spark-submit: TPT build with two
    refinement rounds and an RNG prune, degree bounds verified from the
    written parquet; a no-refine no-prune run keeps exactly k edges per
    node."""
    tmp = str(tmp_path)
    zpath = _zip_package(tmp)
    src = "/root/testdata/sf0.001/embeddings.parquet"

    import duckdb
    out1 = os.path.join(tmp, "g_refined")
    m = _submit(zpath, "knn_graph.py", "--in", src, "--out", out1,
                "--k", "6", "--trees", "3", "--leaf-size", "64",
                "--refine-iters", "2", "--max-degree", "4")
    assert m["nodes"] == 500 and m["edges"] <= 500 * 4
    deg = duckdb.sql(
        f"SELECT max(n) FROM (SELECT src, count(*) n FROM "
        f"'{out1}/*.parquet' GROUP BY src)").fetchone()[0]
    assert deg <= 4

    out2 = os.path.join(tmp, "g_plain")
    m = _submit(zpath, "knn_graph.py", "--in", src, "--out", out2,
                "--k", "6", "--trees", "3", "--leaf-size", "64",
                "--refine-iters", "0")
    assert m["nodes"] == 500 and m["edges"] == 500 * 6


def test_spark_submit_knn_graph_rebalance_forward_only(tmp_path):
    """--max-indegree routes through rebalance_indegree (A11: 2k-wide
    candidates, fan-in-bounded re-selection) and --forward-only refines
    without reverse edges; the output stays k-regular and the naive hub
    fan-in shrinks to the bound."""
    tmp = str(tmp_path)
    zpath = _zip_package(tmp)
    src = "/root/testdata/sf0.001/embeddings.parquet"

    import duckdb
    out = os.path.join(tmp, "g_rb")
    m = _submit(zpath, "knn_graph.py", "--in", src, "--out", out,
                "--k", "6", "--trees", "3", "--leaf-size", "64",
                "--refine-iters", "1", "--forward-only",
                "--max-indegree", "10")
    assert m["forward_only"] is True and m["max_indegree"] == 10
    assert m["nodes"] == 500 and m["edges"] == 500 * 6
    deg = duckdb.sql(
        f"SELECT max(n) FROM (SELECT src, count(*) n FROM "
        f"'{out}/*.parquet' GROUP BY src)").fetchone()[0]
    assert deg == 6


def test_spark_submit_knn_graph_search(tmp_path):
    """Search mode: beam-search a query file over a previously built
    graph through real spark-submit; k results per query with ranks."""
    tmp = str(tmp_path)
    zpath = _zip_package(tmp)
    src = "/root/testdata/sf0.001/embeddings.parquet"

    import duckdb
    gout = os.path.join(tmp, "g")
    _submit(zpath, "knn_graph.py", "--in", src, "--out", gout,
            "--k", "6", "--trees", "3", "--leaf-size", "64",
            "--refine-iters", "0")
    qs = os.path.join(tmp, "q.parquet")
    duckdb.sql(f"COPY (SELECT * FROM '{src}' WHERE vec_id < 5) TO "
               f"'{qs}' (FORMAT PARQUET)")
    rout = os.path.join(tmp, "res")
    m = _submit(zpath, "knn_graph.py", "--in", src, "--graph", gout,
                "--queries", qs, "--out", rout, "--k", "5",
                "--beam", "8", "--rounds", "4")
    assert m["queries"] == 5 and m["results"] == 25
    mx = duckdb.sql(f"SELECT max(rank), count(DISTINCT query_id) FROM "
                    f"'{rout}/*.parquet'").fetchone()
    assert mx == (5, 5)
    # missing --graph is rejected
    assert _submit(zpath, "knn_graph.py", "--in", src,
                   "--queries", qs, "--out", rout,
                   expect_fail=True) is None
