"""Recall-vs-build-time comparison: TPT at the reference's tree count
(NeighborhoodGraph.h:38 m_iTPTNumber = 32) vs fewer trees + RefineGraph
iterations (VERDICT r5 next #6) — which knob buys graph recall cheaper
in this engine at >= 1M rows.

Protocol: deterministic clustered corpus (tools/ann_scaling.gen), each
config in a fresh JVM with a small warm build first (campaign lesson:
worker forks + codegen must not land in the timed region); the graph is
MATERIALIZED to parquet (timed, same write cost for every config), then
recall@k is measured offline against exact quantized-cosine truth for a
deterministic sample of sources (the full exact graph is O(N^2) and
infeasible at 1M — sampled-source truth is the reference's own TruthSet
approach, TruthSet.h:242-285).

Timings are single-shot per config (recall, the primary metric, is
deterministic); treat the times as indicative, the BENCH.md note
carries the host-noise caveat.

Usage: python tools/tpt_recall_bench.py [n_vecs] [cores] [n_samples]
Prints one JSON line; the BENCH.md section is maintained by hand.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 8
LEAF_SIZE = 2000  # reference m_iTPTLeafSize (NeighborhoodGraph.h:39)


def _gen(spark, n: int, out: str) -> None:
    spec = importlib.util.spec_from_file_location(
        "ann_scaling", os.path.join(REPO, "tools", "ann_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.gen_embeddings(spark, n, out, salt="tptrcl")


def _truth(corpus: str, n_samples: int):
    """Exact top-K (quantized cosine, engine tiebreak) for a
    deterministic sample of sources, computed offline in numpy —
    chunked over the corpus so the (n_samples, chunk) score block stays
    small."""
    import numpy as np
    import pyarrow.dataset as ds

    from sptag_spark.functions.vecarrow import (exact_int_matmul,
                                                np_quantize)

    tbl = ds.dataset(corpus).to_table(columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    X = np.asarray(tbl.column("embedding").to_pylist(),
                   dtype=np.float64)[order]
    n = len(ids)
    step = max(1, n // n_samples)
    s_idx = np.arange(0, n, step)[:n_samples]
    Q = np_quantize(X[s_idx])
    qn = np.sqrt((Q * Q).sum(1).astype(np.float64))
    truth: dict[int, set] = {}
    best_cos = np.full((len(s_idx), K), -2.0)
    best_id = np.full((len(s_idx), K), -1, dtype=np.int64)
    chunk = 100_000
    for lo in range(0, n, chunk):
        C = np_quantize(X[lo:lo + chunk])
        cn = np.sqrt((C * C).sum(1).astype(np.float64))
        cos = exact_int_matmul(Q, C.T) / (qn[:, None] * cn[None, :])
        cand_ids = ids[lo:lo + chunk]
        # merge chunk top-K into the running top-K per sample row
        allc = np.concatenate([best_cos, cos], axis=1)
        alli = np.concatenate(
            [best_id, np.broadcast_to(cand_ids, cos.shape)], axis=1)
        # self-exclusion: the graph never contains src==dst
        allc = np.where(alli == ids[s_idx][:, None], -2.0, allc)
        # (cosine DESC, id ASC) — sort by (-cos, id) lexicographically
        sel = np.lexsort((alli, -allc), axis=1)[:, :K]
        best_cos = np.take_along_axis(allc, sel, axis=1)
        best_id = np.take_along_axis(alli, sel, axis=1)
    for r, si in enumerate(s_idx):
        truth[int(ids[si])] = set(int(d) for d in best_id[r]
                                  if d >= 0)
    return truth


def _recall(graph_path: str, truth: dict[int, set]) -> float:
    import pyarrow.dataset as ds

    tbl = ds.dataset(graph_path).to_table(columns=["src", "dst"])
    srcs = tbl.column("src").to_numpy()
    dsts = tbl.column("dst").to_numpy()
    got: dict[int, set] = {s: set() for s in truth}
    for s, d in zip(srcs, dsts):
        s = int(s)
        if s in got:
            got[s].add(int(d))
    hits = sum(len(got[s] & truth[s]) for s in truth)
    total = sum(len(truth[s]) for s in truth)
    return hits / total


def _build(cores: int, corpus: str, warm: str, out: str, trees: int,
           refine_iters: int, tpt_src: str | None = None):
    """One timed config in a fresh JVM. tpt_src: reuse an already-built
    TPT graph parquet and time ONLY the refine pass (so trees=T and
    trees=T+refine share the identical init, like the reference where
    RefineGraph runs on the stored init graph)."""
    from sptag_spark.operators.graph import (build_knn_graph_tpt,
                                             refine_knn_graph)
    from sptag_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(app_name=f"tpt_recall_{trees}t{refine_iters}r",
                      cores=cores, shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    wdf = spark.read.parquet(warm)
    wg = build_knn_graph_tpt(wdf, k=K, trees=2, leaf_size=200)
    refine_knn_graph(wg, wdf, k=K, iters=1) \
        .write.format("noop").mode("overwrite").save()
    emb = spark.read.parquet(corpus)
    t0 = time.time()
    if tpt_src is None:
        g = build_knn_graph_tpt(emb, k=K, trees=trees,
                                leaf_size=LEAF_SIZE)
    else:
        g = spark.read.parquet(tpt_src)
    if refine_iters > 0:
        g = refine_knn_graph(g, emb, k=K, iters=refine_iters)
    g.write.mode("overwrite").parquet(out)
    dt = time.time() - t0
    stop_spark()
    return dt


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import tempfile

    from sptag_spark.session import get_spark, stop_spark

    tmp = tempfile.mkdtemp(prefix="tpt_recall_")
    corpus = f"{tmp}/corpus"
    warm = f"{tmp}/warm"
    spark = get_spark(app_name="tpt_recall_gen", cores=cores,
                      shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    _gen(spark, n_vecs, corpus)
    _gen(spark, 20_000, warm)
    stop_spark()

    truth = _truth(corpus, n_samples)

    results = {}
    t4 = _build(cores, corpus, warm, f"{tmp}/g_t4", 4, 0)
    results["trees4"] = {
        "build_sec": round(t4, 1),
        "recall": round(_recall(f"{tmp}/g_t4", truth), 4)}
    tr = _build(cores, corpus, warm, f"{tmp}/g_t4r2", 4, 2,
                tpt_src=f"{tmp}/g_t4")
    results["trees4_refine2"] = {
        "build_sec": round(t4 + tr, 1),
        "refine_only_sec": round(tr, 1),
        "recall": round(_recall(f"{tmp}/g_t4r2", truth), 4)}
    t32 = _build(cores, corpus, warm, f"{tmp}/g_t32", 32, 0)
    results["trees32"] = {
        "build_sec": round(t32, 1),
        "recall": round(_recall(f"{tmp}/g_t32", truth), 4)}

    print(json.dumps({
        "bench": "tpt_recall_vs_trees",
        "n_vecs": n_vecs,
        "cores": cores,
        "k": K,
        "leaf_size": LEAF_SIZE,
        "n_samples": n_samples,
        "configs": results,
    }))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
