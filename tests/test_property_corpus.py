"""Property tests for the packing and mixture operators: random token
sizes / weights vs pure-python oracles, one Spark run per example batch
(hypothesis drives the data, Spark evaluates a whole batch at once to
amortize JVM round-trips)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sptag_spark.operators.corpus import (
    pack_chunks_global,
    stratified_sample,
    weighted_mix,
)


def _py_pack(sizes: list[int], capacity: int):
    """Sequential concat-and-chunk oracle."""
    rows, off = [], 0
    for i, t in enumerate(sizes):
        if t < 1:
            continue
        start, end = off, off + t
        for c in range(start // capacity, (end - 1) // capacity + 1):
            rows.append((
                i, c,
                max(c * capacity - start, 0),
                min((c + 1) * capacity - start, t),
                max(start - c * capacity, 0),
            ))
        off = end
    return sorted(rows)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300),
                   min_size=1, max_size=60),
    capacity=st.sampled_from([1, 7, 64, 128]),
)
def test_pack_global_matches_python_oracle(spark, sizes, capacity):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(sizes)], ["doc_id", "n_tokens"]
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["tok_begin"], r["tok_end"],
         r["pos_in_chunk"])
        for r in pack_chunks_global(df, capacity, block_width=7).collect()
    )
    assert got == _py_pack(sizes, capacity)


def _md5_key(doc_id: int, salt: str = "mix", denom: int = 1000) -> int:
    h = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % denom


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(min_value=1, max_value=80),
    w0=st.integers(min_value=0, max_value=3500),
    w1=st.integers(min_value=0, max_value=1500),
)
def test_weighted_mix_matches_key_formula(spark, n, w0, w1):
    rows = [(i, "s0" if i % 2 == 0 else "s1") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = weighted_mix(df, {"s0": w0, "s1": w1})
    got = {(r["doc_id"], r["copy_idx"]) for r in out.collect()}
    want = set()
    for i, s in rows:
        w = w0 if s == "s0" else w1
        copies = w // 1000 + (1 if _md5_key(i, "mixcopy") < w % 1000 else 0)
        want |= {(i, c) for c in range(copies)}
    assert got == want


def test_sample_then_mix_coins_are_independent(spark):
    """Composing stratified_sample + weighted_mix with the DEFAULT salts
    must not correlate the survival filter with the fractional-copy coin
    (the old shared-salt bug: rate 500 + weight 1500 gave every survivor
    the extra copy -> effective weight 2000, not 1500)."""
    n, rate, weight = 4000, 500, 1500
    df = spark.createDataFrame(
        [(i, "s0") for i in range(n)], ["doc_id", "source"]
    )
    out = weighted_mix(stratified_sample(df, {"s0": rate}),
                       {"s0": weight})
    survivors = {i for i in range(n) if _md5_key(i, "mix") < rate}
    copies = out.groupBy("doc_id").count().collect()
    assert {r["doc_id"] for r in copies} == survivors
    extra = sum(1 for r in copies if r["count"] == 2)
    # with independent coins ~50% of survivors get the second copy;
    # the correlated bug gives 100%. Exact expected count from formula:
    want_extra = sum(1 for i in survivors
                     if _md5_key(i, "mixcopy") < weight % 1000)
    assert extra == want_extra
    assert 0.35 < extra / len(survivors) < 0.65


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(min_value=1, max_value=80),
    r0=st.integers(min_value=0, max_value=1000),
)
def test_stratified_sample_matches_key_formula(spark, n, r0):
    df = spark.createDataFrame(
        [(i, "s0") for i in range(n)], ["doc_id", "source"]
    )
    got = {r["doc_id"] for r in stratified_sample(df, {"s0": r0}).collect()}
    want = {i for i in range(n) if _md5_key(i) < r0}
    assert got == want
    # weight 1000 keeps everything; 0 keeps nothing (boundary semantics)
    if r0 == 1000:
        assert got == set(range(n))
    if r0 == 0:
        assert got == set()
