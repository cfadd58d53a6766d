"""Format-reader tests: byte-exact roundtrips for the reference's DEFAULT
/ XVEC / TXT vector formats (DefinitionList.h:107-117), across value
types, plus multi-file parallelism."""

from __future__ import annotations

import os

import numpy as np
import pytest

from sptag_spark.sources.readers import (
    read_default_binary,
    read_txt_vectors,
    read_xvec,
    write_default_binary,
    write_xvec,
)


@pytest.fixture(scope="module")
def mats():
    rng = np.random.default_rng(42)
    return {
        "float32": rng.normal(0, 1, (100, 16)).astype(np.float32),
        "int8": rng.integers(-128, 128, (100, 16)).astype(np.int8),
        "uint8": rng.integers(0, 256, (100, 16)).astype(np.uint8),
        "int16": rng.integers(-1000, 1000, (100, 16)).astype(np.int16),
    }


@pytest.mark.parametrize("vt", ["float32", "int8", "uint8", "int16"])
def test_default_roundtrip(spark, tmp_path, mats, vt):
    d = tmp_path / f"default_{vt}"
    d.mkdir()
    write_default_binary(mats[vt], str(d / "part0.bin"), vt)
    got = read_default_binary(spark, str(d), vt).orderBy("row_id").toPandas()
    arr = np.array(got["vector"].tolist())
    assert np.array_equal(arr, mats[vt].astype(arr.dtype))


@pytest.mark.parametrize("vt", ["float32", "uint8"])
def test_xvec_roundtrip(spark, tmp_path, mats, vt):
    d = tmp_path / f"xvec_{vt}"
    d.mkdir()
    write_xvec(mats[vt], str(d / "part0.xvec"), vt)
    got = read_xvec(spark, str(d), vt).orderBy("row_id").toPandas()
    arr = np.array(got["vector"].tolist())
    assert np.array_equal(arr, mats[vt].astype(arr.dtype))


def test_default_multi_file_parallel(spark, tmp_path, mats):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(4):
        write_default_binary(mats["float32"][i * 25:(i + 1) * 25],
                             str(d / f"part{i}.bin"), "float32")
    df = read_default_binary(spark, str(d), "float32")
    assert df.count() == 100
    # one task per file: the scan parallelizes across files
    assert df.rdd.getNumPartitions() >= 2
    # per-file row ids restart at 0
    assert df.filter("row_id = 0").count() == 4


def test_txt_reader(spark, tmp_path):
    p = tmp_path / "vecs.txt"
    p.write_text("doc_a\t1.5|2.5|3.5\ndoc_b\t4.0|5.0|6.0\n")
    got = read_txt_vectors(spark, str(p), "float32").orderBy("metadata") \
        .collect()
    assert got[0]["metadata"] == "doc_a"
    assert got[0]["vector"] == [1.5, 2.5, 3.5]
    assert got[1]["vector"] == [4.0, 5.0, 6.0]


def test_txt_reader_int(spark, tmp_path):
    p = tmp_path / "ivecs.txt"
    p.write_text("m0\t1|2|3\n")
    got = read_txt_vectors(spark, str(p), "int8").collect()[0]
    assert got["vector"] == [1, 2, 3]


def test_xvec_corrupt_fails_loudly(spark, tmp_path, mats):
    d = tmp_path / "bad"
    d.mkdir()
    write_xvec(mats["float32"], str(d / "p.xvec"), "float32")
    with open(d / "p.xvec", "ab") as f:
        f.write(b"xx")  # trailing garbage
    with pytest.raises(Exception):
        read_xvec(spark, str(d), "float32").count()


def test_b64_vectors_round_trip(spark, tmp_path):
    """F8 base64 payload decode: unbase64 (JVM) + frombuffer (Arrow) must
    reproduce the written vectors byte-exactly, both dtypes."""
    import numpy as np

    from sptag_spark.sources.readers import read_b64_vectors, write_b64_vectors

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(20, 6)).astype(np.float32)
    p = str(tmp_path / "vecs_b64.txt")
    write_b64_vectors([f"m{i}" for i in range(20)], mat, p)
    got = {r["metadata"]: np.array(r["vector"], dtype=np.float32)
           for r in read_b64_vectors(spark, p).collect()}
    assert len(got) == 20
    for i in range(20):
        assert np.array_equal(got[f"m{i}"], mat[i])

    imat = rng.integers(-100, 100, size=(7, 4)).astype(np.int16)
    p2 = str(tmp_path / "ivecs_b64.txt")
    write_b64_vectors([str(i) for i in range(7)], imat, p2, "int16")
    got2 = {r["metadata"]: r["vector"] for r in
            read_b64_vectors(spark, p2, "int16").collect()}
    for i in range(7):
        assert got2[str(i)] == imat[i].tolist()


def test_b64_reader_blank_and_malformed_lines(spark, tmp_path):
    """Blank lines are dropped; a non-blank line without a payload column
    fails loudly, naming the metadata."""
    import numpy as np
    import pytest as _pytest

    from sptag_spark.sources.readers import read_b64_vectors, write_b64_vectors

    p = str(tmp_path / "v.txt")
    write_b64_vectors(["a", "b"], np.ones((2, 3), dtype=np.float32), p)
    with open(p, "a") as f:
        f.write("\n   \n")                 # blank lines: dropped
    assert read_b64_vectors(spark, p).count() == 2
    with open(p, "a") as f:
        f.write("orphan_line_no_tab\n")    # malformed: loud failure
    with _pytest.raises(Exception, match="orphan_line_no_tab"):
        read_b64_vectors(spark, p).count()


def test_list_to_matrix_matches_to_pylist_property():
    """Property: the zero-copy ingestion equals np.array(to_pylist) for
    any fixed-dim numeric list array, under slicing and both dtypes."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sptag_spark.functions.vecarrow import list_to_matrix

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=40),
        dim=st.integers(min_value=1, max_value=9),
        off=st.integers(min_value=0, max_value=10),
        float_src=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(n, dim, off, float_src, seed):
        rng = np.random.default_rng(seed)
        if float_src:
            data = rng.random((n + off, dim), dtype=np.float32)
            arr = pa.array([list(map(float, r)) for r in data],
                           type=pa.list_(pa.float32()))
            tgt = np.float64
        else:
            data = rng.integers(-10**6, 10**6, (n + off, dim))
            arr = pa.array([list(map(int, r)) for r in data],
                           type=pa.list_(pa.int64()))
            tgt = np.int64
        sliced = arr.slice(off, n)
        got = list_to_matrix(sliced, tgt)
        want = np.array(sliced.to_pylist(), dtype=tgt)
        if n == 0:
            assert got.size == 0
        else:
            assert got.shape == want.shape
            assert (got == want).all()

    check()


def test_list_to_matrix_element_nulls_keep_loud_contract():
    """Element-level nulls ([1.0, null, 2.0]) must fall back to the
    copying path: int64 targets raise TypeError (the old to_pylist
    behavior) instead of the values buffer silently casting NaN to
    INT64_MIN; float64 targets yield NaN, same as before."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from sptag_spark.functions.vecarrow import list_to_matrix

    arr = pa.array([[1.0, None, 2.0], [3.0, 4.0, 5.0]],
                   type=pa.list_(pa.float32()))
    with pytest.raises(TypeError):
        list_to_matrix(arr, np.int64)
    got = list_to_matrix(arr, np.float64)
    assert np.isnan(got[0, 1]) and got[1, 2] == 5.0


def test_np_quantize_matches_jvm_quantize(spark):
    """vecarrow.np_quantize must be BIT-identical to the JVM
    knn.quantize expression (round(x*1000D) HALF_UP) — kernels that
    ingest raw floats and quantize in numpy depend on it. Covers the
    HALF_UP/HALF_EVEN divergence: odd multiples of 0.0625 make
    x*1000 an exact k.5 tie (np.rint alone would round half of them
    the other way)."""
    import numpy as np

    from pyspark.sql import functions as F

    from sptag_spark.functions.vecarrow import np_quantize
    from sptag_spark.operators.knn import quantize

    rng = np.random.default_rng(7)
    ties = np.array([a * 0.0625 for a in
                     (-7, -5, -3, -1, 1, 3, 5, 7, 9, 1001)], np.float32)
    vals = np.concatenate([
        ties,
        rng.standard_normal(500).astype(np.float32),
        (rng.standard_normal(100) * 1e4).astype(np.float32),
        np.array([0.0, -0.0, 0.0005, -0.0005], np.float32),
    ])
    assert ((ties.astype(np.float64) * 1000.0) % 1 == 0.5).all()
    df = spark.createDataFrame(
        [(i, [float(v)]) for i, v in enumerate(vals)], "i long, v array<float>"
    )
    jvm = {r["i"]: r["q"][0] for r in
           df.select("i", quantize(F.col("v")).alias("q")).collect()}
    got = np_quantize(vals.reshape(-1, 1)).reshape(-1)
    for i, v in enumerate(vals):
        assert got[i] == jvm[i], (i, float(v), got[i], jvm[i])
