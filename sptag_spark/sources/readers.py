"""Readers for the reference's on-disk vector formats.

A user of the reference holds data in three formats (DefinitionList.h:
107-117); each gets a distributed Spark reader emitting the engine's
standard frame (id, vector array, optional metadata):

- DEFAULT: one file = [int32 rows][int32 dim][row-major data]
  (src/Helper/VectorSetReaders/DefaultReader.cpp). Read via binaryFile +
  mapInArrow numpy frombuffer — one Arrow batch per file, rows exploded
  vectorized.
- XVEC: per record [int32 dim][dim elements]
  (XvecReader.cpp; the classic .fvecs/.ivecs layout). Same path with a
  stride walk.
- TXT: `metadata\\tv1|v2|...` one record per line (TxtReader.cpp:48-200).
  Pure DataFrame ops: spark.read.text -> split/cast — Catalyst splits
  lines in parallel exactly like the reference's chunked parallel parse.

DEFAULT/XVEC are one-blob-per-file formats, so per-file parallelism is
the unit of scale (many files -> many tasks), matching how the reference
shards SSD builds across m_ssdIndexFileNum files.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_NP_TYPES = {
    "float32": np.float32,
    "int8": np.int8,
    "uint8": np.uint8,
    "int16": np.int16,
}
_SPARK_ELEM = {
    "float32": FloatType(),
    "int8": IntegerType(),
    "uint8": IntegerType(),
    "int16": IntegerType(),
}


def _vector_schema(value_type: str) -> StructType:
    return StructType([
        StructField("file", StringType()),
        StructField("row_id", LongType()),
        StructField("vector", ArrayType(_SPARK_ELEM[value_type])),
    ])


def read_default_binary(
    spark: SparkSession, path: str, value_type: str = "float32"
) -> DataFrame:
    """DEFAULT format: header [rows:int32][dim:int32], row-major body."""
    np_t = _NP_TYPES[value_type]
    out_schema = _vector_schema(value_type)

    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for fname, content in zip(
                batch.column("path"), batch.column("content")
            ):
                buf = bytes(content.as_py())
                rows, dim = np.frombuffer(buf, dtype=np.int32, count=2)
                mat = np.frombuffer(
                    buf, dtype=np_t, offset=8, count=rows * dim
                ).reshape(rows, dim)
                if np_t != np.float32:
                    mat = mat.astype(np.int32)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([fname.as_py()] * rows),
                        pa.array(np.arange(rows, dtype=np.int64)),
                        pa.array(list(mat)),
                    ],
                    names=["file", "row_id", "vector"],
                )

    blobs = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return blobs.mapInArrow(parse, schema=out_schema)


def read_xvec(
    spark: SparkSession, path: str, value_type: str = "float32"
) -> DataFrame:
    """XVEC format: per record [dim:int32][dim elements] (fvecs/ivecs)."""
    np_t = _NP_TYPES[value_type]
    elem_size = np.dtype(np_t).itemsize
    out_schema = _vector_schema(value_type)

    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for fname, content in zip(
                batch.column("path"), batch.column("content")
            ):
                buf = bytes(content.as_py())
                dim = int(np.frombuffer(buf, dtype=np.int32, count=1)[0])
                rec = 4 + dim * elem_size
                assert len(buf) % rec == 0, "corrupt xvec file"
                n = len(buf) // rec
                raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, rec)
                mat = raw[:, 4:].copy().view(np_t).reshape(n, dim)
                # every record's dim prefix must agree (XvecReader.cpp
                # errors on mismatch)
                dims = raw[:, :4].copy().view(np.int32).ravel()
                assert (dims == dim).all(), "xvec dim mismatch"
                if np_t != np.float32:
                    mat = mat.astype(np.int32)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([fname.as_py()] * n),
                        pa.array(np.arange(n, dtype=np.int64)),
                        pa.array(list(mat)),
                    ],
                    names=["file", "row_id", "vector"],
                )

    blobs = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return blobs.mapInArrow(parse, schema=out_schema)


def read_txt_vectors(
    spark: SparkSession,
    path: str,
    value_type: str = "float32",
    delimiter: str = "|",
) -> DataFrame:
    """TXT format: `metadata\\tv1|v2|...` — pure column expressions."""
    import re

    cast_to = "float" if value_type == "float32" else "int"
    lines = spark.read.text(path)
    tab = F.split(F.col("value"), "\t", 2)
    return lines.select(
        tab.getItem(0).alias("metadata"),
        F.transform(
            # split() takes a regex — escape the literal delimiter
            F.split(tab.getItem(1), re.escape(delimiter)),
            lambda x: x.cast(cast_to),
        ).alias("vector"),
    )


def write_default_binary(df_pandas, path: str, value_type: str = "float32") -> None:
    """Test/export helper: write a (n, dim) matrix in DEFAULT format."""
    mat = np.ascontiguousarray(df_pandas, dtype=_NP_TYPES[value_type])
    with open(path, "wb") as f:
        f.write(np.array(mat.shape, dtype=np.int32).tobytes())
        f.write(mat.tobytes())


def write_xvec(df_pandas, path: str, value_type: str = "float32") -> None:
    """Test/export helper: write records in XVEC format."""
    mat = np.ascontiguousarray(df_pandas, dtype=_NP_TYPES[value_type])
    dim = np.array([mat.shape[1]], dtype=np.int32)
    with open(path, "wb") as f:
        for row in mat:
            f.write(dim.tobytes())
            f.write(row.tobytes())


def read_b64_vectors(
    spark: SparkSession,
    path: str,
    value_type: str = "float32",
) -> DataFrame:
    """Base64-payload TXT format: `metadata\\t<base64(packed little-endian
    vector)>` — the reference's F8 base64 metadata/payload decode
    (Helper/Base64Encode, used by the socket/REST transport). The base64
    → binary step is the JVM `unbase64` expression; unpacking the fixed-
    width binary into a typed array is one np.frombuffer per Arrow batch.
    """
    import pyarrow as pa

    np_t = _NP_TYPES[value_type]
    arrow_t = pa.float32() if value_type == "float32" else pa.int32()
    out_schema = StructType([
        StructField("metadata", StringType()),
        StructField("vector", ArrayType(_SPARK_ELEM[value_type])),
    ])

    # blank lines are dropped; a NON-blank line without a payload column
    # raises with the offending metadata instead of letting
    # np.frombuffer(None) kill the task with an opaque traceback
    lines = spark.read.text(path).filter(
        F.length(F.trim(F.col("value"))) > 0
    )
    tab = F.split(F.col("value"), "\t", 2)
    # F.get (not getItem): a line without a tab must surface as a NULL
    # payload for the named error below, not an ANSI array-index crash
    decoded = lines.select(
        F.get(tab, 0).alias("metadata"),
        F.unbase64(F.get(tab, 1)).alias("_raw"),
    )

    def unpack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            raw = batch.column("_raw")
            if isinstance(raw, pa.ChunkedArray):
                raw = raw.combine_chunks()
            metas = batch.column("metadata")
            vecs = []
            for meta, buf in zip(metas, raw):
                b = buf.as_py()
                if b is None:
                    raise ValueError(
                        f"b64 vector line without a payload column: "
                        f"metadata={meta.as_py()!r}"
                    )
                vecs.append(np.frombuffer(b, dtype=np_t))
            yield pa.RecordBatch.from_arrays(
                [metas,
                 pa.array([v.tolist() for v in vecs],
                          pa.list_(arrow_t))],
                names=["metadata", "vector"],
            )

    return decoded.mapInArrow(unpack, schema=out_schema)


def write_b64_vectors(metadata, mat, path: str,
                      value_type: str = "float32") -> None:
    """Test/export helper: `metadata\\tbase64(vector bytes)` lines."""
    import base64

    m = np.ascontiguousarray(mat, dtype=_NP_TYPES[value_type])
    with open(path, "w") as f:
        for meta, row in zip(metadata, m):
            f.write(f"{meta}\t{base64.b64encode(row.tobytes()).decode()}\n")
