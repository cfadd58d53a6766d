"""Text-analysis kernel tests on hand-built strings with exact expected
values (reference deterministic-golden style, AlgoTest.cpp:175-245)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sptag_spark.functions.text import (
    normalize_text,
    with_lang_id,
    with_text_stats,
    word_shingles,
)


@pytest.fixture(scope="module")
def one(spark):
    def run(text, col):
        df = spark.createDataFrame([(text,)], ["text"])
        return df.select(col.alias("v")).collect()[0]["v"]
    return run


def test_text_stats_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat, the cat ran!")], ["doc_id", "text"]
    )
    row = with_text_stats(df).collect()[0]
    assert row["n_ws_tokens"] == 6
    # BPE-ish: the|cat|sat|,|the|cat|ran|!
    assert row["n_bpe_tokens"] == 8
    assert row["n_distinct_tokens"] == 4   # {the, cat, 'sat,', 'ran!'}
    assert row["n_stopwords"] == 2          # 'the' twice
    assert row["n_punct"] == 2              # ',' and '!'
    assert row["punct_ratio"] == 2 / len("the cat sat, the cat ran!")


def test_quality_score_formula(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    row = with_text_stats(df).collect()[0]
    # distinct 3/3, stopwords: 'a' -> 1/3, punct 0
    assert row["quality_score"] == pytest.approx(
        1.0 * 0.4 + (1 / 3) * 0.4 + 1.0 * 0.2
    )


def test_normalize(one):
    assert one("  Hello,   WORLD!! 42 ", normalize_text(F.col("text"))) \
        == "hello world 42"


def test_shingles(one):
    assert sorted(one("a b c d", word_shingles(F.col("text"), 3))) \
        == ["a b c", "b c d"]
    # shorter than n -> whole normalized text as the one shingle
    assert one("a b", word_shingles(F.col("text"), 3)) == ["a b"]
    # duplicates collapse (distinct shingle set)
    assert one("x y x y x y x y", word_shingles(F.col("text"), 3)) \
        == ["x y x", "y x y"]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "le chat et la maison les fleurs"),
            (3, "der hund und die katze ist nicht"),
            (4, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_guess"] for r in with_lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "und"


def test_lang_id_tiebreak_lexicographic(spark):
    # 'la' is a marker for both es and fr; equal scores -> 'es' (sorted first)
    df = spark.createDataFrame([(1, "la la")], ["doc_id", "text"])
    assert with_lang_id(df).collect()[0]["lang_guess"] == "es"


def test_word_shingles_null_and_empty_text(spark):
    """NULL text yields [null] (downstream isnotnull filters drop it);
    empty text yields [''] — the two must NOT collapse to the same
    shingle set or every dedup would merge null-text docs with
    empty-text docs."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from sptag_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two")],
        StructType([StructField("doc_id", StringType()),
                    StructField("text", StringType())]),
    )
    out = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", word_shingles(F.col("text")).alias("sh")).collect()}
    assert out["1"] == [None]
    assert out["2"] == [""]
    assert out["3"] == ["one two"]


def test_fingerprints_arrow_bit_identical(spark):
    """The fused fingerprint kernel must equal the JVM expression pair
    char-for-char (same normalized bytes -> same md5 hex)."""
    from pyspark.sql import functions as F

    from sptag_spark.functions.text import (
        doc_fingerprint, fingerprints_arrow, shingle_min_fingerprint,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    expr = {r["doc_id"]: (r["fp"], r["m"]) for r in docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp"),
        shingle_min_fingerprint(F.col("text")).alias("m")).collect()}
    got = {r["doc_id"]: (r["fp"], r["minhash1"])
           for r in fingerprints_arrow(docs).collect()}
    assert expr == got and len(got) == docs.count()
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    edge = spark.createDataFrame(
        [(1, "short one"), (2, ""), (3, None)],
        StructType([StructField("doc_id", LongType()),
                    StructField("text", StringType())]),
    )
    e = {r["doc_id"]: (r["fp"], r["m"]) for r in edge.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp"),
        shingle_min_fingerprint(F.col("text")).alias("m")).collect()}
    g = {r["doc_id"]: (r["fp"], r["minhash1"])
         for r in fingerprints_arrow(edge).collect()}
    assert e == g and g[3] == (None, None)


def test_with_text_stats_arrow_bit_identical(spark):
    """Arrow twin of with_text_stats: exact ints, same-order IEEE
    doubles, NULL text -> all NULL, empty text -> NULL
    punct_ratio/quality_score."""
    import math

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sptag_spark.functions.text import (
        with_text_stats, with_text_stats_arrow,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    edge = spark.createDataFrame(
        [(100001, ""), (100002, None), (100003, "  x \t Y!  "),
         (100004, "a"), (100005, "the the the of 42 . ,"),
         # leading/trailing NON-SPACE whitespace: Spark's trim strips
         # only spaces (SPARK-17299) so these produce empty edge tokens
         (100006, "\tx y\n"), (100007, "\n\nx x x\n"),
         (100008, "\t"), (100009, " \t mixed pad\r\n ")],
        StructType([StructField("doc_id", LongType()),
                    StructField("text", StringType())]),
    )
    src = docs.select("doc_id", "text").unionByName(edge)

    def key(rows):
        out = {}
        for r in rows:
            d = r.asDict()
            out[d.pop("doc_id")] = tuple(
                (v if not isinstance(v, float) or not math.isnan(v)
                 else "nan")
                for v in (d[c] for c in sorted(d)))
        return out

    a = key(with_text_stats(src).collect())
    b = key(with_text_stats_arrow(src).collect())
    assert a == b and len(a) == src.count()


def test_with_lang_id_arrow_bit_identical(spark):
    """Arrow lang-id kernel vs the expression twin: same scores, same
    argmax/tiebreak/und semantics, NULL text -> NULL scores + 'und'."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sptag_spark.functions.text import with_lang_id, with_lang_id_expr

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text")
    cols = ["doc_id", "score_de", "score_en", "score_es", "score_fr",
            "lang_guess"]
    want = {tuple(r[c] for c in cols)
            for r in with_lang_id_expr(docs).collect()}
    got = {tuple(r[c] for c in cols) for r in with_lang_id(docs).collect()}
    assert got == want
    edge = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "\t la \n"),
         (5, "la la le el"), (6, "und und und"), (7, "the der el le"),
         (8, " de y que en la ")],
        StructType([StructField("doc_id", LongType()),
                    StructField("text", StringType())]),
    )
    e = {tuple(r[c] for c in cols)
         for r in with_lang_id_expr(edge).collect()}
    g = {tuple(r[c] for c in cols) for r in with_lang_id(edge).collect()}
    assert g == e


def test_doc_fingerprint_arrow_bit_identical(spark):
    """Lean fp-only kernel vs the JVM md5(normalize) expression."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sptag_spark.functions.text import doc_fingerprint, doc_fingerprint_arrow

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    want = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    got = {r["doc_id"]: r["fp"]
           for r in doc_fingerprint_arrow(docs).collect()}
    assert got == want
    edge = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  UPPER, case!  "), (4, "\tx\n")],
        StructType([StructField("doc_id", LongType()),
                    StructField("text", StringType())]),
    )
    e = {r["doc_id"]: r["fp"] for r in edge.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    g = {r["doc_id"]: r["fp"] for r in doc_fingerprint_arrow(edge).collect()}
    assert g == e and g[1] is None
