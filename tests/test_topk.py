"""Grouped / global top-k vs DuckDB row_number oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from sptag_spark.operators.topk import global_top_k, top_k_per_group
from tests.util import assert_df_equal


def test_top3_per_user_by_value(spark, ddb):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "value"
    )
    got = top_k_per_group(
        ev, keys=["user_id"],
        order_by=[F.col("value").desc(), F.col("event_id").asc()], k=3,
    )
    want = ddb.sql("""
        SELECT * FROM (
          SELECT event_id, user_id, value,
                 CAST(row_number() OVER (PARTITION BY user_id
                      ORDER BY value DESC, event_id) AS INT) AS rank
          FROM events)
        WHERE rank <= 3
    """).df()
    assert_df_equal(got, want)


def test_global_top_k_is_take_ordered(spark, ddb):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "value"
    )
    got = global_top_k(ev, [F.col("value").desc(), F.col("event_id")], 10)
    want = ddb.sql(
        "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 10"
    ).df()
    assert_df_equal(got, want)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()
