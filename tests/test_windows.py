"""lag/lead, rolling frames, backfill vs DuckDB window SQL oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from sptag_spark.operators.windows import (
    backfill,
    rolling_range_seconds,
    rolling_rows,
    with_lag_lead,
)
from tests.util import assert_df_equal


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )


def test_lag_lead(spark, ddb):
    got = with_lag_lead(
        _events(spark), keys=["user_id"], order_by=["ts", "event_id"],
        cols=["value"], offsets=[1, 2],
    )
    want = ddb.sql("""
        SELECT event_id, user_id, ts, value, event_type,
               lag(value, 1)  OVER w AS lag_value_1,
               lead(value, 1) OVER w AS lead_value_1,
               lag(value, 2)  OVER w AS lag_value_2,
               lead(value, 2) OVER w AS lead_value_2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """).df()
    assert_df_equal(got, want)


def test_rolling_rows(spark, ddb):
    got = rolling_rows(
        _events(spark), keys=["user_id"], order_by=["ts", "event_id"],
        col="value", n_rows=5, aggs=("sum", "avg", "min", "max", "count"),
    )
    want = ddb.sql("""
        SELECT event_id, user_id, ts, value, event_type,
               sum(value)   OVER w AS roll5r_sum_value,
               avg(value)   OVER w AS roll5r_avg_value,
               min(value)   OVER w AS roll5r_min_value,
               max(value)   OVER w AS roll5r_max_value,
               count(value) OVER w AS roll5r_count_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """).df()
    assert_df_equal(got, want, rtol=1e-9)


def test_rolling_range_1h(spark, ddb):
    got = rolling_range_seconds(
        _events(spark), keys=["user_id"], ts="ts", col="value",
        window_seconds=3600, aggs=("count", "min", "max"),
    )
    want = ddb.sql("""
        SELECT event_id, user_id, ts, value, event_type,
               count(value) OVER w AS roll3600s_count_value,
               min(value)   OVER w AS roll3600s_min_value,
               max(value)   OVER w AS roll3600s_max_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """).df()
    assert_df_equal(got, want)


def test_backfill(spark, ddb):
    ev = _events(spark).withColumn(
        "value", F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    )
    got = backfill(ev, keys=["user_id"], order_by=["ts", "event_id"], cols=["value"])
    want = ddb.sql("""
        SELECT event_id, user_id, ts,
               CASE WHEN event_type='error' THEN NULL ELSE value END AS value,
               event_type,
               last_value(CASE WHEN event_type='error' THEN NULL ELSE value END
                          IGNORE NULLS) OVER w AS value_filled
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """).df()
    assert_df_equal(got, want)


def test_all_features_share_one_shuffle(spark):
    """Scale guard: stacking lag/lead + rolling + backfill on the same keys
    must plan a single Exchange (one shuffle, one sort, one window pass
    chain)."""
    df = _events(spark)
    df = with_lag_lead(df, ["user_id"], ["ts", "event_id"], ["value"], [1])
    df = rolling_rows(df, ["user_id"], ["ts", "event_id"], "value", 5)
    df = backfill(df, ["user_id"], ["ts", "event_id"], ["value"])
    from tests.util import count_exchanges

    assert count_exchanges(df) <= 1
