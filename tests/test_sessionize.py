"""Gap-based sessionization vs DuckDB cumulative-sum oracle."""

from __future__ import annotations

from sptag_spark.operators.sessionize import session_aggregate, sessionize
from tests.util import assert_df_equal

SESS_ORACLE = """
WITH gaps AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   > {gap} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT event_id, user_id, ts, value,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
         AS session_id
FROM gaps
"""


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "ts", "value"
    )


def test_sessionize_30min(spark, ddb):
    got = sessionize(_events(spark), keys=["user_id"], ts="ts", gap_seconds=1800)
    assert_df_equal(got, ddb.sql(SESS_ORACLE.format(gap=1800)).df())


def test_session_aggregate(spark, ddb):
    got = session_aggregate(
        _events(spark), keys=["user_id"], ts="ts", gap_seconds=1800,
        value_col="value",
    )
    want = ddb.sql(f"""
        WITH sess AS ({SESS_ORACLE.format(gap=1800)})
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_sec,
               sum(value) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """).df()
    assert_df_equal(got, want)


def test_session_boundaries_strictly_greater(spark):
    """Gap exactly == threshold does NOT start a new session."""
    rows = [("u", 0), ("u", 1800), ("u", 3601)]
    df = spark.createDataFrame(rows, "k string, t long").selectExpr(
        "k", "timestamp_seconds(t) AS ts"
    )
    got = (
        sessionize(df, keys=["k"], ts="ts", gap_seconds=1800)
        .orderBy("ts")
        .select("session_id")
        .toPandas()["session_id"]
        .tolist()
    )
    assert got == [0, 0, 1]
