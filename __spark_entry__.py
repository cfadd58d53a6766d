"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time enrichment on sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
twin for the correctness gate.

Cross-engine determinism rules used throughout (Spark and DuckDB must
produce hash-identical values):

- Floating-point SUMs over groups/frames are order- and association-
  dependent (DuckDB windows use segment trees; Spark streams frames), so
  any oracle-checked sum runs on exact integers: ``value`` has 2 decimals,
  ``CAST(ROUND(value*100) AS BIGINT)`` is exact in both engines.
- min/max/count/lag/lead/first/last and per-row arithmetic on doubles are
  bit-exact in both engines.
- Every window ordering carries a unique tiebreak column (event_id /
  doc_id), mirroring the reference's VID tiebreak (QueryResultSet.h:83-85).
- md5() agrees across engines and serves as the shared hash primitive for
  the dedup/LSH family.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-time enrichment of purchases with the latest
    prior click (as-of join) plus lag/rolling features — on sf0.001."""
    from sptag_spark.operators.asof import asof_join
    from sptag_spark.operators.windows import rolling_rows, with_lag_lead

    ev = _events(spark, "/root/testdata/sf0.001")
    probe = ev.filter("event_type='purchase'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type='click'").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join(probe, clicks, on="user_id", probe_ts="ts", data_ts="ts")
    out = with_lag_lead(out, ["user_id"], ["ts", "event_id"], ["click_value"], [1])
    out = rolling_rows(out, ["user_id"], ["ts", "event_id"], "click_value", 5,
                       aggs=("count", "min", "max"))
    return out


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_asof(strategy: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sptag_spark.operators.asof import asof_join

        ev = _events(spark, sf_dir)
        probe = ev.filter("event_type='purchase'").select(
            "event_id", "user_id", "ts"
        )
        clicks = ev.filter("event_type='click'").select(
            "user_id", "ts",
            F.col("value").alias("click_value"),
            F.col("event_id").alias("click_event_id"),
        )
        return asof_join(
            probe, clicks, on="user_id", probe_ts="ts", data_ts="ts",
            strategy=strategy,
        )
    return q


_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, c.ts AS matched_ts,
       c.value AS click_value, c.event_id AS click_event_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p
ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
                WHERE event_type='click') c
ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def _q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.windows import with_lag_lead

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return with_lag_lead(ev, ["user_id"], ["ts", "event_id"], ["value"], [1, 3])


_LAG_LEAD_ORACLE = """
SELECT event_id, user_id, ts, value,
       lag(value, 1)  OVER w AS lag_value_1,
       lead(value, 1) OVER w AS lead_value_1,
       lag(value, 3)  OVER w AS lag_value_3,
       lead(value, 3) OVER w AS lead_value_3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def _q_rolling_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.windows import rolling_rows

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return rolling_rows(
        ev, ["user_id"], ["ts", "event_id"], "cents", 5,
        aggs=("sum", "min", "max", "count"),
    )


_ROLLING_ROWS_ORACLE = """
SELECT event_id, user_id, ts, CAST(round(value*100) AS BIGINT) AS cents,
       CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS roll5r_sum_cents,
       min(CAST(round(value*100) AS BIGINT))   OVER w AS roll5r_min_cents,
       max(CAST(round(value*100) AS BIGINT))   OVER w AS roll5r_max_cents,
       count(CAST(round(value*100) AS BIGINT)) OVER w AS roll5r_count_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def _q_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.windows import rolling_range_seconds

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return rolling_range_seconds(
        ev, ["user_id"], "ts", "cents", 3600, aggs=("sum", "count", "min", "max")
    )


_ROLLING_RANGE_ORACLE = """
SELECT event_id, user_id, ts, CAST(round(value*100) AS BIGINT) AS cents,
       CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS roll3600s_sum_cents,
       count(CAST(round(value*100) AS BIGINT)) OVER w AS roll3600s_count_cents,
       min(CAST(round(value*100) AS BIGINT))   OVER w AS roll3600s_min_cents,
       max(CAST(round(value*100) AS BIGINT))   OVER w AS roll3600s_max_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.sessionize import sessionize

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    return sessionize(ev, keys=["user_id"], ts="ts", gap_seconds=1800)


_SESSIONIZE_ORACLE = """
WITH gaps AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts)) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events)
SELECT event_id, user_id, ts,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
         AS session_id
FROM gaps
"""


def _q_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.sessionize import session_aggregate

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return session_aggregate(
        ev, keys=["user_id"], ts="ts", gap_seconds=1800, value_col="cents"
    )


_SESSION_AGG_ORACLE = """
WITH gaps AS (
  SELECT event_id, user_id, ts, CAST(round(value*100) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts)) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events),
sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
            AS session_id
  FROM gaps)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_sec,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM sess GROUP BY user_id, session_id
"""


def _q_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.windows import backfill

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value")).alias("value"),
    )
    return backfill(ev, ["user_id"], ["ts", "event_id"], ["value"])


_BACKFILL_ORACLE = """
SELECT event_id, user_id, ts,
       CASE WHEN event_type='error' THEN NULL ELSE value END AS value,
       last_value(CASE WHEN event_type='error' THEN NULL ELSE value END
                  IGNORE NULLS) OVER w AS value_filled
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.topk import top_k_per_group

    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    return top_k_per_group(
        ev, keys=["user_id"],
        order_by=[F.col("value").desc(), F.col("event_id").asc()], k=3,
    )


_TOPK_ORACLE = """
SELECT * FROM (
  SELECT event_id, user_id, value,
         CAST(row_number() OVER (PARTITION BY user_id
              ORDER BY value DESC, event_id) AS INT) AS rank
  FROM events)
WHERE rank <= 3
"""


def _q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.topk import global_top_k

    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    return global_top_k(ev, [F.col("value").desc(), F.col("event_id").asc()], 100)


_GLOBAL_TOPK_ORACLE = """
SELECT event_id, user_id, value FROM events
ORDER BY value DESC, event_id LIMIT 100
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_join_union": _q_asof("union"),
        "asof_join_broadcast": _q_asof("broadcast"),
        "asof_join_merge": _q_asof("merge"),
        "lag_lead": _q_lag_lead,
        "rolling_rows": _q_rolling_rows,
        "rolling_range_1h": _q_rolling_range,
        "sessionize": _q_sessionize,
        "session_agg": _q_session_agg,
        "backfill": _q_backfill,
        "topk_per_group": _q_topk_per_group,
        "global_topk": _q_global_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "asof_join_union": _ASOF_ORACLE,
        "asof_join_broadcast": _ASOF_ORACLE,
        "asof_join_merge": _ASOF_ORACLE,
        "lag_lead": _LAG_LEAD_ORACLE,
        "rolling_rows": _ROLLING_ROWS_ORACLE,
        "rolling_range_1h": _ROLLING_RANGE_ORACLE,
        "sessionize": _SESSIONIZE_ORACLE,
        "session_agg": _SESSION_AGG_ORACLE,
        "backfill": _BACKFILL_ORACLE,
        "topk_per_group": _TOPK_ORACLE,
        "global_topk": _GLOBAL_TOPK_ORACLE,
    }
