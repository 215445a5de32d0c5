"""Event-stream analytics (batch form).

The reference is strictly batch (SURVEY.md §2j), so these queries are
engine-extension surface: tumbling-window aggregation, JSON property
extraction, and gap-based sessionization. The batch semantics here are
the oracle-checkable mirror of the Structured Streaming pipelines in
``data_export_tool_spark.streaming`` (same windows, same outputs), so
correctness proven here transfers to the streaming path.

Sums of doubles are cast to DECIMAL so partial-aggregation order can't
perturb the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.queries import QuerySpec

DEC = "decimal(18,6)"


# --------------------------------------------------------------------------
# e01 — tumbling hourly windows per event type (streaming mirror:
# streaming.events.hourly_counts)
# --------------------------------------------------------------------------
def e01_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).load("events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


E01_ORACLE = """
SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


# --------------------------------------------------------------------------
# e02 — JSON property extraction + bucket rollup
# --------------------------------------------------------------------------
def e02_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).load("events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select((k / 10).cast("int").alias("k_decile"), "event_type")
        .groupBy("k_decile", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("k_decile", "event_type")
    )


E02_ORACLE = """
SELECT CAST(CAST(props->>'$.k' AS INT) // 10 AS INT) AS k_decile,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY k_decile, event_type
"""


# --------------------------------------------------------------------------
# e03 — gap-based sessionization (lag + cumulative conditional sum);
# streaming mirror: streaming.events.sessionize (applyInPandasWithState)
# --------------------------------------------------------------------------
_GAP_MS = 3_600_000  # 1 hour


def e03_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).load("events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").asc(), F.col("event_id").asc()
    )
    with_gap = ev.select(
        "user_id",
        "event_id",
        # the events parquet may carry TIMESTAMP or TIMESTAMP_NTZ
        # (driver-generated; the annotation changed between rounds) —
        # unix_millis only accepts TIMESTAMP, and with the session
        # pinned to UTC (session.py) the NTZ→TZ cast is wall-clock
        # exact, matching DuckDB's epoch_ms on the naive value
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    ).withColumn(
        "new_session",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms").over(w)) > _GAP_MS, 1
        ).otherwise(
            F.when(F.lag("ts_ms").over(w).isNull(), 1).otherwise(0)
        ),
    )
    sessions = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


E03_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_ms
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_ms,
         CASE WHEN prev_ms IS NULL THEN 1
              WHEN ts_ms - prev_ms > {_GAP_MS} THEN 1
              ELSE 0 END AS new_session
  FROM ordered
),
numbered AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts_ms ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = [
    QuerySpec("e01_events_hourly", e01_events_hourly, E01_ORACLE, "stream-mirror:window"),
    QuerySpec("e02_events_json_props", e02_events_json_props, E02_ORACLE, "json"),
    QuerySpec("e03_event_sessions", e03_event_sessions, E03_ORACLE, "window:lag/session"),
]
