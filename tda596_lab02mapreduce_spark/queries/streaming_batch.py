"""Windowed event-time aggregations, batch form (SURVEY.md §2B
streaming row). The SAME functions run over readStream in
tests/test_streaming.py (batch-vs-stream invariance); here they run
in batch mode so the DuckDB oracle can check the window semantics
(time_bucket / unnested buckets / gaps-and-islands sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register
from tda596_lab02mapreduce_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


@register(
    "stream_tumbling_hourly",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1h windows per event type (same function drives the streaming test).",
    tags=("streaming", "window"),
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(io.load(spark, sf_dir, "events"))


@register(
    "stream_sliding_2h",
    oracle="""
SELECT ws AS window_start, CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT unnest([
           time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
           time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) - INTERVAL '1 hour'
         ]) AS ws
  FROM events
) t
GROUP BY ws
""",
    doc="Sliding 2h/1h windows: every event contributes to exactly two windows.",
    tags=("streaming", "window"),
)
def stream_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(io.load(spark, sf_dir, "events"))


@register(
    "stream_session_10m",
    oracle="""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '10 minutes' AS session_end,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess
GROUP BY user_id, sess_id
""",
    doc=(
        "Session windows (10 min inactivity gap) per user; oracle is the "
        "gaps-and-islands sessionization. Spark closes a session at "
        "last_event + gap, so a follow-up event exactly `gap` later starts a "
        "new session (>= in the oracle's gap test)."
    ),
    tags=("streaming", "window", "session"),
)
def stream_session_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(io.load(spark, sf_dir, "events"))
