"""Catalog: windowed aggregations (streaming extension, batch-checked).

window()/session_window() are ordinary expressions, so the SAME
operators that run under readStream (streaming/windows.py) run here in
batch against the DuckDB oracle — the strongest check available for
streaming semantics (the reference has none to compare against)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table
from hadoop_2_10_0_src_mapreduce_spark.streaming.windows import (
    session_window_agg,
    sliding_window_counts,
    tumbling_window_counts,
)

_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@register("window_tumbling", _TUMBLING_ORACLE, tags=("streaming", "window"),
          doc="Tumbling 1-day windows per event_type (streaming-capable expression, batch-checked).")
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_window_counts(ev).orderBy("window_start", "event_type")


# sliding 2d/1d: every event belongs to exactly two windows — the one
# starting at its day-bucket and the one a slide earlier.
_SLIDING_ORACLE = """
SELECT wstart AS window_start, event_type, COUNT(*) AS n_events
FROM (
    SELECT unnest([
               time_bucket(INTERVAL '1 day', ts),
               time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day'
           ]) AS wstart,
           event_type
    FROM events
)
GROUP BY wstart, event_type
ORDER BY wstart, event_type
"""


@register("window_sliding", _SLIDING_ORACLE, tags=("streaming", "window"),
          doc="Sliding 2-day/1-day windows per event_type; oracle expands each event into its two windows.")
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_window_counts(ev).orderBy("window_start", "event_type")


# session_window(gap 12h) ≡ the sessionize_reduce oracle's gap logic;
# session_start = MIN(ts) of the session.
_SESSION_ORACLE = """
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM (
    SELECT user_id, ts,
           SUM(CASE WHEN prev_ts IS NULL
                      OR ts - prev_ts > INTERVAL 720 MINUTE
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts) AS session_no
    FROM (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events
    )
)
GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


@register("window_session", _SESSION_ORACLE, tags=("streaming", "window"),
          doc="Built-in session_window (12h gap) per user — declarative twin of the applyInPandas sessionizer, same oracle.")
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_window_agg(ev).orderBy("user_id", "session_start")
