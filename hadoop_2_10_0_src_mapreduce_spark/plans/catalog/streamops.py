"""Catalog: windowed aggregations (streaming extension, batch-checked).

window()/session_window() are ordinary expressions, so the SAME
operators that run under readStream (streaming/windows.py) run here in
batch against the DuckDB oracle — the strongest check available for
streaming semantics (the reference has none to compare against)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table
from hadoop_2_10_0_src_mapreduce_spark.streaming.windows import (
    session_window_agg,
    sliding_window_counts,
    tumbling_window_counts,
)

# Tumbling 1-day + sliding 2-day/1-day windows in one query (merged to
# fit the driver's 50-checked-query window; each branch is its own
# window() aggregate). Sliding: every event belongs to exactly two
# windows — the one starting at its day-bucket and the one a slide
# earlier; the oracle expands each event into both.
_TUMBLING_SLIDING_ORACLE = """
SELECT mode, window_start, event_type, n_events FROM (
    SELECT 'tumbling' AS mode,
           time_bucket(INTERVAL '1 day', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY window_start, event_type
    UNION ALL
    SELECT 'sliding' AS mode, wstart AS window_start, event_type,
           COUNT(*) AS n_events
    FROM (
        SELECT unnest([
                   time_bucket(INTERVAL '1 day', ts),
                   time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day'
               ]) AS wstart,
               event_type
        FROM events
    )
    GROUP BY wstart, event_type
)
ORDER BY mode, window_start, event_type
"""


@register("window_tumbling_sliding", _TUMBLING_SLIDING_ORACLE, tags=("streaming", "window"),
          doc="Tumbling 1-day and sliding 2-day/1-day windows per event_type (streaming-capable expressions, batch-checked), unioned under a mode column.")
def window_tumbling_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tumbling = tumbling_window_counts(ev).select(
        F.lit("tumbling").alias("mode"), "window_start", "event_type", "n_events"
    )
    sliding = sliding_window_counts(ev).select(
        F.lit("sliding").alias("mode"), "window_start", "event_type", "n_events"
    )
    return tumbling.unionByName(sliding).orderBy("mode", "window_start", "event_type")


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
