"""Catalog: UDF surface (SURVEY.md §2.10) — pipe, per-group reduce
with secondary sort (sessionization), pandas UDAF."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions import udf as udfmod
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table

# --- Hadoop Streaming pipe (any-language UDF over stdin/stdout) ------

_PIPE_ORACLE = """
SELECT upper(lang) AS value, COUNT(*) AS cnt
FROM documents
GROUP BY upper(lang)
ORDER BY value
"""


@register("pipe_streaming", _PIPE_ORACLE, tags=("udf",),
          doc="rdd.pipe parity with Hadoop Streaming: `tr a-z A-Z` as the 'mapper command', then count.")
def pipe_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang")
    piped = udfmod.pipe_lines(docs, "tr 'a-z' 'A-Z'")
    return (
        piped.groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("value")
    )


# --- Sessionization (secondary-sort reducer, batch) ------------------

_GAP_MIN = 720  # 12h — events average ~10.7h apart per user, so this splits

_SESSIONIZE_ORACLE = f"""
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM (
    SELECT user_id, ts,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                      OR ts - prev_ts > INTERVAL {_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts) - 1 AS BIGINT) AS session_id
    FROM (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events
    )
)
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register("sessionize_reduce", _SESSIONIZE_ORACLE, tags=("udf", "secondary-sort"),
          doc="SecondarySort reducer parity: per-user time-ordered gap sessionization via applyInPandas.")
def sessionize_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return udfmod.sessionize(ev, gap_minutes=_GAP_MIN).orderBy("user_id", "session_id")


# --- Custom UDAF via pandas_udf GROUPED_AGG --------------------------

_UDAF_ORACLE = """
SELECT event_type, MAX(value) - MIN(value) AS value_range
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("pandas_udaf_range", _UDAF_ORACLE, tags=("udf", "agg"),
          doc="UserDefinedValueAggregatorDescriptor parity: custom UDAF (value range) as Arrow-batched grouped-agg pandas_udf.")
def pandas_udaf_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    # grouped-agg pandas UDFs can't share an agg() with built-ins —
    # keep the UDAF alone (Spark limitation, not a semantic one)
    @F.pandas_udf("double")
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (
        ev.groupBy("event_type")
        .agg(value_range("value").alias("value_range"))
        .orderBy("event_type")
    )
