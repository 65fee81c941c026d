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


# --- Sessionization + cogroup reduce (secondary-sort reducers) --------
# Two branches under a branch column (the scan_fixed_multi merge
# pattern — registry stays at 50):
# 'session' — per-user time-ordered gap sessionization (the bounded-
#             memory mapInPandas reducer).
# 'cogroup' — DATAJOIN multi-input-reduce parity (udf.cogroup_reduce):
#             clicks and errors cogrouped per user; the reducer counts
#             the clicks STRICTLY after the user's last error (all
#             clicks if the user never errored) — asymmetric per-key
#             merge logic written imperatively, emitted one row per
#             user present on EITHER side (session_id rides as -1;
#             start_ts = last error, end_ts = last counted click).
#             The oracle re-derives it declaratively (left join + full
#             outer), so the hash check proves the imperative reducer
#             equals the relational semantics.
# 'funnel'  — ordered view→click→purchase conversion depth per user
#             (operators.timeseries.funnel: chained earliest-after
#             min+join rounds, users-not-events ride the joins) over
#             the value≥_FUNNEL_MIN_VALUE event subset so real
#             drop-offs occur;
#             session_id/n_events carry stages_completed, start_ts/
#             end_ts the first/deepest completion. Oracle replays the
#             same chained min-after CTEs.

_GAP_MIN = 720  # 12h — events average ~10.7h apart per user, so this splits

# funnel branch event-subset threshold — interpolated into BOTH the
# Spark side and every oracle occurrence so the two can never drift
# (150 chosen because the fixture then shows real drop-offs: 39/22/3
# at sf0.01; the vacuous-gate lesson in SURVEY §8)
_FUNNEL_MIN_VALUE = 150

# 'afunnel' (r7): funnel(anchor="any") — EXISTS-A-CHAIN semantics —
# over the FULL event set with this conversion window. Gap chosen by
# measurement so the branch is non-vacuous at the gate sf AND differs
# from the fixed-anchor 'funnel' semantics: at sf0.01, depths
# 20/96/34 vs anchor="first"'s 124/23/3 — 107 users differ (sf0.001:
# 10 differ; the vacuous-gate lesson again). The oracle replays the
# per-stage window scan exactly: union reachable-prev (marked) with
# candidates, running MAX of marked ts over (ts, marker ASC) rows =
# latest STRICTLY-earlier reachable predecessor, keep candidates
# within the gap.
_AFUNNEL_GAP = 480

_SESSIONIZE_ORACLE = f"""
WITH le AS (
    SELECT user_id, MAX(ts) AS last_err
    FROM events WHERE event_type = 'error' GROUP BY user_id
),
cl AS (
    SELECT c.user_id, c.ts, le.last_err
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    LEFT JOIN le USING (user_id)
),
ca AS (
    SELECT user_id,
           COUNT(CASE WHEN last_err IS NULL OR ts > last_err THEN 1 END) AS n,
           MAX(CASE WHEN last_err IS NULL OR ts > last_err THEN ts END) AS end_ts
    FROM cl GROUP BY user_id
),
fev AS (
    SELECT user_id, ts, event_type FROM events
    WHERE value >= {_FUNNEL_MIN_VALUE}
),
f0 AS (
    SELECT user_id, MIN(ts) AS ts0 FROM fev
    WHERE event_type = 'view' GROUP BY user_id
),
f1 AS (
    SELECT e.user_id, MIN(e.ts) AS ts1
    FROM fev e JOIN f0 ON e.user_id = f0.user_id
    WHERE e.event_type = 'click' AND e.ts > f0.ts0
    GROUP BY e.user_id
),
f2 AS (
    SELECT e.user_id, MIN(e.ts) AS ts2
    FROM fev e JOIN f1 ON e.user_id = f1.user_id
    WHERE e.event_type = 'purchase' AND e.ts > f1.ts1
    GROUP BY e.user_id
),
aev AS (SELECT user_id, ts, event_type FROM events WHERE ts IS NOT NULL),
a0 AS (SELECT user_id, ts FROM aev WHERE event_type = 'view'),
ar1 AS (
    SELECT user_id, ts FROM (
        SELECT user_id, ts, src,
               MAX(CASE WHEN src = 1 THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, src
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lp
        FROM (
            SELECT user_id, ts, 1 AS src FROM a0
            UNION ALL
            SELECT user_id, ts, 0 AS src FROM aev
            WHERE event_type = 'click'
        )
    ) WHERE src = 0 AND lp IS NOT NULL
          AND ts <= lp + INTERVAL {_AFUNNEL_GAP} MINUTE
),
ar2 AS (
    SELECT user_id, ts FROM (
        SELECT user_id, ts, src,
               MAX(CASE WHEN src = 1 THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, src
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lp
        FROM (
            SELECT user_id, ts, 1 AS src FROM ar1
            UNION ALL
            SELECT user_id, ts, 0 AS src FROM aev
            WHERE event_type = 'purchase'
        )
    ) WHERE src = 0 AND lp IS NOT NULL
          AND ts <= lp + INTERVAL {_AFUNNEL_GAP} MINUTE
),
a0m AS (SELECT user_id, MIN(ts) AS ts0 FROM a0 GROUP BY user_id),
a1m AS (SELECT user_id, MIN(ts) AS ts1 FROM ar1 GROUP BY user_id),
a2m AS (SELECT user_id, MIN(ts) AS ts2 FROM ar2 GROUP BY user_id)
SELECT branch, user_id, session_id, n_events, start_ts, end_ts FROM (
    SELECT 'session' AS branch, user_id, session_id, COUNT(*) AS n_events,
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
    UNION ALL
    SELECT 'cogroup', COALESCE(ca.user_id, le.user_id),
           CAST(-1 AS BIGINT), COALESCE(ca.n, 0),
           le.last_err, ca.end_ts
    FROM ca FULL OUTER JOIN le ON ca.user_id = le.user_id
    UNION ALL
    SELECT 'funnel', f0.user_id,
           CAST(1 + CASE WHEN f1.ts1 IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN f2.ts2 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT),
           CAST(1 + CASE WHEN f1.ts1 IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN f2.ts2 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT),
           f0.ts0, COALESCE(f2.ts2, f1.ts1, f0.ts0)
    FROM f0
    LEFT JOIN f1 ON f0.user_id = f1.user_id
    LEFT JOIN f2 ON f0.user_id = f2.user_id
    UNION ALL
    SELECT 'afunnel', a0m.user_id,
           CAST(1 + CASE WHEN a1m.ts1 IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN a2m.ts2 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT),
           CAST(1 + CASE WHEN a1m.ts1 IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN a2m.ts2 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT),
           a0m.ts0, COALESCE(a2m.ts2, a1m.ts1, a0m.ts0)
    FROM a0m
    LEFT JOIN a1m ON a0m.user_id = a1m.user_id
    LEFT JOIN a2m ON a0m.user_id = a2m.user_id
)
ORDER BY branch, user_id, session_id
"""


@register("sessionize_reduce", _SESSIONIZE_ORACLE, tags=("udf", "secondary-sort"),
          doc="Secondary-sort reducers under a branch column: per-user gap sessionization (applyInPandas-style bounded reducer), DATAJOIN cogroup-reduce parity (clicks-after-last-error per user; oracle re-derives the imperative merge relationally), ordered FUNNEL conversion depth (chained earliest-after min+join rounds; oracle replays the same CTE chain), and 'afunnel' — funnel(anchor='any'), EXISTS-A-CHAIN depth under a conversion window (per-stage reachability window scans; oracle replays them exactly).")
def sessionize_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    session = udfmod.sessionize(ev, gap_minutes=_GAP_MIN).select(
        F.lit("session").alias("branch"),
        "user_id",
        "session_id",
        "n_events",
        "start_ts",
        "end_ts",
    )

    # Cogroup on a user BUCKET, not the raw user id: per-user groups
    # here are a handful of rows, and applyInPandas pays a Python
    # invocation + its own Arrow batch PER GROUP (~3–5 ms each —
    # measured 1500 single-user groups ≈ 5–7 s where 64 bucket groups
    # ≈ 0.3 s). Bucketing keys and vectorizing the per-key merge
    # inside the reducer is the standard remedy whenever cogroup keys
    # are fine-grained; the reducer then handles a bucket of users per
    # call with pandas groupbys — same semantics, Python calls bounded
    # by the bucket count.
    def clicks_after_last_error(key, clicks: pd.DataFrame, errors: pd.DataFrame):
        le = (
            errors.groupby("user_id")["ts"].max()
            if len(errors)
            else pd.Series(dtype="datetime64[ns]")
        )
        if len(clicks):
            last = clicks["user_id"].map(le)
            kept = clicks[last.isna() | (clicks["ts"] > last)]
            agg = kept.groupby("user_id")["ts"].agg(n="size", end="max")
        else:
            agg = pd.DataFrame(columns=["n", "end"])
        users = sorted(set(clicks["user_id"]).union(le.index))
        out = pd.DataFrame({"user_id": pd.Series(users, dtype="int64")})
        out["session_id"] = -1
        out["n_events"] = (
            out["user_id"].map(agg["n"]).fillna(0).astype("int64")
        )
        # to_datetime: map over an empty/partial index yields float NaN
        # columns, which Arrow refuses to cast to timestamp
        out["start_ts"] = pd.to_datetime(out["user_id"].map(le))
        out["end_ts"] = pd.to_datetime(out["user_id"].map(agg["end"]))
        return out

    # Bucket count via cogroup_bucket_count (measured floor 16 — 64
    # buckets ran 2.6–3.6 s steady vs 16 at 1.8–2.2 s at sf0.1/32
    # cores; same rows either way), a cores term for cluster
    # parallelism, and a data-size term so per-group pandas frames
    # stay bounded when the corpus grows on a fixed cluster (r12
    # advice). The size estimate is plan-time (no job).
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    errors = ev.where(F.col("event_type") == "error").select("user_id", "ts")
    from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
        estimated_plan_bytes,
    )

    # one plan-stats probe, not two: the unfiltered (user_id, ts)
    # projection upper-bounds clicks+errors combined (filters only
    # shrink it) — a conservative input to a memory BOUND
    n_buckets = udfmod.cogroup_bucket_count(
        spark.sparkContext.defaultParallelism,
        estimated_plan_bytes(ev.select("user_id", "ts")),
    )
    bucket = F.pmod(F.col("user_id"), F.lit(n_buckets)).alias("_b")
    cogrouped = udfmod.cogroup_reduce(
        clicks.select("user_id", "ts", bucket),
        errors.select("user_id", "ts", bucket),
        ["_b"],
        clicks_after_last_error,
        "user_id long, session_id long, n_events long, "
        "start_ts timestamp, end_ts timestamp",
    ).select(F.lit("cogroup").alias("branch"), "*")

    from hadoop_2_10_0_src_mapreduce_spark.operators.timeseries import funnel

    funneled = funnel(
        ev.where(F.col("value") >= _FUNNEL_MIN_VALUE),
        ["view", "click", "purchase"],
    ).select(
        F.lit("funnel").alias("branch"),
        "user_id",
        F.col("stages_completed").alias("session_id"),
        F.col("stages_completed").alias("n_events"),
        "start_ts",
        "end_ts",
    )
    # 'afunnel': EXISTS-A-CHAIN funnel (anchor="any") under a real
    # conversion window over the FULL event stream — the oracle
    # replays the per-stage reachability window scan exactly
    afunneled = funnel(
        ev,
        ["view", "click", "purchase"],
        max_gap_minutes=_AFUNNEL_GAP,
        anchor="any",
    ).select(
        F.lit("afunnel").alias("branch"),
        "user_id",
        F.col("stages_completed").alias("session_id"),
        F.col("stages_completed").alias("n_events"),
        "start_ts",
        "end_ts",
    )
    return (
        session.unionByName(cogrouped)
        .unionByName(funneled)
        .unionByName(afunneled)
        .orderBy("branch", "user_id", "session_id")
    )


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
