"""Catalog: aggregations (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.operators import aggregations, transforms
from hadoop_2_10_0_src_mapreduce_spark.plans.qutil import dsum, sql_dsum
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import lines_from_column, load_table

# --- sum/min/max family (IntSumReducer, LongValueMax/Min, ...) -------

_AGG_FAMILY_ORACLE = f"""
SELECT
    l_returnflag,
    COUNT(*) AS cnt,
    {sql_dsum('l_quantity')} AS sum_qty,
    MIN(l_quantity) AS min_qty,
    MAX(l_quantity) AS max_qty,
    MIN(l_linestatus) AS min_status,
    MAX(l_linestatus) AS max_status
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_sum_minmax", _AGG_FAMILY_ORACLE, tags=("agg",),
          doc="LongSumReducer + LongValueMax/Min + StringValueMax/Min in one pass.")
def agg_sum_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("l_quantity").alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_linestatus").alias("min_status"),
            F.max("l_linestatus").alias("max_status"),
        )
        .orderBy("l_returnflag")
    )


# --- UniqValueCount (capped distinct) --------------------------------

_UNIQ_ORACLE = """
SELECT
    l_returnflag,
    COUNT(DISTINCT l_partkey) AS uniq_count,
    LEAST(COUNT(DISTINCT l_partkey), 100) AS uniq_count_capped
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("uniq_value_count", _UNIQ_ORACLE, tags=("agg",),
          doc="UniqValueCount parity incl. the maxNumItems cap (bounded-memory distinct).")
def uniq_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("uniq_count"),
            F.least(F.countDistinct("l_partkey"), F.lit(100)).alias("uniq_count_capped"),
        )
        .orderBy("l_returnflag")
    )


# --- ValueHistogram --------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT
    event_type,
    COUNT(*) AS uniq_values,
    MIN(freq) AS min_freq,
    MAX(freq) AS max_freq,
    ROUND(AVG(freq), 6) AS avg_freq,
    MEDIAN(freq) AS median_freq,
    ROUND(STDDEV_POP(freq), 6) AS stddev_freq
FROM (
    SELECT event_type, user_id, COUNT(*) AS freq
    FROM events
    GROUP BY event_type, user_id
)
GROUP BY event_type
ORDER BY event_type
"""


@register("value_histogram", _HISTOGRAM_ORACLE, tags=("agg",),
          doc="ValueHistogram parity: per-key value→freq map summarized (count/min/max/mean/exact-median/stddev of frequencies).")
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return aggregations.value_histogram(ev, ["event_type"], "user_id").orderBy("event_type")


# --- Word stats (WordMean/WordMedian/WordStandardDeviation) ----------

_WORD_STATS_ORACLE = """
SELECT
    COUNT(*) AS n_words,
    ROUND(AVG(LENGTH(token)), 6) AS mean_len,
    MEDIAN(LENGTH(token)) AS median_len,
    ROUND(STDDEV_POP(LENGTH(token)), 6) AS stddev_len
FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
)
"""


@register("word_stats", _WORD_STATS_ORACLE, tags=("agg",),
          doc="WordMean/WordMedian/WordStandardDeviation in one pass (reference: 3 jobs).")
def word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = transforms.tokenize(lines_from_column(docs, "text"))
    return aggregations.word_stats(tokens)


# --- Rollup / cube (free upgrades — absent in the reference) ---------

_ROLLUP_ORACLE = f"""
SELECT
    l_returnflag,
    l_linestatus,
    COUNT(*) AS cnt,
    {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("rollup_sums", _ROLLUP_ORACLE, tags=("agg",),
          doc="ROLLUP upgrade: the reference needed one MR job per grouping level.")
def rollup_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


_CUBE_ORACLE = """
SELECT
    o_orderstatus,
    o_orderpriority,
    COUNT(*) AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("cube_counts", _CUBE_ORACLE, tags=("agg",),
          doc="CUBE upgrade over orders status×priority.")
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_GROUPING_SETS_ORACLE = """
SELECT
    o_orderstatus,
    o_orderpriority,
    COUNT(*) AS cnt,
    CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# --- Counters (CORE/mapreduce/counters/ [H]) -------------------------
# The reference's Counters are add-only global metrics accumulated at
# the AM from every task. Here: ONE scan computes every counter as a
# conditional aggregate (partial aggregation = the Combiner), then
# unpivots to (counter, value) rows — the counter-group report shape.
# The live-metrics variant (no extra action) is
# aggregations.observe_counters, exercised in tests.

_COUNTERS_ORACLE = """
SELECT counter, value FROM (
    SELECT 'input_records' AS counter, COUNT(*)::BIGINT AS value FROM lineitem
    UNION ALL
    SELECT 'returned_records', COUNT(*) FILTER (WHERE l_returnflag = 'R')::BIGINT FROM lineitem
    UNION ALL
    SELECT 'zero_tax_records', COUNT(*) FILTER (WHERE l_tax = 0)::BIGINT FROM lineitem
    UNION ALL
    SELECT 'high_discount_records', COUNT(*) FILTER (WHERE l_discount >= 0.05)::BIGINT FROM lineitem
)
ORDER BY counter
"""


@register("job_counters", _COUNTERS_ORACLE, tags=("agg", "counters"),
          doc="Counters parity (CORE/mapreduce/counters/ [H]): add-only global metrics from one scan — conditional aggregates unpivoted to (counter, value) report rows.")
def job_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).alias("input_records"),
        F.count_if(F.col("l_returnflag") == "R").alias("returned_records"),
        F.count_if(F.col("l_tax") == 0).alias("zero_tax_records"),
        F.count_if(F.col("l_discount") >= 0.05).alias("high_discount_records"),
    )
    names = agg.columns
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return (
        agg.selectExpr(f"stack({len(names)}, {stack}) AS (counter, value)")
        .orderBy("counter")
    )


@register("grouping_sets_counts", _GROUPING_SETS_ORACLE, tags=("agg",),
          doc="GROUPING SETS upgrade: arbitrary grouping combinations in one pass (the reference ran one MR job per set).")
def grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("o_orderkey").alias("sum_keys"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --- ValueAggregator spec strings (§2.5 framework) --------------------
# The reference's declarative agg framework dispatched on "type:column"
# descriptor strings (lib/aggregate/ValueAggregatorJob.java,
# ValueAggregatorDescriptor.java [H]); value_aggregator compiles the
# same spec shape into one agg expression list. The double-valued sum
# goes through a DECIMAL column first so the result is accumulation-
# order independent (registry determinism rules).

_VALUEAGG_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       ROUND(MAX(value), 6) AS max_value,
       ROUND(MIN(value), 6) AS min_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("valueagg_specs", _VALUEAGG_ORACLE, tags=("agg", "framework"),
          doc="ValueAggregator framework parity: 'type:column' spec strings (count/sum/max/min/uniq) compiled to one grouped agg pass over events.")
def valueagg_specs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("value_dec"),
        F.round("value", 6).alias("value_r"),
    )
    out = aggregations.value_aggregator(
        ev,
        ["event_type"],
        {
            "n_events": "count:event_id",
            "total_value": "sum:value_dec",
            "max_value": "max:value_r",
            "min_value": "min:value_r",
            "n_users": "uniq:user_id",
        },
    )
    return out.withColumn("total_value", F.col("total_value").cast("double")).orderBy(
        "event_type"
    )
