"""M0 flagship — the reference's whole core loop in one query.

``flagship_pricing_join`` exercises scan → filter → shuffle equi-join →
hash aggregation (partial+final ≈ map-side Combiner + reduce) → global
sort: every stage of the reference's map→shuffle→reduce lifecycle
(SURVEY.md §3.1) expressed declaratively so Catalyst handles pushdown,
join strategy (AQE may broadcast the filtered side), and partial agg.

Scale notes: at 100 TB the join shuffles on l_orderkey/o_orderkey —
both uniformly distributed (TPC-H keys), so no skew; the aggregation's
group-by cardinality is tiny (6 flag/status groups) so partial agg
collapses nearly all rows map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.plans.qutil import davg, dsum, sql_davg, sql_dsum
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table

_FLAGSHIP_ORACLE = f"""
SELECT
    l_returnflag,
    l_linestatus,
    COUNT(*) AS cnt,
    {sql_dsum('l_quantity')} AS sum_qty,
    {sql_dsum('l_extendedprice')} AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
    {sql_davg('l_quantity')} AS avg_qty,
    {sql_davg('l_extendedprice')} AS avg_price,
    {sql_davg('l_discount', 6)} AS avg_disc
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  AND o_orderstatus <> 'X'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "flagship_pricing_join",
    _FLAGSHIP_ORACLE,
    tags=("core", "join", "agg", "sort"),
    doc="TPC-H-Q1-style pricing summary over lineitem⋈orders (M0 flagship).",
)
def flagship_pricing_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            (F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderstatus") != "X")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def entry_query(spark: SparkSession) -> DataFrame:
    """Driver smoke entry: flagship at sf0.001."""
    return flagship_pricing_join(spark, "/root/testdata/sf0.001")
