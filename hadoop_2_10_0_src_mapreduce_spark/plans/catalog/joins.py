"""Catalog: joins (SURVEY.md §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.operators import joins
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table

# --- Multiway inner join with broadcast dims (Q5-flavored) -----------
# lineitem⋈orders shuffles on orderkey (uniform TPC-H keys, no skew);
# orders⋈customer shuffles on custkey; nation/region are broadcast
# (the DistributedCache pattern) so they never shuffle.

_REVENUE_ORACLE = """
SELECT
    n_name,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("join_revenue_by_nation", _REVENUE_ORACLE, tags=("join", "agg"),
          doc="K-way inner join (InnerJoinRecordReader parity) with broadcast dims; revenue per ASIA nation.")
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = joins.multiway_inner(
        li,
        (orders, F.col("l_orderkey") == F.col("o_orderkey"), False),
        (customer, F.col("o_custkey") == F.col("c_custkey"), False),
        (nation, F.col("c_nationkey") == F.col("n_nationkey"), True),
        (region.where(F.col("r_name") == "ASIA"),
         F.col("n_regionkey") == F.col("r_regionkey"), True),
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --- Left outer join (OuterJoinRecordReader flavor) ------------------

_LEFT_OUTER_ORACLE = """
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
GROUP BY c_custkey, c_mktsegment
ORDER BY c_custkey
"""


@register("join_left_outer", _LEFT_OUTER_ORACLE, tags=("join",),
          doc="Outer join parity: customers with their F-order counts incl. zero.")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") == "F")
    return (
        customer.join(orders, cond, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


# --- Full outer + override (rightmost-wins lookup) -------------------

_OVERRIDE_ORACLE = """
SELECT
    COALESCE(b.key, a.key) AS key,
    COALESCE(b.value, a.value) AS value
FROM (SELECT p_partkey AS key, CAST(p_retailprice AS DOUBLE) AS value FROM part) a
FULL OUTER JOIN (
    SELECT l_partkey AS key, CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
) b ON a.key = b.key
ORDER BY key
"""


@register("join_override", _OVERRIDE_ORACLE, tags=("join",),
          doc="override(...) parity (lib/join/OverrideRecordReader): rightmost source wins per key.")
def join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    base = part.select(F.col("p_partkey").alias("key"),
                       F.col("p_retailprice").cast("double").alias("value"))
    overlay = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.max(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("value"))
    )
    return joins.override_join([base, overlay], "key", "value").orderBy("key")


# --- Semi / anti (free upgrades over the reference's tag idiom) ------

_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
"""


@register("join_semi", _SEMI_ORACLE, tags=("join",),
          doc="left_semi parity: customers having a >400k order.")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 400000)
    return (
        joins.semi_join(customer, big, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
"""


@register("join_anti", _ANTI_ORACLE, tags=("join",),
          doc="left_anti parity: customers with no >400k order.")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 400000)
    return (
        joins.anti_join(customer, big, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- Cartesian -------------------------------------------------------

_CROSS_ORACLE = """
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
"""


@register("join_cross", _CROSS_ORACLE, tags=("join",),
          doc="Cartesian parity (reference idiom: constant key → one group).")
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return joins.cross_join(region, nation).orderBy("r_name", "n_name")


# --- as-of + range join (non-equi lookups; absent in the reference) ----
# Two branches under a mode column (the scan_fixed_multi merge pattern —
# registry stays at 50):
# 'asof'  — each click matched to the user's most recent purchase value
#           (union-merge + running last()); DuckDB's native ASOF JOIN is
#           the strongest possible oracle for it.
# 'range' — each click's value matched to every OVERLAPPING literal
#           value band via the BINNED range join (operators.joins.
#           range_join: interval explodes across the bins it overlaps,
#           equi-join on the bin key, exact predicate post-filter — an
#           AQE-planned equi join where naive BETWEEN planning goes
#           nested-loop); the oracle is the naive BETWEEN theta join,
#           so the hash check proves the binning is invisible. Bands
#           deliberately overlap (incl. a catch-all) so multi-match
#           semantics are exercised; band_id rides in purchase_value.
# 'overlap' — interval-INTERVAL: each click's value WINDOW
#           [value, value+40) against every overlapping band
#           (operators.joins.interval_join: both sides explode across
#           their bins, pairs claimed only in the overlap-start bin so
#           no dedup shuffle); oracle is the naive two-sided theta
#           join, proving the one-bin-claim exact.

_RANGE_BANDS = (
    (0, 0.0, 60.0),
    (1, 40.0, 120.0),
    (2, 100.0, 240.0),
    (3, 200.0, 400.0),
    (4, 350.0, 500.0),
    (5, 0.0, 500.0),
)

_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _RANGE_BANDS)

_ASOF_ORACLE = f"""
WITH clicks AS (
    SELECT user_id, event_id, ts::TIMESTAMP AS ts, value
    FROM events WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, ts::TIMESTAMP AS pts, round(max(value), 6) AS purchase_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, pts
)
SELECT mode, user_id, event_id, ts, purchase_value FROM (
    SELECT 'asof' AS mode, c.user_id, c.event_id, c.ts, p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND c.ts >= p.pts
    UNION ALL
    SELECT 'range', c.user_id, c.event_id, c.ts,
           CAST(b.band_id AS DOUBLE)
    FROM clicks c
    JOIN (VALUES {_BANDS_SQL}) AS b(band_id, lo, hi)
      ON c.value >= b.lo AND c.value < b.hi
    UNION ALL
    SELECT 'overlap', c.user_id, c.event_id, c.ts,
           CAST(b.band_id AS DOUBLE)
    FROM clicks c
    JOIN (VALUES {_BANDS_SQL}) AS b(band_id, lo, hi)
      ON c.value < b.hi AND b.lo < c.value + 40
)
ORDER BY mode, user_id, event_id
"""


@register("join_asof", _ASOF_ORACLE, tags=("join", "time-series"),
          doc="Non-equi joins under a mode column: as-of join (union-merge + running last(); oracle is DuckDB's native ASOF JOIN), binned range join (clicks to overlapping value bands; oracle is the naive BETWEEN theta join, proving the bin decomposition invisible), and interval-interval OVERLAP join (click value windows vs bands; pairs claimed in the overlap-start bin only, so no dedup shuffle — oracle is the naive two-sided theta join).")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_2_10_0_src_mapreduce_spark.operators.joins import (
        asof_join,
        interval_join,
        range_join,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("purchase_value"))
    )
    asof = asof_join(
        clicks.drop("value"), purchases, ["user_id"], left_ts="ts", right_ts="ts"
    ).select(
        F.lit("asof").alias("mode"), "user_id", "event_id", "ts", "purchase_value"
    )
    # VALUES LocalRelation, not createDataFrame(list): a driver-list
    # createDataFrame becomes a PICKLED python RDD spread over
    # defaultParallelism slices — each of its ~32 near-empty tasks pays
    # a Python-worker round trip (~270 ms run / ~3 ms cpu per task,
    # measured via taskSummary on the two 65-task stages this query
    # carried: guide §4, eliminate the Python boundary). The VALUES
    # relation lives entirely in the JVM (integral doubles — every
    # literal parses exactly); band_id arrives as INT like the old
    # schema string said.
    bands = spark.sql(
        "SELECT band_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi "
        f"FROM (VALUES {_BANDS_SQL}) AS t(band_id, lo, hi)"
    )
    ranged = range_join(
        clicks, bands, "value", "lo", "hi", bin_width=60.0
    ).select(
        F.lit("range").alias("mode"),
        "user_id",
        "event_id",
        "ts",
        F.col("band_id").cast("double").alias("purchase_value"),
    )
    overlapped = interval_join(
        clicks.select(
            "user_id", "event_id", "ts",
            F.col("value").alias("c_lo"),
            (F.col("value") + 40.0).alias("c_hi"),
        ),
        bands,
        "c_lo", "c_hi", "lo", "hi",
        bin_width=60.0,
    ).select(
        F.lit("overlap").alias("mode"),
        "user_id",
        "event_id",
        "ts",
        F.col("band_id").cast("double").alias("purchase_value"),
    )
    return (
        asof.unionByName(ranged)
        .unionByName(overlapped)
        .orderBy("mode", "user_id", "event_id")
    )


# --- skew-salted join (§2.4 scale helper) ------------------------------
# The manual remedy for the reference's single-hot-reducer pathology
# (one key → one reduce task): salt the left side, replicate the right
# side per salt bucket, join on (keys + salt). The oracle is the PLAIN
# join — salting must be invisible in the result, which is exactly what
# the hash check proves.

_SALTED_ORACLE = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY priority
ORDER BY priority
"""


@register("join_salted", _SALTED_ORACLE, tags=("join", "skew"),
          doc="Skew-salted join (salt left, replicate right per bucket, join on keys+salt): result hash-identical to the plain join — salting is invisible in the output.")
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = joins.salted_join(li, orders, ["l_orderkey"], salt_buckets=8)
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("priority")
    )
