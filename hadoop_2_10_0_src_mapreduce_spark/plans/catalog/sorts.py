"""Catalog: sorts / top-k / partitioning (SURVEY.md §2.6).

Note on oracles: the driver's value-hash is order-insensitive, so sort
queries must materialize the order into data — a rank column or a
validation verdict — for the check to actually test sortedness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_2_10_0_src_mapreduce_spark.operators import sortpart, transforms
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table

# --- Global total-order sort with rank (Sort/TeraSort parity) --------

_SORT_RANK_ORACLE = """
SELECT ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       o_orderkey, o_totalprice
FROM orders
ORDER BY rnk
LIMIT 100
"""


@register("sort_global_rank", _SORT_RANK_ORACLE, tags=("sort",),
          doc="Total-order sort (TotalOrderPartitioner parity: sample→range-partition→sort is what orderBy does) + top-100 with rank.")
def sort_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # limit-first: Catalyst's distributed TakeOrdered picks the 100,
    # the rank window then runs over 100 rows — never a full-table
    # single-partition window.
    top = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select(
        F.row_number().over(w).alias("rnk"), "o_orderkey", "o_totalprice"
    ).orderBy("rnk")


# --- Per-group top-k (window) ----------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
)
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk
"""


@register("topk_per_group", _TOPK_GROUP_ORACLE, tags=("sort",),
          doc="Per-group top-k via row_number window — no global sort, one group-key shuffle.")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        sortpart.top_k_per_group(
            o, ["o_orderpriority"], 3, F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rnk")
    )


# --- TeraValidate-style property check -------------------------------
# The Spark side PROVES sortedness + checksum invariance; the oracle
# states the expected verdict (the property itself is the test —
# SortValidator.java's record-stats/hash invariance, SURVEY §5.3).

_SORT_VALIDATE_ORACLE = """
SELECT COUNT(*) AS n_rows, TRUE AS is_sorted, TRUE AS checksum_match
FROM lineitem
"""


@register("sort_validate", _SORT_VALIDATE_ORACLE, tags=("sort", "property"),
          doc="TeraValidate/SortValidator parity: global order + order-insensitive checksum invariance of the sorted output.")
def sort_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Measured variance note: this query swings 2.0–2.6 s at sf0.1
    # across bench runs with an identical physical plan (host-level
    # contention on the global-sort exchange); bench.py's min-of-2
    # passes is the guard. Re-profiled round 3: the round-2 +23% was
    # noise, not a regression.
    li = load_table(spark, sf_dir, "lineitem")
    return sortpart.sort_validate(li, "l_orderkey", "l_linenumber")


# --- TeraGen + TeraChecksum (EX/terasort/TeraGen.java ~320,
# TeraChecksum via TeraValidate.java ~190 [H]) ------------------------
# Deterministic distributed generation (spark.range splits the id space
# across executors with zero shuffle — TeraGen's task-per-range layout)
# followed by a global order-insensitive checksum over the generated
# keys. md5-of-rownumber stands in for TeraGen's Random16 keygen (same
# role: uniformly-distributed reproducible keys); the checksum is a
# byte-polynomial over the key prefix, portable across engines.

_TERAGEN_N = 100_000

_TERAGEN_ORACLE = f"""
SELECT COUNT(*) AS n_rows,
       MIN(key10) AS min_key,
       MAX(key10) AS max_key,
       CAST(SUM(ascii(substring(key10, 1, 1)) * 65536
              + ascii(substring(key10, 2, 1)) * 256
              + ascii(substring(key10, 3, 1))) AS BIGINT) AS checksum
FROM (
    SELECT substring(md5(CAST(range AS VARCHAR)), 1, 20) AS key10
    FROM range({_TERAGEN_N})
)
"""


@register("teragen_checksum", _TERAGEN_ORACLE, tags=("sort", "generator"),
          doc="TeraGen+TeraChecksum parity: shuffle-free distributed keygen over a split id range, then one global checksum aggregate.")
def teragen_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = spark.range(_TERAGEN_N).select(
        F.substring(F.md5(F.col("id").cast("string")), 1, 20).alias("key10")
    )
    chk = (
        F.ascii(F.substring("key10", 1, 1)) * 65536
        + F.ascii(F.substring("key10", 2, 1)) * 256
        + F.ascii(F.substring("key10", 3, 1))
    )
    return gen.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("key10").alias("min_key"),
        F.max("key10").alias("max_key"),
        F.sum(chk).cast("long").alias("checksum"),
    )


# --- KeyFieldBased sort (unix-sort -k specs over tab-lines) ----------

_KEYFIELD_ORACLE = """
SELECT ROW_NUMBER() OVER (
           ORDER BY CAST(parts[2] AS DOUBLE) DESC, CAST(parts[1] AS DOUBLE)
       ) AS rnk,
       line
FROM (
    SELECT string_split(line, chr(9)) AS parts, line
    FROM (
        SELECT concat_ws(chr(9), o_orderkey, o_totalprice, o_orderstatus) AS line
        FROM orders
    )
)
ORDER BY rnk
LIMIT 50
"""


@register("keyfield_sort", _KEYFIELD_ORACLE, tags=("sort",),
          doc="KeyFieldBasedComparator parity: '-k2,2nr -k1,1n' over tab-lines (numeric desc on field 2, tiebreak field 1).")
def keyfield_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    lined = transforms.with_line(o, ["o_orderkey", "o_totalprice", "o_orderstatus"])
    cols = sortpart.key_field_sort_cols("-k2,2nr -k1,1n", F.col("line"))
    # limit-first (distributed TakeOrdered), then rank the 50 survivors.
    top = lined.orderBy(*cols).limit(50)
    w = Window.orderBy(*sortpart.key_field_sort_cols("-k2,2nr -k1,1n", F.col("line")))
    return top.select(F.row_number().over(w).alias("rnk"), "line").orderBy("rnk")
