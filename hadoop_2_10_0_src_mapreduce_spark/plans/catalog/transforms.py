"""Catalog: per-record transforms + set ops (SURVEY.md §2.3, §2.7).

Text queries run over ``documents.text`` — FIXTURES.md maps the
reference's line-oriented test inputs onto that column. Tokenization
(lowercase alnum runs) is byte-identical between Spark and DuckDB's
regex engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.operators import sets, transforms
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import lines_from_column, load_table

# --- WordCount (EX/WordCount.java parity: the canonical job) ---------

_WORDCOUNT_ORACLE = r"""
SELECT token, COUNT(*) AS cnt
FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
)
GROUP BY token
ORDER BY cnt DESC, token
"""


@register("wordcount", _WORDCOUNT_ORACLE, tags=("transform", "agg"),
          doc="Canonical WordCount over documents.text (combiner ≈ partial agg).")
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        transforms.tokenize(lines_from_column(docs, "text"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
    )


# --- Grep (EX/Grep.java parity: regex match → count → sort desc) -----

_GREP_PATTERN = "[a-z]*data[a-z]*"

_GREP_ORACLE = rf"""
SELECT match, COUNT(*) AS cnt
FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{_GREP_PATTERN}')) AS match
    FROM documents
)
GROUP BY match
ORDER BY cnt DESC, match
"""


@register("grep_count", _GREP_ORACLE, tags=("transform",),
          doc="Grep example parity: regex match counts sorted desc (2 chained MR jobs → 1 plan).")
def grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return transforms.grep_count(
        docs.select(F.lower(F.col("text")).alias("text")), "text", _GREP_PATTERN
    )


# --- FieldSelection (lib/fieldsel parity: unix-cut projection) -------
# Build tab-lines from lineitem's integer columns (identical int→string
# in both engines), select fields "1,0:2-".

_FIELDSEL_ORACLE = r"""
SELECT
    concat_ws(chr(9), l_partkey, l_orderkey)                 AS key,
    concat_ws(chr(9), l_suppkey, l_linenumber)               AS value
FROM lineitem
"""


@register("fieldsel", _FIELDSEL_ORACLE, tags=("transform",),
          doc="FieldSelectionMapper parity: cut-style field spec '1,0:2-' over tab-lines.")
def fieldsel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lined = transforms.with_line(li, ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"])
    return transforms.field_select(lined, "line", "1,0:2-")


# --- InverseMapper (trivial (k,v) swap) ------------------------------

_INVERSE_ORACLE = r"""
SELECT CAST(n_nationkey AS VARCHAR) AS key, n_name AS value
FROM nation
"""


@register("inverse_kv", _INVERSE_ORACLE, tags=("transform",),
          doc="InverseMapper parity: (name, key) → (key, name).")
def inverse_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    kv = nation.select(
        F.col("n_name").alias("key"), F.col("n_nationkey").cast("string").alias("value")
    )
    return transforms.inverse(kv)


# --- Set operations (§2.7) -------------------------------------------

_SET_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
"""


@register("set_intersect", _SET_INTERSECT_ORACLE, tags=("set",),
          doc="INTERSECT parity: custkeys with both F- and O-status orders.")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return sets.intersect(f_keys, o_keys).orderBy("o_custkey")


_SET_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
"""


@register("set_except", _SET_EXCEPT_ORACLE, tags=("set",),
          doc="EXCEPT parity: custkeys with F-status but no O-status orders.")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return sets.except_(f_keys, o_keys).orderBy("o_custkey")


_SET_UNION_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
ORDER BY o_custkey
"""


@register("set_union_distinct", _SET_UNION_ORACLE, tags=("set",),
          doc="UNION (distinct) parity — the identity-map+identity-reduce dedup idiom.")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    p_keys = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return sets.union_distinct(f_keys, p_keys).orderBy("o_custkey")


_SET_UNION_ALL_ORACLE = """
SELECT o_custkey, COUNT(*) AS cnt
FROM (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
)
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("set_union_all", _SET_UNION_ALL_ORACLE, tags=("set",),
          doc="UNION ALL parity (multi-path FileInputFormat → unionByName).")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    p_keys = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        sets.union_all(f_keys, p_keys)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_custkey")
    )


# --- semi-structured extraction (ObjectWritable/GenericWritable's
# tagged-any niche, SURVEY §1.2, upgraded to typed JSON parsing) -------

_JSON_PROPS_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("json_props_extract", _JSON_PROPS_ORACLE, tags=("transform", "json"),
          doc="Semi-structured extraction: from_json over the events.props JSON column, typed aggregate per event_type (the reference hand-encoded such payloads into Text).")
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
