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

# --- WordCount + Grep (EX/WordCount.java, EX/Grep.java parity) -------
# One query, two §2 components: the 'word' branch is the canonical
# TokenCounterMapper+IntSumReducer WordCount; the 'grep' branch is the
# Grep example (RegexMapper → count → sort desc, 2 chained MR jobs → 1
# declarative plan). Merged so both stay inside the driver's
# 50-checked-query window; each branch is an independent subtree.

_GREP_PATTERN = "[a-z]*data[a-z]*"

_WORDCOUNT_GREP_ORACLE = rf"""
SELECT mode, token, cnt FROM (
    SELECT 'word' AS mode, token, COUNT(*) AS cnt
    FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents
    )
    GROUP BY token
    UNION ALL
    SELECT 'grep' AS mode, match AS token, COUNT(*) AS cnt
    FROM (
        SELECT unnest(regexp_extract_all(lower(text), '{_GREP_PATTERN}')) AS match
        FROM documents
    )
    GROUP BY match
)
ORDER BY mode, cnt DESC, token
"""


@register("wordcount_grep", _WORDCOUNT_GREP_ORACLE, tags=("transform", "agg"),
          doc="Canonical WordCount (combiner ≈ partial agg) + Grep example parity (regex match counts sorted desc), unioned under a mode column.")
def wordcount_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        transforms.tokenize(lines_from_column(docs, "text"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("word").alias("mode"), "token", "cnt")
    )
    gr = transforms.grep_count(
        docs.select(F.lower(F.col("text")).alias("text")), "text", _GREP_PATTERN
    ).select(F.lit("grep").alias("mode"), F.col("match").alias("token"), "cnt")
    return wc.unionByName(gr).orderBy("mode", F.desc("cnt"), "token")


# --- FieldSelection chained into InverseMapper -----------------------
# One query, two §2 components (+ ChainMapper composition): build
# tab-lines from lineitem's integer columns (identical int→string in
# both engines), FieldSelectionMapper-select fields "1,0:2-" into
# (key, value), then InverseMapper-swap to (value-fields, key-fields).
# Catalyst collapses both projections into the scan — the ChainMapper
# claim (adjacent narrow ops fuse) is visible in this very plan.

_FIELDSEL_INVERSE_ORACLE = r"""
SELECT
    concat_ws(chr(9), l_suppkey, l_linenumber)               AS key,
    concat_ws(chr(9), l_partkey, l_orderkey)                 AS value
FROM lineitem
"""


@register("fieldsel_inverse", _FIELDSEL_INVERSE_ORACLE, tags=("transform",),
          doc="FieldSelectionMapper (cut-style spec '1,0:2-') chained through InverseMapper ((k,v)→(v,k)) — ChainMapper composition, one fused projection in the plan.")
def fieldsel_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lined = transforms.with_line(li, ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"])
    chained = transforms.chain(
        lambda df: transforms.field_select(df, "line", "1,0:2-"),
        transforms.inverse,
    )
    return chained(lined)


# --- Set operations (§2.7) -------------------------------------------

# INTERSECT + EXCEPT over the same inputs, unioned under a mode column
# (one checked-window slot instead of two; same operators exercised).
_SET_INTERSECT_EXCEPT_ORACLE = """
SELECT mode, o_custkey FROM (
    SELECT 'intersect' AS mode, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'except' AS mode, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
)
ORDER BY mode, o_custkey
"""


@register("set_intersect_except", _SET_INTERSECT_EXCEPT_ORACLE, tags=("set",),
          doc="INTERSECT (custkeys with both F- and O-status orders) and EXCEPT (F but never O) over the same inputs, under a mode column.")
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    both = sets.intersect(f_keys, o_keys).select(
        F.lit("intersect").alias("mode"), "o_custkey"
    )
    only_f = sets.except_(f_keys, o_keys).select(
        F.lit("except").alias("mode"), "o_custkey"
    )
    return both.unionByName(only_f).orderBy("mode", "o_custkey")


# UNION ALL + UNION (distinct) in one query: the 'all' branch keeps
# multiplicity (multi-path FileInputFormat → unionByName + count), the
# 'distinct' branch is the identity-map+identity-reduce dedup idiom.
_SET_UNION_MODES_ORACLE = """
SELECT mode, o_custkey, cnt FROM (
    SELECT 'all' AS mode, o_custkey, COUNT(*) AS cnt
    FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
    GROUP BY o_custkey
    UNION ALL
    SELECT 'distinct' AS mode, o_custkey, CAST(1 AS BIGINT) AS cnt
    FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
)
ORDER BY mode, o_custkey
"""


@register("set_union_modes", _SET_UNION_MODES_ORACLE, tags=("set",),
          doc="UNION ALL (multiplicity-preserving, with per-key counts) and UNION distinct (identity-map+identity-reduce dedup idiom) over the same inputs, unioned under a mode column.")
def set_union_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    p_keys = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    union_all = (
        sets.union_all(f_keys, p_keys)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("all").alias("mode"), "o_custkey", "cnt")
    )
    union_distinct = sets.union_distinct(f_keys, p_keys).select(
        F.lit("distinct").alias("mode"),
        "o_custkey",
        F.lit(1).cast("long").alias("cnt"),
    )
    return union_all.unionByName(union_distinct).orderBy("mode", "o_custkey")


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


# --- ChainMapper / ChainReducer (§2.3) --------------------------------
# A [MAP+ / REDUCE MAP*] chain as the reference composed them
# (CORE/mapreduce/lib/chain/ChainMapper.java, ChainReducer.java [H]):
# tokenize → regex-filter → count → post-reduce reshape. In Spark the
# chain is one declarative plan — adjacent narrow stages fuse into a
# single codegen stage; the value of `chain` is the reference's
# composition API, checked here end-to-end against the oracle.

_CHAIN_ORACLE = """
WITH toks AS (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
),
filtered AS (
    SELECT token FROM toks WHERE regexp_matches(token, '^[a-z]{4,}$')
),
counted AS (
    SELECT token, COUNT(*) AS cnt FROM filtered GROUP BY token
)
SELECT upper(token) AS token_uc, cnt FROM counted
ORDER BY token_uc
"""


@register("chain_transforms", _CHAIN_ORACLE, tags=("transform", "chain"),
          doc="ChainMapper/ChainReducer parity: tokenize → regex filter → count → post-reduce uppercase, composed via transforms.chain into one fused plan.")
def chain_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pipeline = transforms.chain(
        lambda df: transforms.tokenize(df, "text"),              # ChainMapper 1
        lambda df: df.where(F.col("token").rlike("^[a-z]{4,}$")),  # ChainMapper 2
        lambda df: df.groupBy("token").agg(                      # the reducer
            F.count(F.lit(1)).alias("cnt")
        ),
        lambda df: df.select(                                    # ChainReducer post-map
            F.upper("token").alias("token_uc"), "cnt"
        ),
    )
    return pipeline(docs).orderBy("token_uc")
