"""Focused tests for the r13 optimization-round internals:

- local_values_df (pure-JVM VALUES relation replacing driver-list
  createDataFrame in index metadata paths — guide §4)
- cogroup_bucket_count (the rows/bytes-bounded bucket dial — r12 advice)
- salted_join's size-gated SHUFFLE_HASH hint (r12 advice)
- parallelize_scan's memoized split-count probe
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions.udf import cogroup_bucket_count
from hadoop_2_10_0_src_mapreduce_spark.operators import joins
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
    estimated_plan_bytes,
    local_values_df,
    parallelize_scan,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- local_values_df ----------------------------------------------------


def test_local_values_df_exact_roundtrip_and_jvm_plan(spark):
    rows = [
        (0, [0.1, -1.5e-300, 2.0 ** 53 + 1.0], True, "it's a 'quoted' str"),
        (1, [float("nan"), float("inf"), float("-inf")], False, "back\\slash"),
        (2, None, None, None),
    ]
    df = local_values_df(
        spark, rows, "i int, xs array<double>, b boolean, s string"
    )
    got = df.orderBy("i").collect()
    assert [r.i for r in got] == [0, 1, 2]
    assert got[0].xs == rows[0][1]  # bit-exact doubles through SQL text
    assert math.isnan(got[1].xs[0])
    assert got[1].xs[1:] == [float("inf"), float("-inf")]
    assert got[0].s == rows[0][3] and got[1].s == rows[1][3]
    assert got[2].xs is None and got[2].b is None and got[2].s is None
    # the point of the helper: no pickled python RDD in the plan
    plan = _plan(df)
    assert "ExistingRDD" not in plan
    assert "LocalTableScan" in plan


def test_local_values_df_empty_keeps_schema_without_rdd(spark):
    df = local_values_df(spark, [], "query_id bigint, sim double")
    assert df.count() == 0
    assert [f.simpleString() for f in df.schema.fields] == [
        "query_id:bigint", "sim:double",
    ]
    assert "ExistingRDD" not in _plan(df)


def test_local_values_df_matches_createdataframe_values(spark):
    rows = [(i, [float(x) / 7.0 for x in range(i, i + 3)]) for i in range(5)]
    ddl = "list_id int, centroid array<double>"
    a = sorted(map(tuple, local_values_df(spark, rows, ddl).collect()))
    b = sorted(map(tuple, spark.createDataFrame(rows, ddl).collect()))
    assert a == b


# --- cogroup_bucket_count ----------------------------------------------


def test_cogroup_bucket_count_formula():
    # measured floor holds at small scale regardless of cores
    assert cogroup_bucket_count(32, 1 << 20) == 16
    assert cogroup_bucket_count(8, 0) == 16
    # cores term grows with the cluster
    assert cogroup_bucket_count(512, 1 << 20) == 128
    # data term bounds per-bucket bytes on a FIXED cluster (the r12
    # advice: a cores-only dial let groups grow without bound)
    gib = 1 << 30
    assert cogroup_bucket_count(32, 100 * gib) == math.ceil(
        100 * gib / (64 << 20)
    )
    # exact ceil behaviour at the boundary
    assert cogroup_bucket_count(32, 64 << 20) == 16
    assert cogroup_bucket_count(32, 17 * (64 << 20) + 1) == 18


# --- salted_join size-gated SHUFFLE_HASH hint ---------------------------


def _salted_fixture(spark):
    left = spark.range(0, 2000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    right = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return left, right


def test_salted_join_small_dim_uses_shuffled_hash(spark):
    left, right = _salted_fixture(spark)
    plan = _plan(joins.salted_join(left, right, ["k"], salt_buckets=4))
    assert "ShuffledHashJoin" in plan


def test_salted_join_oversized_dim_falls_back(spark, monkeypatch):
    left, right = _salted_fixture(spark)
    plain = sorted(
        map(tuple, left.join(right, "k").select("k", "v", "w").collect())
    )
    monkeypatch.setattr(joins, "SHUFFLE_HASH_MAX_BUILD_BYTES", 0)
    out = joins.salted_join(left, right, ["k"], salt_buckets=4)
    assert "ShuffledHashJoin" not in _plan(out)  # gate removed the hint
    got = sorted(map(tuple, out.select("k", "v", "w").collect()))
    assert got == plain  # the gate changes strategy, never results


# --- parallelize_scan memo ----------------------------------------------


def test_parallelize_scan_memo_consistent(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    a = parallelize_scan(df, "doc_id", target=4, memo_key=f"{path}#1")
    # second call hits the memo and must produce the same partitioning
    b = parallelize_scan(df, "doc_id", target=4, memo_key=f"{path}#1")
    assert a.rdd.getNumPartitions() == b.rdd.getNumPartitions() == 4
    assert sorted(r.doc_id for r in b.collect()) == list(range(1000))
    # a scan already split to >= target is a no-op, memoized or not
    wide = str(tmp_path / "wide.parquet")
    spark.read.parquet(path).repartition(4).write.parquet(wide)
    dfw = spark.read.parquet(wide)
    assert dfw.rdd.getNumPartitions() >= 2
    c = parallelize_scan(dfw, "doc_id", target=2, memo_key=f"{wide}#1")
    c2 = parallelize_scan(dfw, "doc_id", target=2, memo_key=f"{wide}#1")
    assert c is dfw and c2 is dfw


def test_estimated_plan_bytes_positive_and_monotonic(spark, tmp_path):
    path = str(tmp_path / "u.parquet")
    spark.range(0, 10000).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    ).write.parquet(path)
    df = spark.read.parquet(path)
    whole = estimated_plan_bytes(df)
    narrow = estimated_plan_bytes(df.select("id"))
    assert whole > 0
    assert narrow <= whole  # projection can only shrink the estimate
