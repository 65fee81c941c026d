"""Scale-posture tests: the physical-plan properties that matter at
100 TB, asserted on small data — broadcast of dims, bucketed joins
skipping the shuffle (the CompositeInputFormat precondition made
durable), and skew salting preserving join semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.operators.joins import salted_join
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark):
    # power-law key: 90% of left rows share key 0
    left = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(0, "hot"), (11, "cold"), (999, "tail")], ["k", "name"]
    )
    plain = sorted(
        (r.k, r.payload, r.name) for r in left.join(right, ["k"]).collect()
    )
    salted = sorted(
        (r.k, r.payload, r.name)
        for r in salted_join(left, right, ["k"], salt_buckets=8).collect()
    )
    assert salted == plain
    assert len(salted) > 900  # the hot key actually dominated


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = {
        (r.k, r.v, r.w)
        for r in salted_join(left, right, ["k"], salt_buckets=4, how="left").collect()
    }
    assert out == {(1, "a", "x"), (2, "b", None)}


def test_salted_join_rejects_right_outer(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], how="right")


def test_dim_join_broadcasts_small_side(spark):
    """The DistributedCache pattern: dims must arrive as broadcast, the
    fact side must not shuffle before the join."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """write_sorted_bucketed makes CompositeInputFormat's 'pre-sorted,
    identically partitioned' precondition durable: a join between two
    tables bucketed on the key runs with NO Exchange on either side."""
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import write_sorted_bucketed

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_sorted_bucketed(
        orders, "t_orders_b", "o_orderkey", buckets=8, path=str(tmp_path / "ob")
    )
    write_sorted_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        buckets=8,
        path=str(tmp_path / "lb"),
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_orders_b").join(spark.table("t_lineitem_b"), "o_orderkey")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_filter_and_projection_reach_parquet_scan(spark):
    """Predicate pushdown + column pruning must reach the scan: the
    FileScan should list PushedFilters and read ONLY the projected
    columns (a scan reading all 16 lineitem columns for a 2-column
    projection is wrong at any scale)."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan
    m = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert m and "l_orderkey" in m[0] and "l_extendedprice" not in m[0]
