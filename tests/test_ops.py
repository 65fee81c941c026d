from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.operators import (
    aggregations,
    joins,
    sortpart,
)


def test_sum_minmax_by_key_helpers(spark):
    """The thin LongSumReducer / Value{Max,Min} parity wrappers."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 4), ("b", 2)], ["k", "v"]
    )
    sums = {r.k: r.sum for r in aggregations.sum_by_key(df, ["k"], "v").collect()}
    assert sums == {"a": 5, "b": 2}
    mm = {
        r.k: (r.min_value, r.max_value)
        for r in aggregations.minmax_by_key(df, ["k"], "v").collect()
    }
    assert mm == {"a": (1, 4), "b": (2, 2)}


def test_total_order_sort_partitions_globally_ordered(spark):
    """Sort/TeraSort parity contract: every row in partition i sorts
    before every row in partition i+1 (range partitioning), not just
    within-partition order."""
    df = spark.createDataFrame([(i,) for i in (5, 3, 9, 1, 7, 2, 8)], ["v"])
    parts = sortpart.total_order_sort(df.repartition(4), "v").rdd.glom().collect()
    flat = [r.v for p in parts for r in p]
    assert flat == sorted(flat)  # concatenating partitions IS the sort


def test_override_join_rightmost_wins(spark):
    a = spark.createDataFrame([(1, "a1"), (2, "a2")], ["key", "value"])
    b = spark.createDataFrame([(2, "b2"), (3, "b3")], ["key", "value"])
    c = spark.createDataFrame([(3, "c3")], ["key", "value"])
    out = {r.key: r.value for r in joins.override_join([a, b, c], "key", "value").collect()}
    assert out == {1: "a1", 2: "b2", 3: "c3"}


def test_semi_anti(spark):
    left = spark.createDataFrame([(1,), (2,)], ["k"])
    right = spark.createDataFrame([(2,), (2,)], ["j"])
    cond = F.col("k") == F.col("j")
    assert [r.k for r in joins.semi_join(left, right, cond).collect()] == [2]
    assert [r.k for r in joins.anti_join(left, right, cond).collect()] == [1]


def test_uniq_value_count_cap(spark):
    df = spark.createDataFrame([("a", i % 7) for i in range(50)], ["k", "v"])
    row = aggregations.uniq_value_count(df, ["k"], "v").collect()[0]
    assert row.uniq_count == 7
    row = aggregations.uniq_value_count(df, ["k"], "v", max_items=3).collect()[0]
    assert row.uniq_count == 3


def test_observe_counters(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], ["x"])
    observed, obs = aggregations.observe_counters(
        df, "m", {"rows": F.count(F.lit(1)), "sum_x": F.sum("x")}
    )
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get == {"rows": 3, "sum_x": 6}


def test_top_k_and_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 3), ("b", 9), ("b", 2)], ["g", "v"]
    )
    top = sortpart.top_k(df, 2, F.desc("v"))
    assert [r.v for r in top.collect()] == [9, 5]
    per = sortpart.top_k_per_group(df, ["g"], 1, F.desc("v"))
    assert {(r.g, r.v) for r in per.collect()} == {("a", 5), ("b", 9)}


def test_key_field_sort_cols(spark):
    df = spark.createDataFrame([("x\t10\tz",), ("y\t9\tz",)], ["line"])
    cols = sortpart.key_field_sort_cols("-k2,2nr", F.col("line"))
    out = [r.line.split("\t")[1] for r in df.orderBy(*cols).collect()]
    assert out == ["10", "9"]  # numeric desc, not lexicographic


def test_sort_validate_detects_sorted(spark):
    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], ["k", "v"])
    row = sortpart.sort_validate(df, "k").collect()[0]
    assert row.n_rows == 3 and row.is_sorted and row.checksum_match


def test_repartition_by_key(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    assert sortpart.repartition_by_key(df, 4, "k").rdd.getNumPartitions() == 4


def test_repartition_by_binary_range(spark):
    df = spark.createDataFrame(
        [(bytearray(b"aaaa-1"),), (bytearray(b"aaaa-2"),), (bytearray(b"bbbb-1"),)],
        ["key"],
    )
    out = sortpart.repartition_by_binary_range(df, 4, "key", offset=0, length=4)
    assert out.rdd.getNumPartitions() == 4
    # Rows sharing the routed byte-range land in the same partition.
    parts = (
        out.rdd.mapPartitionsWithIndex(
            lambda i, rows: [(bytes(r.key)[:4], i) for r in rows]
        ).collect()
    )
    by_prefix = {}
    for prefix, pid in parts:
        by_prefix.setdefault(prefix, set()).add(pid)
    assert all(len(pids) == 1 for pids in by_prefix.values())


def test_sample_split_points_balance(spark):
    """InputSampler parity: the returned cut points must split the
    column into roughly equal ranges (each of the 4 ranges holds
    15-35% of uniform data at 1% sketch error)."""
    df = spark.range(10_000).select(F.col("id").cast("double").alias("v"))
    pts = sortpart.sample_split_points(df, "v", 4)
    assert len(pts) == 3 and pts == sorted(pts)
    bounds = [float("-inf"), *pts, float("inf")]
    n = df.count()
    for lo, hi in zip(bounds, bounds[1:]):
        frac = df.where((F.col("v") > lo) & (F.col("v") <= hi)).count() / n
        assert 0.15 <= frac <= 0.35, f"unbalanced range ({lo}, {hi}]: {frac}"
    assert sortpart.sample_split_points(df, "v", 1) == []


def test_value_aggregator_spec_dispatch(spark):
    from hadoop_2_10_0_src_mapreduce_spark.operators.aggregations import (
        value_aggregator,
    )

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 10), ("b", 3, 30)], ["k", "v", "w"]
    )
    out = {
        r.k: (r.total, r.biggest, r.n_uniq_w)
        for r in value_aggregator(
            df, ["k"], {"total": "sum:v", "biggest": "max:v", "n_uniq_w": "uniq:w"}
        ).collect()
    }
    assert out == {"a": (3, 2, 1), "b": (3, 3, 1)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        value_aggregator(df, ["k"], {"x": "median:v"})


def test_approx_uniq_value_count_within_tolerance(spark):
    """HLL++ distinct vs exact on the events fixture: within 3·rsd."""
    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    exact = {
        r.event_type: r.uniq_count
        for r in aggregations.uniq_value_count(ev, ["event_type"], "user_id").collect()
    }
    approx = {
        r.event_type: r.approx_uniq_count
        for r in aggregations.approx_uniq_value_count(
            ev, ["event_type"], "user_id", rsd=0.05
        ).collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(3, 0.15 * ex), (k, approx[k], ex)


def test_approx_quantiles_rank_error_bounded(spark):
    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    out = aggregations.approx_quantiles(
        ev, ["event_type"], "value", probs=(0.5,), accuracy=10000
    ).collect()
    exact = {
        r.event_type: r.m
        for r in ev.groupBy("event_type").agg(F.median("value").alias("m")).collect()
    }
    vals = {r.event_type: r.q0_5 for r in out}
    for k, med in exact.items():
        # rank error 1/accuracy → value error bounded by neighborhood;
        # on this fixture the approx median lands within 5% of exact
        assert abs(vals[k] - med) <= max(0.05 * abs(med), 1e-6), (k, vals[k], med)


def test_frequent_values_finds_planted_hot_key(spark):
    rows = [(1, "hot")] * 60 + [(1, f"v{i}") for i in range(40)] + [(2, "x")]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {
        (r.k, r.v): r.share
        for r in aggregations.frequent_values(df, ["k"], "v", min_share=0.5).collect()
    }
    assert out == {(1, "hot"): 0.6, (2, "x"): 1.0}


def test_partition_size_stats_flags_planted_skew(spark):
    from hadoop_2_10_0_src_mapreduce_spark.operators.sortpart import (
        partition_size_stats,
    )

    balanced = spark.range(10000).repartition(8)
    r = partition_size_stats(balanced).first()
    assert r.n_partitions == 8
    assert r.max_avg_ratio < 1.5

    # all rows hashed to one key → one hot partition after repartition
    skewed = spark.range(10000).select(F.lit(1).alias("k")).repartition(8, "k")
    s = partition_size_stats(skewed).first()
    assert s.max_rows == 10000
    assert s.n_empty >= 6
    assert s.max_avg_ratio >= 4.0
