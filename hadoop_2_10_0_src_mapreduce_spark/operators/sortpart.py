"""Sorts, top-k, partitioning (SURVEY.md §2.6).

- Global total-order sort: the reference's Sort example +
  TotalOrderPartitioner + InputSampler (sample → cut points →
  range-partition → per-partition sort) is EXACTLY Spark's
  ``orderBy`` (RangePartitioner does reservoir sampling internally).
- TeraSort: same thing with a trie partitioner — ``orderBy`` again;
  ``sort_validate``'s order+checksum property check is the
  TeraValidate analog.
- KeyFieldBasedComparator/Partitioner: unix-sort ``-k2,3nr`` field
  specs → expression lists over split().
- HashPartitioner/BinaryPartitioner → repartition(n, expr).
- Top-k: absent as a reference primitive (single-reducer idiom) —
  Spark's orderBy().limit() runs distributed TakeOrdered; per-group
  via window row_number (partial sort per partition, no global sort).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def total_order_sort(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Globally sorted output across partitions (partition i's rows all
    ≤ partition i+1's) — Sort/TeraSort parity."""
    return df.orderBy(*cols)


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Distributed top-k: per-partition heads merged at the driver
    (TakeOrdered) — the 'bounded TreeMap per task + single reducer
    merge' idiom, built in. Include a unique tiebreaker column in
    ``order`` for deterministic output."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group: Sequence[str], k: int, *order: Column, rank_col: str = "rnk"
) -> DataFrame:
    """Per-group top-k via row_number window — no global sort, one
    shuffle on the group keys; skew-safe under AQE."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


_KEYFIELD = re.compile(r"-k(\d+)(?:,(\d+))?([nr]*)")


def key_field_sort_cols(spec: str, line: Column, sep: str = "\t") -> list[Column]:
    """KeyFieldBasedComparator parity: parse unix-sort specs like
    ``-k2,2nr -k3,3`` into sort expressions over a sep-split line.
    Fields are 1-based (unix sort convention); ``n`` = numeric,
    ``r`` = reverse. (lib/partition/KeyFieldHelper.java [H])"""
    fields = F.split(line, sep)
    cols: list[Column] = []
    for m in _KEYFIELD.finditer(spec):
        start, end, flags = int(m.group(1)), m.group(2), m.group(3) or ""
        end = int(end) if end else start
        for i in range(start, end + 1):
            c: Column = fields.getItem(i - 1)
            if "n" in flags:
                c = c.cast("double")
            cols.append(c.desc() if "r" in flags else c.asc())
    return cols


def repartition_by_key(df: DataFrame, n: int, *keys: str | Column) -> DataFrame:
    """HashPartitioner parity: hash(key) mod n routing. (Custom
    Partitioner.getPartition logic → any expression works as a key.)"""
    return df.repartition(n, *[F.col(k) if isinstance(k, str) else k for k in keys])


def sort_validate(df: DataFrame, *cols: str) -> DataFrame:
    """TeraValidate/SortValidator parity as a property check: emit one
    row proving (a) global monotonic order of the sorted form of ``df``
    and (b) content invariance — an order-insensitive checksum equal on
    input and output.

    Scale shape is TeraValidate's own (EX/terasort/TeraValidate.java
    [H]): never a global-order window (single partition at 100 TB).
    Range-partition on the key, prove monotonicity inside every
    partition in parallel, then compare first/last keys of adjacent
    partitions — the cross-partition check runs on #partitions rows.

    Returns columns: n_rows, is_sorted (bool), checksum_match (bool).
    """
    key = F.struct(*[F.col(c) for c in cols])
    # sum the 64-bit hashes in decimal — a long sum overflows under ANSI
    hashed = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    checksum_in = df.agg(F.sum(hashed).alias("checksum_in"))

    ranged = df.repartitionByRange(*[F.col(c) for c in cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(*cols)
    flags = ranged.select(
        "_pid",
        hashed.alias("h"),
        key.alias("k"),
        (key >= F.lag(key, 1).over(w_in)).alias("ok"),
    )
    per_part = flags.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.coalesce(F.col("ok"), F.lit(True))).alias("ok_within"),
        F.sum("h").alias("h_sum"),
        F.min("k").alias("first_key"),
        F.max("k").alias("last_key"),
    )
    w_bound = Window.orderBy("_pid")  # one row per partition — tiny
    bounded = per_part.withColumn(
        "ok_boundary",
        F.coalesce(
            F.col("first_key") >= F.lag("last_key", 1).over(w_bound), F.lit(True)
        ),
    )
    out = bounded.agg(
        F.sum("n").alias("n_rows"),
        F.min(F.col("ok_within") & F.col("ok_boundary")).alias("is_sorted"),
        F.sum("h_sum").alias("checksum_out"),
    )
    return out.crossJoin(checksum_in).select(
        "n_rows",
        "is_sorted",
        (F.col("checksum_out") == F.col("checksum_in")).alias("checksum_match"),
    )


def sample_split_points(
    df: DataFrame, col: str, num_partitions: int, *, relative_error: float = 0.01
) -> list:
    """InputSampler parity (CORE/mapreduce/lib/partition/InputSampler
    [H]): sample the data and return ``num_partitions - 1`` cut points
    that split ``col`` into ~equal ranges — what TotalOrderPartitioner
    consumed. Spark's ``orderBy`` does this internally (reservoir
    sampling in RangePartitioner); this explicit form is for users who
    persist the partition map (the reference wrote it to a partition
    FILE and reused it across jobs — the analog here is feeding these
    points to repartitionByRange-equivalent routing or bucketed
    writes). Distributed Greenwald-Khanna sketch; only the
    ``num_partitions - 1`` doubles reach the driver."""
    if num_partitions < 2:
        return []
    qs = [i / num_partitions for i in range(1, num_partitions)]
    return df.stat.approxQuantile(col, qs, relative_error)


def repartition_by_binary_range(
    df: DataFrame, n: int, col: str | Column, *, offset: int = 0, length: int = 4
) -> DataFrame:
    """BinaryPartitioner parity (CORE/mapreduce/lib/partition/
    BinaryPartitioner.java [H]): route rows by a byte-range of a binary
    key. Spark shuffles on any expression, so this is repartition over
    the sliced bytes (1-based substring offset, like the reference's
    left offset)."""
    c = F.col(col) if isinstance(col, str) else col
    return df.repartition(n, F.substring(c, offset + 1, length))


def partition_size_stats(df) -> "DataFrame":
    """Skew diagnostic: per-partition row counts plus summary stats —
    the first thing to look at when a stage straggles. One pass: group
    by ``spark_partition_id()`` then aggregate the counts; at any
    scale the intermediate is one row per NON-EMPTY partition, so the
    planned partition count (driver-side metadata, no job) supplies
    the denominator — a fully-skewed frame groups to one row, and
    without the planned count the ratio would read a perfect 1.0. A
    max/avg ratio near 1 means balanced; >> 1 means hot partitions —
    reach for repartition(), salting (joins.salted_join), or AQE skew
    handling, and use aggregations.frequent_values to find WHICH key
    is hot. ``n_empty`` > 0 with a high ratio is the classic
    hashed-to-few-keys signature."""
    from pyspark.sql import functions as F

    n_planned = df.rdd.getNumPartitions()
    per = df.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    avg = F.sum("rows") / F.lit(n_planned)
    return per.agg(
        F.lit(n_planned).alias("n_partitions"),
        (F.lit(n_planned) - F.count(F.lit(1))).alias("n_empty"),
        F.min("rows").alias("min_nonempty_rows"),
        F.max("rows").alias("max_rows"),
        F.round(avg, 2).alias("avg_rows"),
        F.round(F.max("rows") / avg, 3).alias("max_avg_ratio"),
    )
