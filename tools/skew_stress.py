"""Planted-skew scale stress — measure (don't argue) the skew posture.

Generates a synthetic corpus ~10× the bench sf (a Zipf-hot join key, a
degenerate LSH bucket, a power-law cogroup key), runs the three
skew-guarded strategies over it, and reports
``operators.sortpart.partition_size_stats`` for the guarded vs naive
shuffle shapes plus end-to-end wall times. The claim under test: with
the guard in place NO task's partition exceeds ~2× the mean row count,
while the naive shape concentrates the hot key in one task — the
100 TB posture as a measured fact instead of a plan reading
(VERDICT r4 next-round #5; numbers recorded in SURVEY §8).

Usage:  python tools/skew_stress.py [--rows N]     (default 2_000_000)
Prints one JSON line. The same builders back the (smaller, CI-sized)
assertions in tests/test_scale_strategies.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_FRAC = 0.3  # the hot key's share of all fact rows
N_KEYS = 10_000
# Salt count sizing IS the lesson this harness teaches: each hot-key
# sub-group carries HOT_FRAC/SALTS of the table, and a shuffle
# partition that receives c colliding sub-groups holds ≥ c·that — so
# for a ≤2× bound at PARTS partitions, pick SALTS ≥ ~2·HOT_FRAC·PARTS
# (here 64 ⇒ sub-groups of 0.47% each ≈ 0.3× the partition mean; a
# first run with SALTS=16 measured ratio 4.7 from exactly this
# collision arithmetic — sub-groups at 1.2× mean, birthday-colliding).
SALTS = 64
PARTS = 64  # shuffle width under measurement


def zipf_facts(spark: SparkSession, n_rows: int) -> DataFrame:
    """Fact rows where HOT_FRAC of them share key 0 and the rest
    spread uniformly — the power-law join input."""
    return spark.range(n_rows).select(
        F.when(
            (F.col("id") % F.lit(int(1 / HOT_FRAC))) == 0, F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS - 1)) + 1)
        .alias("k"),
        F.col("id").alias("fact_id"),
        (F.col("id") % 997).cast("double").alias("v"),
    )


def degenerate_embeddings(spark: SparkSession, n_rows: int, dim: int = 16) -> DataFrame:
    """Embedding rows where HOT_FRAC are the IDENTICAL vector (one LSH
    bucket by construction) and the rest vary per id."""
    base = spark.range(n_rows).select(F.col("id").alias("vec_id"))
    hot = F.array(*[F.lit(float(d + 1)) for d in range(dim)])
    varied = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("vec_id") + F.lit(d * 1000)), F.lit(1000))
             .cast("double") / 500.0 - 1.0)
            for d in range(dim)
        ]
    )
    return base.select(
        "vec_id",
        F.when((F.col("vec_id") % F.lit(int(1 / HOT_FRAC))) == 0, hot)
        .otherwise(varied)
        .alias("embedding"),
    )


def powerlaw_events(
    spark: SparkSession, n_rows: int, n_users: int = 5000, shift: int = 100
) -> DataFrame:
    """Event rows whose user frequencies follow ~1/(rank+shift) — many
    tiny groups and a heavy head, but NO single dominant key (the
    shift caps the top user at ~shift·ln-factor below dominance).
    That is the regime fine-key bucketing legitimately fixes; a single
    key holding 10%+ of all rows lands in ONE bucket no matter the
    bucketing and needs pre-aggregation instead — cogroup_reduce's
    docstring says exactly that, and run_cogroup_stress measures the
    distinction rather than papering over it."""
    # inverse-CDF of the shifted harmonic weights via the exp map over
    # a unit-uniform hash: rank = floor(exp(u·ln((n+s)/s))·s) − s
    u = (F.pmod(F.xxhash64("id"), F.lit(1 << 20)) + F.lit(0.5)) / F.lit(float(1 << 20))
    span = F.log(F.lit(float(n_users + shift) / shift))
    rank = F.floor(F.exp(u * span) * shift) - shift
    return spark.range(n_rows).select(
        F.least(rank.cast("long"), F.lit(n_users - 1)).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") % 86_400).alias("ts_s"),
    )


def _stats(df: DataFrame) -> dict:
    from hadoop_2_10_0_src_mapreduce_spark.operators.sortpart import (
        partition_size_stats,
    )

    return partition_size_stats(df).collect()[0].asDict()


def run_join_stress(spark: SparkSession, n_rows: int) -> dict:
    from hadoop_2_10_0_src_mapreduce_spark.operators.joins import salted_join

    facts = zipf_facts(spark, n_rows).persist()
    facts.count()
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    naive = _stats(facts.repartition(PARTS, "k"))
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(SALTS))
    salted = _stats(facts.withColumn("_salt", salt).repartition(PARTS, "k", "_salt"))
    t0 = time.time()
    n_out = salted_join(facts, dim, ["k"], salt_buckets=SALTS).count()
    wall = round(time.time() - t0, 2)
    facts.unpersist()
    return {
        "naive_ratio": naive["max_avg_ratio"],
        "salted_ratio": salted["max_avg_ratio"],
        "join_rows": n_out,
        "join_wall_sec": wall,
    }


def run_lsh_stress(spark: SparkSession, n_rows: int, max_bucket: int = 1024) -> dict:
    from hadoop_2_10_0_src_mapreduce_spark.operators.similarity import (
        capped_lsh_buckets,
        lsh_signatures,
        md5_planes,
    )

    emb = degenerate_embeddings(spark, n_rows).persist()
    emb.count()
    n_planes, n_tables, dim = 6, 4, 16
    sigs = lsh_signatures(
        emb, vec_col="embedding", n_planes=n_planes, n_tables=n_tables,
        planes=md5_planes(n_tables, n_planes, dim),
    ).persist()
    naive = _stats(sigs.repartition(PARTS, "table_idx", "bucket"))
    salted = _stats(
        sigs.withColumn(
            "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(SALTS)).cast("int")
        ).repartition(PARTS, "table_idx", "bucket", "_salt")
    )
    t0 = time.time()
    capped = capped_lsh_buckets(
        emb, n_planes=n_planes, n_tables=n_tables, dim=dim,
        max_bucket=max_bucket, cap_salts=SALTS,
    )
    over = (
        capped.groupBy("table_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .count()
    )
    wall = round(time.time() - t0, 2)
    sigs.unpersist()
    emb.unpersist()
    return {
        "naive_ratio": naive["max_avg_ratio"],
        "salted_ratio": salted["max_avg_ratio"],
        "overfull_buckets_after_cap": over,
        "cap_wall_sec": wall,
    }


def run_cogroup_stress(spark: SparkSession, n_rows: int, buckets: int = 1024) -> dict:
    """Bucketing trades TWO quantities against group count: the
    per-group Python+Arrow overhead (fewer, bigger groups amortize it
    — the measured 5–7 s → 0.3 s win in cogroup_reduce's docstring)
    and hash balance, which needs the number of DISTINCT shuffle keys
    ≫ the partition count (64 buckets into 64 partitions
    birthday-collide to ~4.5× skew — measured; 1024 buckets track the
    fine-key balance within a few percent). So pick buckets ≈ 10–30×
    the shuffle width: far fewer groups than raw fine keys, and
    hash-smooth."""
    ev = powerlaw_events(spark, n_rows).persist()
    ev.count()
    naive = _stats(ev.repartition(PARTS, "user_id"))
    bucketed = _stats(
        ev.withColumn(
            "_b", F.pmod(F.xxhash64("user_id"), F.lit(buckets)).cast("int")
        ).repartition(PARTS, "_b")
    )
    ev.unpersist()
    return {
        "naive_ratio": naive["max_avg_ratio"],
        "bucketed_ratio": bucketed["max_avg_ratio"],
    }


def main() -> None:
    n_rows = 2_000_000
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--rows" and i + 1 < len(argv):
            n_rows = int(argv[i + 1])
        elif a.startswith("--rows="):
            n_rows = int(a.split("=", 1)[1])
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    out = {
        "rows": n_rows,
        "join": run_join_stress(spark, n_rows),
        "lsh": run_lsh_stress(spark, max(n_rows // 10, 10_000)),
        "cogroup": run_cogroup_stress(spark, n_rows),
        "total_wall_sec": None,
    }
    out["total_wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
