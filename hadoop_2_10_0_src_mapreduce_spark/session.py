"""SparkSession factory with scale-oriented defaults.

The reference engine's physical posture (sort-based shuffle with spill,
combiner partial aggregation, map-side merge join on co-partitioned data,
broadcast of DistributedCache'd small tables — SURVEY.md §4.2) is all
built into Spark; the one thing a 100 TB deployment still has to get
right is *configuration*: AQE on (runtime re-plan, skew-join splitting,
broadcast conversion), sane shuffle partitioning, UTC timestamps (so
results are reproducible across clusters), and Arrow for any
Python-side exchange.

Every knob here is a plain public Spark conf; override any of them via
``extra_conf`` or by building your own session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for correctness-at-scale first, local-test speed second.
SCALE_DEFAULTS: dict[str, str] = {
    # Runtime re-planning: partition coalescing, skew-join splitting,
    # sort-merge→broadcast conversion. Non-negotiable at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamps regardless of cluster timezone.
    "spark.sql.session.timeZone": "UTC",
    # Arrow batching for every pandas_udf / applyInPandas / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet: pushdown + vectorized read are on by default in Spark 4;
    # pinned here so a misconfigured cluster can't silently regress them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Partition sizing: 128MB input partitions (HDFS-block-sized splits,
    # the same granularity FileInputFormat used).
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def get_spark(
    app_name: str = "mapreduce-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Parameters
    ----------
    master : default ``local[$SPARK_GRAFT_CPUS]`` when no cluster master
        is configured in the environment; on a real cluster pass None
        and let spark-submit decide.
    shuffle_partitions : default = env ``SPARK_GRAFT_CPUS`` (local) —
        at cluster scale set to ~2-3x total cores or rely on AQE
        coalescing from a high initial value.
    """
    builder = SparkSession.builder.appName(app_name)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(SCALE_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
