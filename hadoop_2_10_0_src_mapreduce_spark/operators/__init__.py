from hadoop_2_10_0_src_mapreduce_spark.operators import (  # noqa: F401
    aggregations,
    dedup,
    joins,
    sets,
    similarity,
    sortpart,
    transforms,
)
