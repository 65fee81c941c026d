from hadoop_2_10_0_src_mapreduce_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    all_oracle_sql,
    all_queries,
    register,
)

__all__ = ["REGISTRY", "QuerySpec", "register", "all_queries", "all_oracle_sql"]
