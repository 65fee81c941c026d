"""Query catalog: importing this package registers every implemented
query into ``plans.registry.REGISTRY``. One module per SURVEY.md §2
area; each module's queries are the acceptance tests for that area's
operators."""

from hadoop_2_10_0_src_mapreduce_spark.plans.catalog import (  # noqa: F401
    aggregates,
    core,
    dedupops,
    joins,
    mmops,
    simops,
    sorts,
    sourceops,
    streamops,
    textops,
    transforms,
    udfops,
)
