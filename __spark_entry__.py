"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``hadoop_2_10_0_src_mapreduce_spark.plans``: every
implemented operator from SURVEY.md §2 registers a named query + oracle
SQL there; this module just re-exports the registry in the driver's
shape (``entry`` / ``queries`` / ``oracle_sql``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_2_10_0_src_mapreduce_spark.plans.registry import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hadoop_2_10_0_src_mapreduce_spark.plans.catalog.core import entry_query

    return entry_query(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return all_oracle_sql()
