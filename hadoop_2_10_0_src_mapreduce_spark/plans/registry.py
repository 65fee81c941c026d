"""Query registry — single source of truth behind ``__spark_entry__``.

Each implemented capability from SURVEY.md §2 registers one named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL string over the same
parquet tables. The driver hash-compares the two at sf0.01.

Determinism rules every registered query follows (SURVEY §7 risks):
- Alias EVERY computed column identically in Spark and oracle SQL.
- Money/double sums go through DECIMAL so the result is independent of
  partitioning/accumulation order in both engines, then CAST back to
  DOUBLE for a stable schema.
- Averages: ROUND(double, ndigits) in both engines.
- Timestamps compared as DATE or epoch — never raw timestamp values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver does a weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, *, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def _load_catalog() -> None:
    # Importing the catalog modules populates REGISTRY via @register.
    from hadoop_2_10_0_src_mapreduce_spark.plans import catalog  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_catalog()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load_catalog()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
