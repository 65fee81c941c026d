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


def _ordered_specs() -> list[QuerySpec]:
    """Registry order with every oracle-less query LAST.

    The driver correctness-checks only the first 50 entries of
    ``queries()``; an oracle-bearing query registered after a rows-only
    one could silently fall outside that window (it did in round 1).
    Oracle-bearing queries keep their registration order up front;
    rows-only queries trail, where a dropped check costs the least.
    """
    _load_catalog()
    specs = list(REGISTRY.values())
    with_oracle = [s for s in specs if s.oracle is not None]
    rows_only = [s for s in specs if s.oracle is None]
    if len(with_oracle) > 50:
        raise RuntimeError(
            f"{len(with_oracle)} oracle-bearing queries exceed the driver's "
            "50-checked-query window; merge or demote some"
        )
    return with_oracle + rows_only


def all_queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def all_oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered_specs() if spec.oracle is not None}
