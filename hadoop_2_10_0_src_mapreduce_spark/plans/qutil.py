"""Shared helpers keeping registered queries hash-identical between
Spark and the DuckDB oracle (see plans.registry docstring for rules).

The fixture money columns are exact 2-decimal values stored as double
(verified against sf0.01), so casting them to DECIMAL(18,2) recovers
the exact value in both engines; decimal arithmetic + decimal SUM is
then exact ⇒ independent of partitioning/accumulation order — the same
reason the reference's LongSumReducer results were order-independent
(integer adds commute; SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, typ: str = MONEY) -> Column:
    """Order-independent SUM of a money-ish double column → DOUBLE."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col: str | Column, ndigits: int = 6, typ: str = MONEY) -> Column:
    """Deterministic AVG: exact decimal sum / count, rounded in double."""
    return F.round(F.sum(dec(col, typ)).cast("double") / F.count(F.lit(1)), ndigits)


# SQL-side counterparts (DuckDB syntax == ANSI here).

def sql_dsum(expr: str, typ: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE)"


def sql_davg(expr: str, ndigits: int = 6, typ: str = "DECIMAL(18,2)") -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT(*), {ndigits})"
