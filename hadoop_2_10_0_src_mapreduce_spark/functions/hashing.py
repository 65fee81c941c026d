"""The engine-replayable md5→uint32 idiom, defined ONCE.

Several determinism-critical components map a string to a number any
SQL engine reproduces bit-for-bit: u32 = the first 8 hex digits of
md5(s) read as an unsigned 32-bit int, optionally scaled by 2⁻³² onto
the unit interval (every step exact in binary64). Train/val/test
splits, layout-independent sampling, the IVF training stride, and the
ANN hyperplane/seed constructions all rely on it — and their DuckDB
oracles re-derive it — so the Spark and SQL forms live here as one
pair that cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_u32(s: Column) -> Column:
    """uint32 of md5(s)[:8] as a LONG column; ``s`` must be a string
    column (cast upstream so callers control the text form hashed)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def md5_unit(s: Column) -> Column:
    """md5_u32 scaled onto [0, 1): exact in binary64 (÷2³² only
    shifts the exponent)."""
    return md5_u32(s).cast("double") / F.lit(2.0**32)


# DuckDB has no conv(); the positional-digit arithmetic below computes
# the same uint32 from a hex string column aliased ``h`` (everything
# stays integer until the caller's optional ÷2³²).
MD5_HEX2INT_SQL = " + ".join(
    f"(instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
    for j in range(8)
)


def md5_u32_sql(expr: str) -> str:
    """Scalar-subquery form: uint32 of md5(expr)[:8] in DuckDB SQL."""
    return f"(SELECT {MD5_HEX2INT_SQL} FROM (SELECT md5({expr}) AS h))"
