"""Per-record transforms — Mapper-library parity (SURVEY.md §2.3).

The reference's projection/filter/scalar surface is arbitrary Java in
``Mapper.map()`` plus a small shipped mapper library
(CORE/mapreduce/lib/map/*, lib/fieldsel/* [H]). Everything here is
pure Column expressions — JVM-side, codegen-friendly, never a Python
row loop — because at 100 TB the per-record path is the hot path.

Parity map:
- Mapper (identity/general)   → select/withColumn/filter; mapInPandas
                                for genuinely imperative 1→N logic
- InverseMapper               → inverse
- TokenCounterMapper          → tokenize (+ wordcount in catalog)
- RegexMapper                 → regex_matches
- FieldSelectionMapper/Helper → field_select (unix-cut field specs)
- ChainMapper/ChainReducer    → chain (plain composition; Catalyst
                                collapses adjacent projections)
- Grep example                → grep_count
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default tokenization shared by every text query AND its DuckDB oracle
# (both regex engines treat this pattern identically): lowercase,
# alphanumeric runs. StringTokenizer split on whitespace; we normalize
# punctuation too so counts are stable across sources.
TOKEN_PATTERN = "[a-z0-9]+"


def inverse(df: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """InverseMapper parity: (k, v) → (v, k)."""
    return df.select(F.col(value).alias(key), F.col(key).alias(value))


def tokenize(df: DataFrame, col: str = "value", pattern: str = TOKEN_PATTERN) -> DataFrame:
    """TokenCounterMapper parity (minus the count): one row per token.

    `explode(regexp_extract_all(lower(col)))` stays entirely in
    whole-stage codegen — the 1→N emit that Mapper.map did per-record.
    """
    return df.select(
        F.explode(F.regexp_extract_all(F.lower(F.col(col)), F.lit(pattern), 0)).alias("token")
    )


def regex_matches(df: DataFrame, col: str, pattern: str, group: int = 0) -> DataFrame:
    """RegexMapper parity: emit one row per regex(-group) match."""
    return df.select(
        F.explode(F.regexp_extract_all(F.col(col), F.lit(pattern), group)).alias("match")
    )


def grep_count(df: DataFrame, col: str, pattern: str, group: int = 0) -> DataFrame:
    """Grep example parity (EX/Grep.java [H]): match counts, desc.

    The reference ran TWO chained jobs (count, then sort-by-count);
    here it is one declarative plan — Catalyst pipelines the sort over
    the aggregated (tiny) intermediate, no materialization between.
    """
    return (
        regex_matches(df, col, pattern, group)
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "match")
    )


def _parse_field_spec(spec: str) -> list[tuple[int, int | None]]:
    """Parse a FieldSelectionHelper spec fragment: '2,4-6,8-' →
    [(2,2),(4,6),(8,None)]; None = to end of record."""
    out: list[tuple[int, int | None]] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo, _, hi = part.partition("-")
            out.append((int(lo), int(hi) if hi else None))
        else:
            out.append((int(part), int(part)))
    return out


def field_select(
    df: DataFrame,
    col: str,
    spec: str,
    sep: str = "\t",
) -> DataFrame:
    """FieldSelectionMapper parity: unix-`cut`-style projection.

    ``spec`` = ``"keyFields:valueFields"`` where each side is a list of
    0-based field indices / ranges, e.g. ``"0,2:3-"``. Splits ``col``
    on ``sep``, re-joins the selected fields with ``sep`` into
    ``key`` / ``value`` string columns — exactly the reference's output
    shape (lib/fieldsel/FieldSelectionHelper.java [H]).
    """
    key_spec, _, val_spec = spec.partition(":")
    fields = F.split(F.col(col), sep)

    def pick(fragments: list[tuple[int, int | None]]) -> Column:
        parts: list[Column] = []
        for lo, hi in fragments:
            if hi is None:
                # open range: slice to end
                parts.append(
                    F.array_join(F.slice(fields, lo + 1, F.size(fields) - lo), sep)
                )
            else:
                for i in range(lo, hi + 1):
                    # F.get → null (not ANSI error) when a line has fewer fields
                    parts.append(F.coalesce(F.get(fields, i), F.lit("")))
        if not parts:
            return F.lit("")
        return F.concat_ws(sep, *parts)

    return df.select(
        pick(_parse_field_spec(key_spec)).alias("key"),
        pick(_parse_field_spec(val_spec)).alias("value"),
    )


def chain(*stages: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
    """ChainMapper/ChainReducer parity: compose [MAP+ / REDUCE MAP*]
    stages into one function. In Spark this buys nothing the optimizer
    doesn't already do (adjacent narrow ops fuse into one codegen
    stage) — provided for API parity."""

    def run(df: DataFrame) -> DataFrame:
        for s in stages:
            df = s(df)
        return df

    return run


def with_line(df: DataFrame, cols: Sequence[str], sep: str = "\t", out: str = "line") -> DataFrame:
    """Helper: serialize columns into a sep-joined line (the shape the
    reference's text-processing mappers consumed)."""
    return df.withColumn(out, F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]))
