"""Set operations (SURVEY.md §2.7).

The reference had UNION ALL as a primitive (multi-path FileInputFormat)
and expressed DISTINCT / UNION / INTERSECT / EXCEPT as shuffle-group
idioms (identity map + reduce-side tag counting, DATAJOIN machinery).
Spark has all four as first-class operators; these wrappers exist to
name the parity and normalize by-name union semantics.

Scale note: distinct/intersect/except shuffle on the full row — at
100 TB prefer dropDuplicates(subset) on a key projection over
whole-row distinct, and pre-project to the minimal column set (column
pruning keeps the shuffle narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL, by column name (MultipleInputs never guaranteed
    column order either)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def union_distinct(*dfs: DataFrame) -> DataFrame:
    return union_all(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_(a: DataFrame, b: DataFrame, *, keep_duplicates: bool = False) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)


def distinct(df: DataFrame, *cols: str) -> DataFrame:
    """DISTINCT / dedup-by-key. With cols → dropDuplicates(subset):
    the shuffle carries only the dedup keys' hash, not a whole-row
    compare, which is what you want at scale."""
    return df.dropDuplicates(list(cols)) if cols else df.distinct()
