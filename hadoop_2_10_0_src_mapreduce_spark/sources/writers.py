"""Writers — OutputFormat/committer parity (SURVEY.md §2.2).

Reference contract: ``OutputFormat + RecordWriter + OutputCommitter``
(CORE/mapreduce/OutputFormat.java, lib/output/* [H]). Spark file sinks
run the same two-phase FileOutputCommitter protocol (literally the same
class on Hadoop-backed filesystems), so sinks here are declarative
wrappers choosing format/layout:

- TextOutputFormat        → write_text_kv (key<TAB>value lines)
- SequenceFileOutputFormat→ parquet (write_table) — self-describing,
  compressed, splittable: the role SequenceFile played.
- MapFileOutputFormat     → write_sorted_bucketed (sorted + bucketed:
  point lookups become bucket-pruned joins)
- MultipleOutputs         → write_partitioned (content-derived dirs via
  partitionBy) — exact per-record *filename* control is out of scope
  (needs a custom FileCommitProtocol; documented delta, SURVEY §4.3).
- LazyOutputFormat        → Spark file sinks already skip empty
  partitions; nothing to do.
- NullOutputFormat        → write_null (the 'noop' sink).
- DBOutputFormat          → df.write.jdbc (thin; no JDBC server on-box).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(df: DataFrame, path: str, *, mode: str = "error", compression: str = "zstd") -> None:
    """The engine's default sink: compressed parquet. ``mode='error'``
    mirrors OutputFormat.checkOutputSpecs failing on existing output."""
    df.write.mode(mode).option("compression", compression).parquet(path)


def write_text_kv(
    df: DataFrame,
    path: str,
    key: str,
    value: str,
    *,
    sep: str = "\t",
    mode: str = "error",
    compression: str | None = None,
) -> None:
    """TextOutputFormat parity: ``key<TAB>value`` lines, optional codec."""
    out = df.select(F.concat_ws(sep, F.col(key).cast("string"), F.col(value).cast("string")).alias("value"))
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    *partition_cols: str,
    mode: str = "error",
) -> None:
    """MultipleOutputs parity: output directory derived from record
    content (generateFileNameForKeyValue → partitionBy dirs). At scale,
    prefer low-cardinality partition columns; high-cardinality here is
    the classic small-files regression."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    *,
    buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """MapFileOutputFormat parity: sorted, indexed KV file for point
    lookups. Bucketed+sorted table ≈ MapFile: a later equi-join on
    ``key`` against another table bucketed the same way skips the
    shuffle entirely (CompositeInputFormat's precondition, made durable).
    ``path`` makes it an external table (outside the warehouse dir)."""
    writer = df.write.mode(mode).bucketBy(buckets, key).sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_sequence_file(df: DataFrame, path: str, key: str, value: str) -> None:
    """SequenceFileOutputFormat parity (CORE/mapreduce/lib/output/
    SequenceFileOutputFormat.java [H]): write (key, value) columns as a
    Hadoop SequenceFile, Writable classes inferred from the Python
    values. Interop escape hatch for legacy consumers — new data should
    go through ``write_table`` (parquet plays SequenceFile's role)."""
    df.select(key, value).rdd.map(tuple).saveAsSequenceFile(path)


def write_null(df: DataFrame) -> None:
    """NullOutputFormat parity: run the plan, discard the output
    (side-effect/metrics-only jobs). Spark ships a 'noop' sink."""
    df.write.format("noop").mode("overwrite").save()


def write_side_outputs(
    df: DataFrame,
    base_path: str,
    splits: dict[str, Column],
    *,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """MultipleOutputs NAMED side-outputs parity (beyond partitionBy's
    content-derived dirs): route rows to named outputs by predicate,
    one filtered write per name — `<base_path>/<name>/`.

    Predicates may overlap or under-cover (a row can go to several
    outputs or none), matching MultipleOutputs.write(name, ...)
    semantics where the mapper chooses destinations explicitly. Each
    write re-reads the source plan; persist ``df`` first if it is
    expensive and the split count is large."""
    for name, cond in splits.items():
        (
            df.where(cond)
            .write.mode(mode)
            .format(format)
            .save(f"{base_path}/{name}")
        )
