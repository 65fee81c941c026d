from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
    load_table,
    load_tables,
    read_fixed_length,
    read_kv_text,
    read_multiple_inputs,
    read_text_lines,
)
from hadoop_2_10_0_src_mapreduce_spark.sources.writers import (
    write_null,
    write_partitioned,
    write_text_kv,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_text_lines",
    "read_kv_text",
    "read_fixed_length",
    "read_multiple_inputs",
    "write_text_kv",
    "write_partitioned",
    "write_null",
]
