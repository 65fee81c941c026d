"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference `amberlu/hadoop-2.10.0-src-mapreduce`
(Apache Hadoop 2.10.0, MapReduce subtree).

The reference's execution layer (sort-shuffle, spill, merge, commit —
SURVEY.md §3-§4) IS Spark itself; this package re-expresses the
reference's *operator/capability* layer (SURVEY.md §2) as idiomatic
DataFrame/SQL code, plus large-scale training-data-pipeline extensions
(dedup, similarity search, multimodal plumbing, text analysis).

Layout
------
- ``session``    : SparkSession factory with 100TB-posture defaults (AQE,
                   skew-join handling, UTC, Arrow).
- ``sources``    : readers/writers — InputFormat/OutputFormat parity.
- ``operators``  : transforms, joins, aggregations, sorts, sets, dedup,
                   similarity — Mapper/Reducer-library parity + extensions.
- ``functions``  : scalar/text/multimodal column functions.
- ``plans``      : query registry (drives ``__spark_entry__``) and the
                   JobControl DAG analog.
- ``streaming``  : Structured Streaming extension (no reference parity —
                   Hadoop MR 2.10.0 is strictly batch, SURVEY.md §2.9).
- ``pipeline``   : the end-to-end corpus recipe (clean → gate → redact)
                   plus data mixing, sequence packing, and JSONL-shard
                   publishing.
"""

from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
