from hadoop_2_10_0_src_mapreduce_spark.streaming.windows import (  # noqa: F401
    session_window_agg,
    sliding_window_counts,
    tumbling_window_counts,
)
