from hadoop_2_10_0_src_mapreduce_spark.functions import udf  # noqa: F401
