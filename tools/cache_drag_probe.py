"""Isolate session-state drag on bench.py's in-session control.

The r12 driver window read weather_divergence 1.459 (in-session control
1.666 vs external probe 1.142). Two rival explanations:
  (a) session state — cache-manager entries / storage memory / listener
      state accumulated over 50 queries' persisted intermediates slow
      the control (code-caused, the thing per-query cache clearing
      would fix);
  (b) estimator width bias — a 32-wide Spark control suffers more from
      box-wide contention than a 1-thread external probe (bench.py's
      own documented caveat), i.e. weather, not code.

This probe measures (a) directly: time N control legs on a fresh
session, then persist+materialize K small frames (the bench's
steady-state cache population, ~dozens of entries), re-time N legs,
then clearCache() and re-time again. Same process, same moment — any
systematic leg inflation in the middle block is cache drag; none means
divergence is (b).

Usage: python tools/cache_drag_probe.py [K=60] [N=6]
"""

from __future__ import annotations

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import control_workload  # the EXACT control under study


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import functions as F

    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("cache-drag-probe")
    spark.sparkContext.setLogLevel("ERROR")

    control_workload(spark)  # settle JIT/first-shuffle, like the bench

    def legs(tag: str) -> list[float]:
        ts = [control_workload(spark) for _ in range(n)]
        print(f"{tag:14s} legs={ts} median={statistics.median(ts):.3f}")
        return ts

    clean = legs("clean")

    cached = []
    for i in range(k):
        df = (
            spark.range(0, 20_000, 1, 4)
            .select(
                (F.xxhash64("id", F.lit(i)) % 1000).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("s"),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"), F.min("s").alias("m"))
            .persist()
        )
        df.write.format("noop").mode("overwrite").save()  # materialize
        cached.append(df)
    print(f"persisted {k} frames; cache entries populated")

    dirty = legs("dirty")

    spark.catalog.clearCache()
    cleared = legs("cleared")

    med = statistics.median
    print(
        f"drag ratio dirty/clean={med(dirty)/med(clean):.3f} "
        f"cleared/clean={med(cleared)/med(clean):.3f}"
    )


if __name__ == "__main__":
    main()
