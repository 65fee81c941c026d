"""Ad-hoc per-query timer for optimization work (not the bench).

Usage: python tools/time_queries.py q1 q2 ... [--passes N]
Times each named registered query end-to-end through the noop sink at
$SPARK_GRAFT_SF_DIR (default sf0.1), reporting every pass and the min —
same measurement semantics as bench.py, restricted to the queries under
study so an iteration loop is seconds, not a minute.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_2_10_0_src_mapreduce_spark.plans.registry import all_queries
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        fn = qs[name]
        ts = []
        for _ in range(passes):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        print(f"{name:30s} min={min(ts):6.3f}  passes={ts}")


if __name__ == "__main__":
    main()
