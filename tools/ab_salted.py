"""Alternating A/B for join_salted's SHUFFLE_HASH hint (r12 verdict #1).

Runs the registered join_salted query end-to-end through the noop sink,
alternating A (hint, current default) and B (no hint — the gate's
fallback path, forced by zeroing SHUFFLE_HASH_MAX_BUILD_BYTES) within
one session so host weather cancels pairwise.

Usage: python tools/ab_salted.py [reps=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_2_10_0_src_mapreduce_spark.operators import joins
    from hadoop_2_10_0_src_mapreduce_spark.plans.registry import all_queries
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("ab-salted")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()["join_salted"]
    default_gate = joins.SHUFFLE_HASH_MAX_BUILD_BYTES

    def run(tag: str) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run("warmup")
    a_times, b_times = [], []
    for r in range(reps):
        joins.SHUFFLE_HASH_MAX_BUILD_BYTES = default_gate
        a_times.append(run("A"))
        joins.SHUFFLE_HASH_MAX_BUILD_BYTES = 0
        b_times.append(run("B"))
        print(f"rep {r}: hint={a_times[-1]}  nohint={b_times[-1]}", flush=True)
    joins.SHUFFLE_HASH_MAX_BUILD_BYTES = default_gate
    print(f"A(hint)   min={min(a_times)} all={a_times}")
    print(f"B(nohint) min={min(b_times)} all={b_times}")


if __name__ == "__main__":
    main()
