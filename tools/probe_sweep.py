"""n_probe recall/latency sweep over ONE saved IVF index — the
measurement behind the adaptive_probes fraction (PROBE_FRACTION=16).

ann_bench rebuilds every index per invocation (fair cross-family
comparison, but ~3 min per build at 200k vectors); tuning the probe
fan only needs ONE build and N serves. This reproduces the r7 sweep
that picked the fraction: 200k vectors / 1516 auto lists ->
recall@10 0.102 @ 4 probes, 0.392 @ 48, 0.557 @ 95 (= ceil(L/16),
the shipped rule), 0.657 @ 152, 0.771 @ 256, serve walls flat.

Usage: python tools/probe_sweep.py [sf_dir] [--probes=4,48,95,152,256]
                                   [--queries=100] [--k=10]
Prints one JSON line per point; build geometry is n_centroids="auto".
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (engine package)
sys.path.insert(0, _HERE)  # tools/ (shared recall_at_k from ann_bench)


def main() -> int:
    from pyspark.sql import functions as F

    from hadoop_2_10_0_src_mapreduce_spark.operators import similarity
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    probes = [4, 48, 95, 152, 256]
    n_queries, k = 100, 10
    for a in sys.argv[1:]:
        if a.startswith("--probes="):
            probes = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--queries="):
            n_queries = int(a.split("=", 1)[1])
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])

    spark = get_spark(
        "probe_sweep",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()
    queries = emb.where(F.col("vec_id") < n_queries).persist()
    queries.count()
    from ann_bench import recall_at_k  # shared: one recall definition

    exact_rows = similarity.brute_force_topk(emb, queries, k=k).collect()

    work = tempfile.mkdtemp(prefix="probe_sweep_")
    path = f"{work}/ivf"
    t0 = time.time()
    similarity.save_ivf_index(emb, path, n_centroids="auto")
    n_lists = spark.read.parquet(f"{path}/centroids").count()
    print(json.dumps({
        "metric": "probe_sweep", "sf_dir": sf_dir, "n": n,
        "n_lists": n_lists, "build_sec": round(time.time() - t0, 1),
        "auto_probe": similarity.adaptive_probes(n_lists),
    }), flush=True)
    for np_ in probes:
        t0 = time.time()
        rows = similarity.query_ivf_index(
            queries, path, k=k, n_probe=np_
        ).collect()
        el = round(time.time() - t0, 2)
        rec = recall_at_k(rows, exact_rows, k)
        # drop persisted fan/union fragments so serves don't compound
        spark.catalog.clearCache()
        emb.persist().count()
        queries.persist().count()
        print(json.dumps(
            {"n_probe": np_, "serve_sec": el, "recall": rec}
        ), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
