"""Build-side multi-probe recall check — the r10 measurement behind
extending the serve path's flip dial (adaptive_multiprobe) to
``ann_lsh_topk``'s in-session self-ANN.

The serve path's r9 sweep (tools/lsh_table_sweep.py --multiprobe)
showed each flip level substitutes for a table doubling within ~11%
at fixed store. The build-side self-join inherits the same geometry
ceiling: a store-pinned user running in-session ANN at (13 bits,
16 tables) sits at the same ~0.07 recall@10 the serve path escaped.
This check measures the SELF-ANN recall at a pinned sparse geometry
per flip count, against brute-force ground truth for the first
``--queries`` vectors (self-ANN computes top-k for every vector; the
recall sample keeps the check tractable — the WALL is still the full
self-join, the honest build-side cost).

Defaults subset the 200k corpus to 50k vectors so the q=4 candidate
volume (n·L·2^q·E[bucket]) stays in the 10^7-pair range on a local
box; the geometry (13 bits / 16 tables) reproduces the deficit the
auto rules would only reach at the table cap.

Usage:
  python tools/selfann_multiprobe_check.py [corpus_dir] [--n=50000]
         [--queries=100] [--k=10] [--planes=13] [--tables=16]
         [--flips=0,1,2,3,4]
Prints one JSON line per flip count.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def main() -> int:
    corpus_dir = "/tmp/vec200k"
    n_sub, n_queries, k, planes, tables = 50_000, 100, 10, 13, 16
    flips = [0, 1, 2, 3, 4]
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n_sub = int(a.split("=", 1)[1])
        elif a.startswith("--queries="):
            n_queries = int(a.split("=", 1)[1])
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--planes="):
            planes = int(a.split("=", 1)[1])
        elif a.startswith("--tables="):
            tables = int(a.split("=", 1)[1])
        elif a.startswith("--flips="):
            flips = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif not a.startswith("--"):
            corpus_dir = a

    from pyspark.sql import functions as F

    from ann_bench import recall_at_k
    from hadoop_2_10_0_src_mapreduce_spark.operators import similarity
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark(
        "selfann_multiprobe",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < n_sub)
        .persist()
    )
    n = emb.count()
    queries = emb.where(F.col("vec_id") < n_queries).persist()
    queries.count()
    exact_rows = similarity.brute_force_topk(emb, queries, k=k).collect()
    print(json.dumps({
        "metric": "selfann_multiprobe", "corpus": corpus_dir, "n": n,
        "n_planes": planes, "n_tables": tables, "k": k,
        "auto_flips": similarity.adaptive_multiprobe(planes, tables),
    }), flush=True)

    for q in flips:
        t0 = time.time()
        rows = (
            similarity.ann_lsh_topk(
                emb, k=k, n_planes=planes, n_tables=tables, n_multiprobe=q
            )
            .where(F.col("query_id") < n_queries)
            .collect()
        )
        el = round(time.time() - t0, 2)
        rec = recall_at_k(rows, exact_rows, k)
        spark.catalog.clearCache()
        emb.persist().count()
        queries.persist().count()
        print(json.dumps({
            "multiprobe": q, "wall_sec": el, "recall": rec,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
