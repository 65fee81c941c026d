"""n_tables recall/latency/store sweep over ONE saved LSH index — the
measurement behind adaptive_tables (tables double per bit past the
10-bit geometry). Mirrors tools/probe_sweep.py's one-build-N-serves
shape: hyperplanes are md5-derived per (table, plane, dim), so the
first T tables of a MAX_TABLES-table build are bit-identical to a
T-table build — each sweep point is a sub-store made of symlinks to
the first T table directories plus a patched conf, served through the
real query_lsh_index path.

Context (SURVEY §8 r7): at the 200k-vector corpus the bit rule gives
13 bits and the then-fixed 16 tables hit a 0.07 recall@10 ceiling —
"the dial is MORE TABLES, not fewer bits". This sweep measures that
dial: recall, serve wall, and store bytes per table count.

r8 measured run (200k vectors / 13 bits / float store, 100 queries,
k=10): recall@10 16 → 0.070, 32 → 0.137, 64 → 0.244, 128 → 0.435
(the shipped adaptive_tables point); store 0.84 → 6.7 GB linear.
The FIRST run found the serve-side defect: the literal OR-of-ANDs
probed predicate cost 77 s at 64 tables and 246 s at 128 (planning/
filter compilation) — with query_lsh_index's broadcast semi-join
pruning (LSH_LITERAL_PRED_MAX) the same serves are 5.9 / 7.4 s,
flat across the sweep.

Usage: python tools/lsh_table_sweep.py [corpus_dir] [--tables=16,32,64,128]
                                       [--queries=100] [--k=10] [--int8]
                                       [--multiprobe=0,1,2,3,4]
Prints one JSON line per point.

--multiprobe (r9): serve each table-count sub-store once per flip
count — the measurement behind adaptive_multiprobe (flips substitute
for table doublings at fixed store; the probed-bucket volume of
(tables, flips) is tables·2^flips). One point per (tables, flips).

r9 measured run (200k vectors / 13 bits / float store, 100 queries,
k=10): recall@10 at 16 tables q=0..4 → 0.070, 0.136, 0.238, 0.386,
0.542; at 32 tables → 0.137, 0.242, 0.400, 0.597, 0.776. Each flip
tracks the table doubling it substitutes for within ~11%; q=4 at 16
tables BEATS the 128-table point (0.435) at 1/8 the store, serve
walls flat 2.7-9.3 s across the grid.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def main() -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq_
    from pyspark.sql import functions as F

    from hadoop_2_10_0_src_mapreduce_spark.operators import similarity
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    corpus_dir = args[0] if args else "/tmp/vec200k"
    tables = [16, 32, 64, 128]
    n_queries, k = 100, 10
    multiprobe = [0]
    quantize = "--int8" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tables = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--queries="):
            n_queries = int(a.split("=", 1)[1])
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--multiprobe="):
            multiprobe = [int(x) for x in a.split("=", 1)[1].split(",")]

    spark = get_spark(
        "lsh_table_sweep",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()
    queries = emb.where(F.col("vec_id") < n_queries).persist()
    queries.count()
    from ann_bench import du, recall_at_k

    exact_rows = similarity.brute_force_topk(emb, queries, k=k).collect()

    work = tempfile.mkdtemp(prefix="lsh_table_sweep_")
    path = f"{work}/lsh_full"
    t_max = max(tables)
    t0 = time.time()
    similarity.save_lsh_index(
        emb, path, n_planes="auto", n_tables=t_max, quantize=quantize
    )
    build = round(time.time() - t0, 1)
    conf = spark.read.parquet(f"{path}/conf").collect()[0]
    print(json.dumps({
        "metric": "lsh_table_sweep", "corpus": corpus_dir, "n": n,
        "n_planes": int(conf.n_planes), "built_tables": t_max,
        "build_sec": build, "int8": quantize,
        "auto_tables": similarity.adaptive_tables(n),
    }), flush=True)

    for t_count in sorted(tables):
        sub = f"{work}/lsh_{t_count}"
        os.makedirs(f"{sub}/buckets", exist_ok=True)
        store_bytes = 0
        for ti in range(t_count):
            src = f"{path}/buckets/table_idx={ti}"
            dst = f"{sub}/buckets/table_idx={ti}"
            if not os.path.lexists(dst):
                os.symlink(src, dst)
            store_bytes += du(src)
        os.makedirs(f"{sub}/conf", exist_ok=True)
        pq_.write_table(
            pa.table({
                "n_planes": pa.array([int(conf.n_planes)], pa.int32()),
                "n_tables": pa.array([t_count], pa.int32()),
                "dim": pa.array([int(conf.dim)], pa.int32()),
                "max_bucket": pa.array([int(conf.max_bucket)], pa.int32()),
                "bucket_dirs": pa.array([bool(conf.bucket_dirs)]),
            }),
            f"{sub}/conf/part-0.parquet",
        )
        for q_flip in multiprobe:
            t0 = time.time()
            rows = similarity.query_lsh_index(
                queries, sub, k=k, n_multiprobe=q_flip
            ).collect()
            el = round(time.time() - t0, 2)
            rec = recall_at_k(rows, exact_rows, k)
            spark.catalog.clearCache()
            emb.persist().count()
            queries.persist().count()
            print(json.dumps({
                "n_tables": t_count, "multiprobe": q_flip,
                "serve_sec": el, "recall": rec,
                "store_mb": round(store_bytes / 1e6, 1),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
