"""Streaming-ANN decade check — the continuous-ingestion twin of
dedup_decade's 'stream' op: seed an IVF index from the first SEED
vectors of a tools/gen_vectors.py corpus, drain the REST through
stream_index_vectors in one-shard micro-batches, and record the
per-batch wall sequence from the streaming progress API.

The scale claim under test: per-batch ingestion cost stays ~FLAT as
the index grows (the novel-id filter is shuffle-free and column-
pruned; filing under FIXED centroids is a broadcast assign of the
batch only) — the same claim the corpus-dedup stream check measures,
on the ANN family. A compaction cadence (--compact-every) can be
folded in to show maintenance cost on the same axis.

Usage: python tools/ann_stream_decade.py [corpus_dir] [--seed=20000]
           [--batches=9] [--compact-every=N]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    corpus = args[0] if args else "/tmp/vec200k"
    seed, n_batches, compact_every = 20_000, 9, None
    for a in sys.argv[1:]:
        if a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
        elif a.startswith("--batches="):
            n_batches = int(a.split("=", 1)[1])
        elif a.startswith("--compact-every="):
            compact_every = int(a.split("=", 1)[1])

    from pyspark.sql import functions as F

    from hadoop_2_10_0_src_mapreduce_spark.operators import similarity
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark
    from hadoop_2_10_0_src_mapreduce_spark.streaming.windows import (
        stream_index_vectors,
    )

    spark = get_spark(
        "ann_stream_decade",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{corpus}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()

    work = tempfile.mkdtemp(prefix="ann_stream_decade_")
    index = os.path.join(work, "ivf")
    # offline seed build: the centroids define the filing function
    similarity.save_ivf_index(emb.where(F.col("vec_id") < seed), index)

    # the REST as one JSON shard per batch (vec_id-range sharded so
    # maxFilesPerTrigger=1 maps recentProgress 1:1 to growth steps)
    src_dir = os.path.join(work, "src")
    rest = emb.where(F.col("vec_id") >= seed)
    per = (n - seed + n_batches - 1) // n_batches
    (
        rest.withColumn(
            "_b", F.floor((F.col("vec_id") - seed) / per)
        )
        .repartitionByRange(n_batches, "_b")
        .sortWithinPartitions("_b")
        .drop("_b")
        .write.mode("overwrite")
        .json(src_dir)
    )

    t0 = time.time()
    q = stream_index_vectors(
        spark,
        src_dir,
        "vec_id long, embedding array<double>",
        index,
        checkpoint_dir=os.path.join(work, "ckpt"),
        compact_every=compact_every,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    walls = [
        round(p["durationMs"]["triggerExecution"] / 1000, 2)
        for p in q.recentProgress
    ]
    indexed = spark.read.parquet(f"{index}/lists").count()
    out = {
        "corpus": corpus,
        "n_vectors": n,
        "seed": seed,
        "batches": len(walls),
        "compact_every": compact_every,
        "batch_walls_s": walls,
        "indexed": indexed,
        "wall_s": round(time.time() - t0, 2),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
