"""Dedup-family decade check — runs each dedup operator against a
tools/gen_docs.py corpus (~10× the sf1 fixture's 50k docs) and records
wall / candidate volume / pair volume / iteration rounds, the same
playbook that surfaced the ANN layout and n_probe defects (SURVEY §8).

Each op runs in its own invocation (clean JVM, comparable walls); wrap
with `timeout` from the shell and a killed run IS the measurement
(record DNF). Ground truth comes from the corpus's truth.json, so
recall of the planted structure is checked exactly where feasible.

Usage:
  python tools/dedup_decade.py CORPUS_DIR OP [--max-doc-freq=N]
        [--max-bucket=N] [--include-mega]
  OP ∈ {exact, minhash, minhash_cands, components, jaccard, prefix,
        simhash, simhash_cands, winnow, xgram, stream}

  stream: the STREAMING incremental corpus dedup decade check — the
  corpus drains through stream_incremental_corpus_dedup in ~10
  micro-batches (maxFilesPerTrigger=1 over 10 JSON shards) against a
  persistent on-disk fingerprint index; records the per-batch wall
  sequence from the streaming progress API. The scale claim under
  test: per-batch cost stays ~FLAT as the index grows (the novel
  filter is shuffle-free; the index scan is bloom+min/max-skipped).

  --max-bucket engages the r8 linked-edge candidate cap in
  minhash/simhash/components; --include-mega runs components over the
  FULL corpus (only sane with --max-bucket — the uncapped mega
  cluster owes 2·10⁸ all-pairs candidates, measured 1009 s for the
  candidate count alone).

  minhash_cands / simhash_cands: count the CANDIDATE stream only (the
  banded/bucketed join output after distinct) — separates candidate-
  volume blowup from verify cost.
  components: builds pairs over the corpus MINUS the mega cluster
  (so the chain/round measurement is not hidden behind the mega
  candidate bomb), then clusters them; records rounds + component
  sizes vs truth.

Prints ONE JSON line: {"op":..., "wall_s":..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    corpus = sys.argv[1]
    op = sys.argv[2]
    mdf = None
    max_bucket = None
    include_mega = "--include-mega" in sys.argv
    for a in sys.argv[3:]:
        if a.startswith("--max-doc-freq="):
            mdf = int(a.split("=", 1)[1])
        elif a.startswith("--max-bucket="):
            max_bucket = int(a.split("=", 1)[1])

    with open(os.path.join(corpus, "truth.json")) as f:
        truth = json.load(f)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(corpus, "documents.parquet"))
    n_docs = docs.count()  # warm the scan out of the measured wall

    from hadoop_2_10_0_src_mapreduce_spark.operators import dedup

    out: dict = {"op": op, "n_docs": n_docs, "corpus": corpus}
    t0 = time.time()

    if op == "exact":
        kept = dedup.exact_dedup(docs, "text", "doc_id")
        out["kept"] = kept.count()
        out["expected_kept_max"] = (
            n_docs
            - truth["exact"]["clusters"] * (truth["exact"]["size"] - 1)
            - (truth["mega"]["size"] - truth["mega"]["variants"])
        )

    elif op in ("minhash", "minhash_cands"):
        if op == "minhash_cands":
            # candidate stream only: banding + bucket join + distinct
            sh = dedup._shingled(docs, "text", "doc_id", truth["k"])
            inv = dedup._df_capped(dedup._hashed_index(sh), mdf).persist()
            sigs = dedup._minhash_from_index(inv, 128).persist()
            banded = dedup._banded(sigs, 32, 4)
            cands = (
                banded.alias("x")
                .join(banded.alias("y"), ["band_idx", "band_hash"])
                .where(F.col("x.id") < F.col("y.id"))
                .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
                .distinct()
            )
            out["candidates"] = cands.count()
        else:
            pairs = dedup.minhash_lsh_pairs(
                docs, "text", "doc_id", threshold=truth["threshold"],
                max_doc_freq=mdf, max_bucket=max_bucket,
            )
            out["pairs"] = pairs.count()
            out["max_bucket"] = max_bucket
            out["expected_small"] = truth["expected_pairs_small"]
            out["mega_all_pairs"] = truth["mega_all_pairs"]

    elif op == "components":
        mega = truth["mega"]
        sub = docs if include_mega else docs.where(
            ~F.col("doc_id").between(
                mega["start"], mega["start"] + mega["size"] - 1
            )
        )
        pairs = dedup.minhash_lsh_pairs(
            sub, "text", "doc_id", threshold=truth["threshold"],
            max_doc_freq=mdf, max_bucket=max_bucket,
        ).persist()
        out["pairs"] = pairs.count()
        out["max_bucket"] = max_bucket
        out["include_mega"] = include_mega
        t0 = time.time()  # cluster wall only
        stats: dict = {}
        try:
            comp = dedup.duplicate_components(pairs, stats=stats)
            sizes = (
                comp.groupBy("rep").count()
                .groupBy("count").agg(F.count("*").alias("n"))
                .orderBy("count")
                .collect()
            )
            out["component_size_hist"] = {int(r["count"]): int(r["n"]) for r in sizes}
            ch = truth["chain"]
            chain_rep = (
                comp.where(
                    F.col("id").between(ch["start"], ch["start"] + ch["len"] - 1)
                )
                .select("rep").distinct().count()
            )
            out["chain_components"] = chain_rep  # 1 == fully connected
            if include_mega:
                out["mega_components"] = (
                    comp.where(
                        F.col("id").between(
                            mega["start"], mega["start"] + mega["size"] - 1
                        )
                    )
                    .select("rep").distinct().count()
                )
        except (RuntimeError, TypeError) as e:
            out["error"] = str(e)[:200]
        out["rounds"] = stats.get("rounds")

    elif op in ("jaccard", "prefix"):
        fn = (
            dedup.ngram_jaccard_pairs if op == "jaccard"
            else dedup.ngram_jaccard_pairs_prefix
        )
        pairs = fn(
            docs, "text", "doc_id", threshold=truth["threshold"],
            max_doc_freq=mdf,
        )
        out["pairs"] = pairs.count()
        out["max_doc_freq"] = mdf

    elif op == "winnow":
        pairs = dedup.winnow_jaccard_pairs(
            docs, "text", "doc_id", threshold=truth["threshold"],
            max_doc_freq=mdf,
        )
        out["pairs"] = pairs.count()
        out["max_doc_freq"] = mdf

    elif op == "xgram":
        # cross-doc repeated n-grams: stats + maximal spans (the two
        # whole-corpus passes; the applied cut is stats-shaped again)
        stats_df = dedup.repeated_ngram_doc_stats(
            docs, "text", "doc_id", k=5
        )
        out["docs_flagged"] = stats_df.count()
        spans = dedup.repeated_ngram_spans(docs, "text", "doc_id", k=5)
        out["spans"] = spans.count()

    elif op in ("simhash", "simhash_cands"):
        if op == "simhash_cands":
            sigs = dedup.simhash_signatures(docs, "text", "doc_id").persist()
            chunks = [
                F.shiftrightunsigned(F.col("sim"), i * 8).bitwiseAND(F.lit(255))
                for i in range(8)
            ]
            keys = F.array(*[
                F.shiftleft(chunks[i], 8).bitwiseOR(chunks[j])
                for i in range(8) for j in range(i + 1, 8)
            ])
            bucketed = sigs.select(
                "id", F.posexplode(keys).alias("table_idx", "bucket")
            )
            cands = (
                bucketed.alias("x")
                .join(bucketed.alias("y"), ["table_idx", "bucket"])
                .where(F.col("x.id") < F.col("y.id"))
                .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
                .distinct()
            )
            out["candidates"] = cands.count()
        else:
            out["pairs"] = dedup.simhash_pairs(
                docs, "text", "doc_id", max_bucket=max_bucket
            ).count()
            out["max_bucket"] = max_bucket

    elif op == "stream":
        import shutil
        import tempfile

        from hadoop_2_10_0_src_mapreduce_spark.streaming.windows import (
            stream_incremental_corpus_dedup,
        )

        work = tempfile.mkdtemp(prefix="dedup_stream_")
        src_dir = os.path.join(work, "src")
        n_batches = 10
        # one JSON file per batch → maxFilesPerTrigger=1 gives exactly
        # one micro-batch per shard, so recentProgress durations map
        # 1:1 to index-growth steps
        (
            docs.select("doc_id", "text")
            .withColumn(
                "_b", F.floor(F.col("doc_id") % n_batches)
            )
            .repartitionByRange(n_batches, "_b")
            .sortWithinPartitions("_b")
            .drop("_b")
            .write.mode("overwrite")
            .json(src_dir)
        )
        # keep exactly one data file per batch slice: Spark wrote one
        # file per partition above; count them
        shards = [
            f for f in os.listdir(src_dir)
            if f.startswith("part-") and not f.endswith(".crc")
        ]
        t0 = time.time()
        q = stream_incremental_corpus_dedup(
            spark,
            src_dir,
            "doc_id long, text string",
            os.path.join(work, "index"),
            os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=1,
        )
        q.awaitTermination()
        out["batches"] = len(q.recentProgress)
        out["n_shards"] = len(shards)
        out["batch_walls_s"] = [
            round(p["durationMs"]["triggerExecution"] / 1000, 2)
            for p in q.recentProgress
        ]
        out["kept"] = spark.read.parquet(os.path.join(work, "out")).count()
        out["expected_kept_max"] = (
            n_docs
            - truth["exact"]["clusters"] * (truth["exact"]["size"] - 1)
            - (truth["mega"]["size"] - truth["mega"]["variants"])
        )
        shutil.rmtree(work, ignore_errors=True)

    else:
        raise SystemExit(f"unknown op {op!r}")

    out["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
