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
        simhash, simhash_cands, winnow, xgram, stream, recipe}

  recipe: the END-TO-END prepare_training_corpus decade check — every
  stage above has an individual 500k row, but the composed chain
  (boilerplate→exact→minhash+components→cut→decontam→gates→redact→
  split) is where cache-reuse, join-order, and repeated-tokenization
  regressions hide. Measures the REAL pipeline.prepare_training_corpus
  call end-to-end (total wall), then per-stage attribution: each
  dedup stage runs against its PERSISTED input, timed through
  construction + materialization (duplicate_components iterates
  eagerly at construction, so a cumulative-delta ladder misbooks its
  cost); verifies the keeper set against the
  planted truth (≤1 survivor per exact/near/mega/chain cluster — the
  gates can only shrink, never split, a cluster). Stage knobs chosen
  to EXERCISE every stage without perturbing the dedup truth:
  boilerplate min_docs=1000 (above the mega replication factor, so
  the scan runs but removes nothing), cut_spans_min_tokens=30
  (above any background repeat), eval_df = the first 200 background
  docs (decontam drops exactly the survivors among them).

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
    checkpoint_dir = None
    include_mega = "--include-mega" in sys.argv
    for a in sys.argv[3:]:
        if a.startswith("--max-doc-freq="):
            mdf = int(a.split("=", 1)[1])
        elif a.startswith("--max-bucket="):
            max_bucket = int(a.split("=", 1)[1])
        elif a.startswith("--checkpoint-dir="):
            # components only: run label propagation through the r10
            # RELIABLE parquet checkpointer instead of localCheckpoint
            # (the decade-scale identity check for the cluster-
            # resilience dial — labels must match the local mode)
            checkpoint_dir = a.split("=", 1)[1]

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
        out["checkpoint_dir"] = checkpoint_dir
        try:
            comp = dedup.duplicate_components(
                pairs, stats=stats, checkpoint_dir=checkpoint_dir
            )
            sizes = (
                comp.groupBy("rep").count()
                .groupBy("count").agg(F.count("*").alias("n"))
                .orderBy("count")
                .collect()
            )
            out["component_size_hist"] = {int(r["count"]): int(r["n"]) for r in sizes}
            # order-independent label fingerprint: equal across runs
            # IFF the (id, rep) sets are identical — the local-vs-
            # reliable checkpoint identity check compares this
            # (bit_xor: one row per id, so a set fingerprint; immune
            # to ANSI sum-overflow)
            out["labels_xor_hash"] = int(
                comp.select(
                    F.bit_xor(F.xxhash64(F.col("id"), F.col("rep"))).alias("h")
                ).collect()[0].h
            )
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

    elif op == "recipe":
        from hadoop_2_10_0_src_mapreduce_spark.pipeline import (
            prepare_training_corpus,
        )

        n_eval = 200
        eval_df = docs.where(F.col("doc_id") < n_eval).persist()
        eval_df.count()
        kw = dict(
            text_col="text",
            id_col="doc_id",
            near_dup_threshold=truth["threshold"],
            max_doc_freq=mdf,
            max_bucket=max_bucket,
            drop_boilerplate_min_docs=1000,
            cut_spans_min_tokens=30,
            eval_df=eval_df,
            split_weights={"train": 0.98, "val": 0.01, "test": 0.01},
        )
        # 1) the REAL end-to-end call, measured as one program (what a
        # user pays): count() materializes every stage
        t0 = time.time()
        corpus = prepare_training_corpus(docs, **kw)
        out["n_out"] = corpus.count()
        out["wall_total_s"] = round(time.time() - t0, 2)

        # 2) keeper-set verification against the planted truth — the
        # gates can only SHRINK a cluster's survivors, never split it,
        # so every planted cluster must have ≤ 1 surviving member
        kept = corpus.select("id").persist()
        def survivors(start: int, size: int) -> int:
            return kept.where(
                F.col("id").between(start, start + size - 1)
            ).count()
        nr, ex, mg, ch = truth["near"], truth["exact"], truth["mega"], truth["chain"]
        near_surv = (
            kept.where(
                F.col("id").between(
                    nr["start"], nr["start"] + nr["clusters"] * nr["size"] - 1
                )
            )
            .groupBy(F.floor((F.col("id") - nr["start"]) / nr["size"]))
            .count().where(F.col("count") > 1).count()
        )
        exact_surv = (
            kept.where(
                F.col("id").between(
                    ex["start"], ex["start"] + ex["clusters"] * ex["size"] - 1
                )
            )
            .groupBy(F.floor((F.col("id") - ex["start"]) / ex["size"]))
            .count().where(F.col("count") > 1).count()
        )
        out["near_clusters_multi_survivor"] = near_surv
        out["exact_clusters_multi_survivor"] = exact_surv
        out["mega_survivors"] = survivors(mg["start"], mg["size"])
        out["chain_survivors"] = survivors(ch["start"], ch["len"])
        out["eval_leaked"] = kept.where(F.col("id") < n_eval).count()
        out["truth_ok"] = bool(
            near_surv == 0 and exact_surv == 0
            and out["mega_survivors"] <= 1 and out["chain_survivors"] <= 1
            and out["eval_leaked"] == 0
        )
        kept.unpersist()

        # 3) per-stage attribution: each stage runs against its
        # PERSISTED input (materialized, untimed) and the timed span
        # covers construction + materialization-into-cache of its own
        # output — the only shape that attributes honestly here,
        # because duplicate_components runs its label-propagation jobs
        # EAGERLY at construction (a cumulative-prefix delta ladder
        # booked that cost in the wrong stage) and minhash's internal
        # persists otherwise leak across stages. The engine's fused
        # end-to-end plan is wall_total_s above; the per-stage sum is
        # higher by the persist/rescan overhead stage isolation pays.
        spark.catalog.clearCache()
        stage_walls: dict[str, float] = {}
        base = docs.select(F.col("doc_id").alias("id"), F.col("text"))
        cur = base.persist()
        cur.count()
        eval_base = eval_df.select(F.col("doc_id").alias("id"), "text")
        stages = [
            ("boilerplate", lambda d: dedup.drop_boilerplate_lines(
                d, "text", "id", min_docs=1000)),
            ("exact", lambda d: d.join(
                dedup.exact_dedup(d, "text", "id").select(
                    F.col("keeper").alias("id")), "id", "left_semi")),
            ("neardup", lambda d: d.join(
                dedup.duplicate_components(dedup.minhash_lsh_pairs(
                    d, "text", "id", threshold=truth["threshold"],
                    max_doc_freq=mdf, max_bucket=max_bucket,
                )).where(F.col("id") != F.col("rep")).select("id"),
                "id", "left_anti")),
            ("cut_spans", lambda d: dedup.cut_repeated_spans(
                d, "text", "id", min_span_tokens=30)),
            ("decontam", lambda d: dedup.decontaminate(
                d, eval_base, "text", "id", n=13)),
        ]
        for name, fn in stages:
            t = time.time()
            nxt = fn(cur).persist()
            out.setdefault("prefix_rows", {})[name] = nxt.count()
            stage_walls[name] = round(time.time() - t, 2)
            cur.unpersist()
            cur = nxt
        out["stage_walls_s"] = stage_walls
        out["stage_sum_s"] = round(sum(stage_walls.values()), 2)
        out["max_bucket"] = max_bucket

    else:
        raise SystemExit(f"unknown op {op!r}")

    out["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
