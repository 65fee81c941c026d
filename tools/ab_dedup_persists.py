"""Same-session alternating A/Bs for r13 dedup micro-optimizations.

Each experiment rebuilds the SAME pipeline two ways inside one session
(weather cancels pairwise), fresh caches per leg (clearCache between
legs — each leg pays its own materializations):

  sets    — _exact_jaccard_on_candidates computes the per-doc set table
            once per join side (a 320k-row groupBy x2 at sf0.1); B
            persists it so the agg runs once.
  ranked  — prefix_pairs_from_index self-joins the 3-window `ranked`
            frame unpersisted (whole ranking subtree x2); B persists it.

Usage: python tools/ab_dedup_persists.py [sets|ranked] [reps=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "sets"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_2_10_0_src_mapreduce_spark.operators import dedup
    from hadoop_2_10_0_src_mapreduce_spark.plans.catalog.dedupops import (
        _DF_CAP,
        corpus_with_dups,
    )
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("ab-dedup-persists")
    spark.sparkContext.setLogLevel("ERROR")

    def build_inv():
        corpus = corpus_with_dups(spark, sf_dir)
        return dedup._df_capped(
            dedup._hashed_index(dedup._shingled(corpus, "text", "doc_id", 3)),
            _DF_CAP,
        ).persist()

    def verify_pipeline(persist_sets: bool):
        """minhash-shaped candidates -> exact-Jaccard verify."""
        inv = build_inv()
        sigs = dedup._minhash_from_index(inv, 128).persist()
        banded = dedup._banded(sigs, 32, 4)
        cands = dedup._capped_bucket_pairs(
            banded, ["band_idx", "band_hash"], max_bucket=None
        ).distinct()
        sets = inv.groupBy("id").agg(F.collect_list("h").alias("_sh"))
        if persist_sets:
            sets = sets.persist()
        a = sets.select(F.col("id").alias("id_a"), F.col("_sh").alias("_sha"))
        b = sets.select(F.col("id").alias("id_b"), F.col("_sh").alias("_shb"))
        per_pair = cands.join(a, "id_a").join(b, "id_b").select(
            "id_a", "id_b",
            F.size(F.array_intersect("_sha", "_shb")).alias("c"),
            F.size("_sha").alias("n_a"),
            F.size("_shb").alias("n_b"),
        )
        return (
            per_pair.withColumn(
                "jaccard",
                F.round(F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 6),
            )
            .where(F.col("jaccard") >= 0.8)
            .select("id_a", "id_b", "jaccard")
        )

    def prefix_pipeline(persist_ranked: bool):
        inv = build_inv()
        threshold = 0.8
        wdf = Window.partitionBy("h")
        wid = Window.partitionBy("id")
        word = Window.partitionBy("id").orderBy("_df", "h")
        ranked = (
            inv.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .withColumn("_n", F.count(F.lit(1)).over(wid))
            .withColumn("_pos", F.row_number().over(word))
            .where(
                F.col("_pos")
                <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
            )
            .select("id", "h")
        )
        if persist_ranked:
            ranked = ranked.persist()
        cands = (
            ranked.alias("x")
            .join(ranked.alias("y"), "h")
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        return dedup._exact_jaccard_on_candidates(cands, inv, threshold)

    build = verify_pipeline if which == "sets" else prefix_pipeline

    def run(flag: bool) -> float:
        spark.catalog.clearCache()  # fresh caches per leg
        t0 = time.time()
        build(flag).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run(False)  # warmup
    a, b = [], []
    for r in range(reps):
        a.append(run(False))
        b.append(run(True))
        print(f"rep {r}: plain={a[-1]}  persisted={b[-1]}", flush=True)
    print(f"A(plain)     min={min(a)} all={a}")
    print(f"B(persisted) min={min(b)} all={b}")
    # result equality spot check (same session, fresh caches)
    spark.catalog.clearCache()
    ra = sorted(map(tuple, build(False).collect()))
    spark.catalog.clearCache()
    rb = sorted(map(tuple, build(True).collect()))
    print("results equal:", ra == rb, f"({len(ra)} rows)")


if __name__ == "__main__":
    main()
