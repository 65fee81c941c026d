"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Extension beyond the reference (whose only dedup was the
identity-map/identity-reduce DISTINCT idiom, SURVEY.md §2.7), designed
scale-first:

- exact        : hash-groupBy on a normalized fingerprint — one shuffle
                 of (16-byte digest, id), never the text.
- n-gram       : INVERTED-INDEX candidate generation (explode shingles,
  Jaccard       self-join on shingle, distinct pairs) + exact Jaccard
                 verify on candidates — O(pairs that share a shingle),
                 not O(n²). The DuckDB oracle does the O(n²) version;
                 results are identical because Jaccard > 0 ⇒ the pair
                 shares a shingle.
- MinHash+LSH  : vectorized numpy signatures via mapInPandas (Arrow
                 batches), banding, bucket self-join, exact-Jaccard
                 verify of candidates. Sub-quadratic: only bucket
                 collisions are compared.
- SimHash      : 64-bit weighted-token signature; pairs within hamming
                 distance via 8×8-bit chunk pigeonhole buckets.

Determinism: token hashing uses pandas' SipHash (fixed key) — stable
across processes, machines, and runs; permutation constants come from
a fixed-seed numpy Generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions.text import fingerprint, shingles

MERSENNE_61 = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per normalized-text
    fingerprint. Returns (fingerprint, keeper, n_copies)."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingled(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(text_col, k)).alias("sh"),
    ).where(F.size("sh") > 0)


def _exact_jaccard_on_candidates(cands: DataFrame, shingled: DataFrame,
                                 threshold: float) -> DataFrame:
    a = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact Jaccard ≥ threshold)
    over k-token shingles, via inverted-index candidate generation."""
    sh = _shingled(df, text_col, id_col, k)
    inv = sh.select("id", F.explode("sh").alias("shingle"))
    cands = (
        inv.alias("x")
        .join(inv.alias("y"), "shingle")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    return _exact_jaccard_on_candidates(cands, sh, threshold)


def _minhash_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(42)  # fixed seed → reproducible LSH
    a = rng.integers(1, MERSENNE_61, size=num_hashes, dtype=np.int64).astype(object)
    b = rng.integers(0, MERSENNE_61, size=num_hashes, dtype=np.int64).astype(object)
    return a, b


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """(id, signature array<long>) — numpy-vectorized inside Arrow
    batches; one scan, no shuffle."""
    a, b = _minhash_params(num_hashes)
    sh = _shingled(df, text_col, id_col, k)

    def batches(it):
        for pdf in it:
            out_ids, out_sigs = [], []
            for id_, shl in zip(pdf["id"], pdf["sh"]):
                h = pd.util.hash_array(np.asarray(shl, dtype=object)).astype(object)
                # (a*h + b) mod p, object dtype = exact bigint math
                sig = [int(min((ai * hv + bi) % MERSENNE_61 for hv in h))
                       for ai, bi in zip(a, b)]
                out_ids.append(id_)
                out_sigs.append(sig)
            yield pd.DataFrame({"id": out_ids, "sig": out_sigs})

    return sh.mapInPandas(batches, "id long, sig array<long>")


def minhash_lsh_pairs(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 3,
    num_hashes: int = 128, bands: int = 32, threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band the signature, bucket-join,
    then verify candidates with EXACT Jaccard ≥ threshold (so false
    positives cost a check, false negatives are the only error — with
    32×4 banding, P(miss) < 1e-14 at J=0.9).

    At 100 TB the bucket join shuffles (band_idx, band_hash, id) only;
    signatures are 128×8 bytes/doc regardless of doc size.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, k=k, num_hashes=num_hashes)
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice("sig", i * rows_per_band + 1, rows_per_band).cast("string")
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_idx", "band_hash"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sh = _shingled(df, text_col, id_col, k)
    return _exact_jaccard_on_candidates(cands, sh, threshold)


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """64-bit SimHash over tokens weighted by frequency → (id, sim long)."""
    from hadoop_2_10_0_src_mapreduce_spark.functions.text import tokens as tok_expr

    toks = df.select(F.col(id_col).alias("id"), tok_expr(text_col).alias("toks")).where(
        F.size("toks") > 0
    )

    def batches(it):
        for pdf in it:
            ids, sims = [], []
            for id_, tl in zip(pdf["id"], pdf["toks"]):
                vals, counts = np.unique(np.asarray(tl, dtype=object), return_counts=True)
                h = pd.util.hash_array(vals)  # uint64, deterministic
                shift = np.arange(64, dtype=np.uint64)  # uint64 >> int64 is a numpy TypeError
                bits = ((h[:, None] >> shift[None, :]) & np.uint64(1)).astype(np.int64)
                acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                sim = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
                ids.append(id_)
                sims.append(sim - (1 << 64) if sim >= (1 << 63) else sim)  # to signed
            yield pd.DataFrame({"id": ids, "sim": sims})

    return toks.mapInPandas(batches, "id long, sim long")


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, *, max_hamming: int = 6
) -> DataFrame:
    """Pairs within hamming distance via chunk pigeonhole: split the 64
    bits into 8 chunks; distance ≤ 6 ⇒ at least 2 chunks equal ⇒ the
    pair collides in some chunk bucket. Bucket-join then verify."""
    sigs = simhash_signatures(df, text_col, id_col)
    # shiftrightunsigned needs a literal shift amount — enumerate the 8
    # chunk expressions instead of a transform() lambda
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("sim"), i * 8).bitwiseAND(F.lit(255))
            for i in range(8)
        ]
    )
    chunked = sigs.select(
        "id", "sim", F.posexplode(chunks).alias("chunk_idx", "chunk_val")
    )
    cands = (
        chunked.alias("x")
        .join(chunked.alias("y"), ["chunk_idx", "chunk_val"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sim").alias("sim_a"),
            F.col("y.sim").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
