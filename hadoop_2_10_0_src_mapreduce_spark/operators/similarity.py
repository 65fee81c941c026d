"""Similarity search over embedding columns (array<float>).

Extension beyond the reference (no vector ops existed in Hadoop MR);
the LLM-pipeline ANN pattern:

- brute-force cosine top-k — the correctness anchor. Cross join is
  O(n·q) but embarrassingly parallel; broadcast the (small) query set
  so only the corpus scans.
- LSH-bucketed ANN — random-hyperplane signs → bucket; only same-
  bucket candidates are scored. Sub-linear probes at the cost of
  recall; fixed-seed hyperplanes keep it reproducible. (cf. PAPERS.md
  top-k similarity literature.)

Dot products run JVM-side via zip_with/aggregate in DOUBLE with
left-to-right accumulation — bit-identical to the DuckDB oracle's
list_inner_product over DOUBLE[] (both sequential), so similarity
values hash-match exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential double-precision dot product (JVM, codegen)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, rnk, neighbor_id, sim). Ranking key is
    (rounded sim desc, neighbor_id asc) so ties are deterministic.
    The query side is broadcast — corpus never shuffles.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("_qv", "_cv"), round_digits).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "sim")
    )


def _corpus_matrix(emb: DataFrame, id_col: str, vec_col: str):
    """(ids int64 array, matrix float64 [n, d], norms float64 [n]).
    Collects ONE side of the all-pairs comparison for broadcast — the
    same replicate-the-small-side contract as a broadcast hash join.
    At 2k×64 this is 1 MB; beyond broadcast size, bucket with
    lsh_signatures first instead of brute-forcing."""
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
    return ids, mat, np.sqrt((mat * mat).sum(axis=1))


def near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ τ).

    Brute force as blocked matrix multiply: the corpus matrix is
    broadcast once, each Arrow batch computes ``block @ corpus.T`` via
    BLAS and emits only pairs above threshold — the O(n²) similarity
    matrix is never materialized in the plan, and nothing but the
    surviving pairs shuffles. For corpora past broadcast size, bucket
    with lsh_signatures first."""
    ids, mat, norms = _corpus_matrix(emb, id_col, vec_col)
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def batches(it):
        c_ids, c_mat, c_norms = bc.value
        for pdf in it:
            b_ids = pdf[id_col].to_numpy(dtype=np.int64)
            b_mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
            sims = np.round(
                (b_mat @ c_mat.T) / (b_norms[:, None] * c_norms[None, :]),
                round_digits,
            )
            keep = (b_ids[:, None] < c_ids[None, :]) & (sims >= threshold)
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": b_ids[r], "id_b": c_ids[c], "sim": sims[r, c]}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        batches, "id_a long, id_b long, sim double"
    )


def lsh_signatures(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: ``n_tables`` independent
    sign-bit buckets of ``n_planes`` bits each. One output row per
    (vector, table): (…, table_idx, bucket). A single table's recall
    on weakly-correlated vectors is a few percent (p_agree^bits); L
    independent tables lift it to 1-(1-p)^L — the standard
    speed/recall dial. Vectorized numpy inside Arrow batches."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    shifts = np.arange(n_planes, dtype=np.uint64)

    def batches(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].map(np.asarray))
            signs = (mat @ planes.T) > 0  # (rows, tables*planes)
            signs = signs.reshape(len(mat), n_tables, n_planes)
            buckets = (signs.astype(np.uint64) << shifts).sum(axis=2).astype(np.int64)
            base = pdf.drop(columns=[vec_col])
            for t in range(n_tables):
                out = base.copy()
                out["table_idx"] = t
                out["bucket"] = buckets[:, t]
                yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields
        if f.name != vec_col
    )
    return emb.mapInPandas(batches, f"{out_schema}, table_idx int, bucket long")


def ann_lsh_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 16,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: score only pairs colliding in ≥1 LSH table.
    With 16 tables × 6 bits each vector probes ~L/2^b ≈ 1/4 of the
    corpus here (recall ≈ 0.5 on these weakly-correlated fixtures —
    measured in tests); on real embedding corpora with tight clusters
    the same config probes far less. Candidates shuffle as (table,
    bucket, id) — vectors never fan out."""
    buckets = lsh_signatures(
        emb.select(id_col, vec_col),
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
    )
    a = buckets.select(F.col(id_col).alias("query_id"), "table_idx", "bucket")
    b = buckets.select(F.col(id_col).alias("neighbor_id"), "table_idx", "bucket")
    # candidate pairs are ids only — vectors never enter the bucket join
    # or the dedup shuffle; scoring happens after, against a broadcast
    # corpus matrix (BLAS per Arrow batch).
    cands = (
        a.join(b, ["table_idx", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _topk_from_candidates(emb, cands, id_col, vec_col, k, round_digits)


def _topk_from_candidates(
    emb: DataFrame,
    cands: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_digits: int,
    corpus: tuple | None = None,
) -> DataFrame:
    """Score (query_id, neighbor_id) candidate pairs against a broadcast
    corpus matrix (BLAS per Arrow batch), then window top-k per query.
    ``corpus`` lets the caller pass an already-collected
    ``_corpus_matrix`` result instead of collecting a second time."""
    ids, mat, norms = corpus or _corpus_matrix(emb, id_col, vec_col)
    row_of = {int(i): r for r, i in enumerate(ids)}
    bc = emb.sparkSession.sparkContext.broadcast((row_of, mat, norms))

    def score(it):
        row_map, c_mat, c_norms = bc.value
        for pdf in it:
            qi = pdf["query_id"].map(row_map).to_numpy(dtype=np.int64)
            ni = pdf["neighbor_id"].map(row_map).to_numpy(dtype=np.int64)
            sims = np.round(
                np.einsum("ij,ij->i", c_mat[qi], c_mat[ni])
                / (c_norms[qi] * c_norms[ni]),
                round_digits,
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "sim": sims,
                }
            )

    scored = cands.mapInPandas(score, "query_id long, neighbor_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "sim")
    )


def train_ivf_centroids(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means centroids, trained driver-side on a sample.
    At scale, the training sample stays small (centroids converge from
    a few hundred vectors per list); only the [n_centroids, dim]
    matrix — kilobytes — is broadcast for assignment. Fixed-seed init
    keeps lists reproducible run-to-run."""
    pdf = emb.select(vec_col).toPandas()
    mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
    return _kmeans_spherical(mat, n_centroids, n_iters, seed)


def _kmeans_spherical(
    mat: np.ndarray, n_centroids: int, n_iters: int, seed: int
) -> np.ndarray:
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), n_centroids, replace=False)]
    for _ in range(n_iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroid lists
    (cosine). n_probe=1 partitions the corpus into inverted lists;
    n_probe>1 is the query-side probe fan-out. One row per (vector,
    probed list); vectors themselves are dropped — only ids shuffle.
    ``probe_rank`` orders the probed lists by centroid proximity, so
    rank 0 is the vector's home list — one pass serves both the
    corpus-side filing (probe_rank = 0) and the query-side fan-out."""
    bc = emb.sparkSession.sparkContext.broadcast(centroids)

    def batches(it):
        cents = bc.value
        for pdf in it:
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            order = np.argsort(-(mat @ cents.T), axis=1)[:, :n_probe]
            base = pdf.drop(columns=[vec_col])
            for p in range(n_probe):
                out = base.copy()
                out["list_id"] = order[:, p].astype(np.int32)
                out["probe_rank"] = np.int32(p)
                yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields
        if f.name != vec_col
    )
    return emb.mapInPandas(batches, f"{out_schema}, list_id int, probe_rank int")


def ann_ivf_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning: spherical
    k-means lists, queries probe their ``n_probe`` nearest lists and
    score only the vectors filed there — the complement of the LSH
    variant (data-learned partitions vs oblivious hashes). Probing
    4/16 lists scans ~1/4 of the corpus; recall is pinned against
    brute force in tests. Candidates shuffle as (list_id, id) pairs —
    vectors never fan out."""
    vecs = emb.select(id_col, vec_col)
    corpus = _corpus_matrix(vecs, id_col, vec_col)  # one collect: train + score
    cents = _kmeans_spherical(corpus[1], n_centroids, n_iters=5, seed=42)
    # One assignment pass serves both sides: probe_rank 0 is the home
    # list (corpus filing); all ranks are the query-side probes.
    assigned = ivf_assign(vecs, cents, vec_col=vec_col, n_probe=n_probe).persist()
    corpus_lists = assigned.where(F.col("probe_rank") == 0).select(
        F.col(id_col).alias("neighbor_id"), "list_id"
    )
    query_probes = assigned.select(F.col(id_col).alias("query_id"), "list_id")
    cands = (
        query_probes.join(corpus_lists, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    return _topk_from_candidates(
        emb, cands, id_col, vec_col, k, round_digits, corpus=corpus
    )
