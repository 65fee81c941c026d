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

Nothing on any query path collects the corpus to the driver: IVF
k-means trains on a bounded deterministic sample, and scoring happens
where the candidates live. Two scoring paths, chosen by what the
caller needs:

- exact-sequential (``_score_pairs``): JVM zip_with/aggregate dot in
  DOUBLE with left-to-right accumulation — bit-identical to the DuckDB
  oracle's list_inner_product over DOUBLE[] (both sequential), so
  near-dup/brute-force values hash-match exactly. Casts and norms are
  computed ONCE per vector in the pre-join projections (identical
  values to per-pair evaluation, a fraction of the work — interpreted
  higher-order functions are the cost center, measured ~25 µs per
  extra array pass per pair).
- grouped-BLAS (``_pairs_topk`` under applyInPandas): for the ANN
  top-k paths the LSH bucket / IVF list IS a co-partition, so each
  group's similarity block is one numpy matmul over Arrow batches —
  no per-pair expression evaluation at all, and each group emits only
  its per-query top-k, so the global re-rank sees ≤ groups·k rows per
  query instead of every candidate pair. This is also the 100 TB
  shape: vectors shuffle once, partitioned by list/bucket (exactly how
  a distributed IVF/LSH index is laid out), and per-group blocks are
  bounded by the list size, not the corpus.
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


def _dot_pre(a: Column | str, b: Column | str) -> Column:
    """Sequential dot over arrays ALREADY cast to double — the caller
    pays the cast once per vector, not once per pair."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential double-precision dot product (JVM, codegen)."""
    return _dot_pre(_as_double(a), _as_double(b))


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
    The query side is broadcast — corpus never shuffles. Casts and
    norms are projected below the cross join (once per vector, values
    identical to per-pair evaluation), so each of the O(n·q) pairs
    pays only the single sequential dot.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv")
    ).withColumn("_qn", F.sqrt(_dot_pre("_qv", "_qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_cv")
    ).withColumn("_cn", F.sqrt(_dot_pre("_cv", "_cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_pre("_qv", "_cv") / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "sim")
    )


def _score_pairs(
    emb: DataFrame,
    cands: DataFrame,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """Score (query_id, neighbor_id) candidate pairs by joining them
    back to the DISTRIBUTED vector table — two hash joins on id, then
    the JVM zip_with/aggregate cosine (sequential double accumulation,
    bit-identical to the DuckDB oracle). Nothing is collected to the
    driver: the corpus stays partitioned, candidate ids shuffle, and a
    vector copy rides along only for the surviving candidate rows.
    Locally Spark broadcast-joins the (small) vector side; at cluster
    scale both joins degrade gracefully to shuffle hash joins.

    The double cast and the norm are projected BELOW the join — once
    per vector instead of once per pair. The values are identical to
    per-pair evaluation (same sequential ops on the same inputs), but
    the per-pair work drops from six interpreted array passes to one
    zip_with/aggregate — the difference between seconds and minutes at
    ~10⁶ candidate pairs."""
    qv = emb.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv")
    ).withColumn("_qn", F.sqrt(_dot_pre("_qv", "_qv")))
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_nv")
    ).withColumn("_nn", F.sqrt(_dot_pre("_nv", "_nv")))
    return (
        cands.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_pre("_qv", "_nv") / (F.col("_qn") * F.col("_nn")),
                round_digits,
            ).alias("sim"),
        )
    )


def _bucket_candidates(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """Distinct candidate id pairs (query_id < neighbor_id) colliding
    in ≥1 LSH table — the near-dup candidate generator. Only (table,
    bucket, id) triples shuffle; vectors never enter the self-join, so
    the exact sequential rescore downstream stays oracle-identical."""
    buckets = lsh_signatures(
        emb.select(id_col, vec_col),
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
    )
    a = buckets.select(F.col(id_col).alias("query_id"), "table_idx", "bucket")
    b = buckets.select(F.col(id_col).alias("neighbor_id"), "table_idx", "bucket")
    return (
        a.join(b, ["table_idx", "bucket"])
        .where(F.col("query_id") < F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    round_digits: int = 6,
    n_planes: int = 12,
    n_tables: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ τ).

    LSH-bucketed, fully distributed: random-hyperplane buckets generate
    candidate pairs (ids only), which are exactly rescored JVM-side via
    the join-back in _score_pairs — no driver-side corpus collect
    anywhere on the path. Identical vectors share every sign bit, so
    true duplicates collide in ALL tables (recall exactly 1 for them);
    for near-dups at τ=0.99 a pair agrees per bit w.p.
    1-arccos(0.99)/π ≈ 0.955, so missing all 16 12-bit tables has
    probability (1-0.955¹²)¹⁶ ≈ 1.1e-6 — negligible, and the exact
    rescore means any surviving pair's sim is exact. 12 bits (not the
    ANN paths' 6) because a 0.99 threshold tolerates the narrower
    per-table recall in exchange for 2⁶× smaller buckets — on
    uncorrelated vectors expected candidates drop from n²·L/2⁷ to
    n²·L/2¹³, which is what keeps the bucket self-join sub-quadratic
    as the corpus grows. For lower thresholds drop n_planes / raise
    n_tables (recall = 1-(1-p^b)^L)."""
    cands = _bucket_candidates(emb, id_col, vec_col, n_planes, n_tables)
    scored = _score_pairs(emb, cands, id_col, vec_col, round_digits)
    return scored.where(F.col("sim") >= threshold).select(
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
        "sim",
    )


def lsh_signatures(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 16,
    seed: int = 42,
    keep_vec: bool = False,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: ``n_tables`` independent
    sign-bit buckets of ``n_planes`` bits each. One output row per
    (vector, table): (…, table_idx, bucket). A single table's recall
    on weakly-correlated vectors is a few percent (p_agree^bits); L
    independent tables lift it to 1-(1-p)^L — the standard
    speed/recall dial. Vectorized numpy inside Arrow batches.

    ``keep_vec`` carries the vector through to the output so a
    downstream groupBy(table, bucket) co-locates each bucket's vectors
    for block scoring — the vector fans out L× (an LSH index stores L
    copies by construction); leave False when only ids should shuffle."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    shifts = np.arange(n_planes, dtype=np.uint64)

    def batches(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].map(np.asarray))
            signs = (mat @ planes.T) > 0  # (rows, tables*planes)
            signs = signs.reshape(len(mat), n_tables, n_planes)
            buckets = (signs.astype(np.uint64) << shifts).sum(axis=2).astype(np.int64)
            base = pdf if keep_vec else pdf.drop(columns=[vec_col])
            for t in range(n_tables):
                out = base.copy()
                out["table_idx"] = t
                out["bucket"] = buckets[:, t]
                yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields
        if keep_vec or f.name != vec_col
    )
    return emb.mapInPandas(batches, f"{out_schema}, table_idx int, bucket long")


def _pairs_topk(
    qids: np.ndarray,
    qmat: np.ndarray,
    cids: np.ndarray,
    cmat: np.ndarray,
    k: int,
    round_digits: int,
) -> pd.DataFrame:
    """One group's similarity block as a single BLAS matmul, then the
    per-query top-k with the engine's deterministic tie order (rounded
    sim desc, neighbor_id asc). Self-pairs (same id on both sides) are
    excluded. Runs inside applyInPandas — cost is bounded by the group
    (list/bucket) size, never the corpus."""
    order = np.argsort(cids, kind="stable")  # id-asc columns → stable ties
    cids, cmat = cids[order], cmat[order]
    qn = np.linalg.norm(qmat, axis=1)
    cn = np.linalg.norm(cmat, axis=1)
    sims = np.round((qmat @ cmat.T) / np.outer(qn, cn), round_digits)
    sims[qids[:, None] == cids[None, :]] = -np.inf
    kk = min(k, sims.shape[1])
    out_q, out_n, out_s = [], [], []
    for i in range(len(qids)):
        top = np.lexsort((cids, -sims[i]))[:kk]
        top = top[sims[i, top] != -np.inf]
        out_q.extend([qids[i]] * len(top))
        out_n.extend(cids[top])
        out_s.extend(sims[i, top])
    return pd.DataFrame(
        {
            "query_id": np.asarray(out_q, dtype=qids.dtype),
            "neighbor_id": np.asarray(out_n, dtype=cids.dtype),
            "sim": np.asarray(out_s, dtype=np.float64),
        }
    )


def _vec_matrix(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))


def _global_topk(per_group: DataFrame, k: int) -> DataFrame:
    """Final per-query rank over the union of per-group top-k rows —
    ≤ groups·k rows per query, so the window input is tiny. Any global
    top-k neighbor must be top-k within some group it shares with the
    query (≥k better group-mates would otherwise beat it globally), so
    pruning to per-group top-k loses nothing."""
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        per_group.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "sim")
    )


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
    """Approximate top-k: score only pairs sharing ≥1 LSH bucket.
    With 16 tables × 6 bits each vector probes ~L/2^b ≈ 1/4 of the
    corpus here (recall ≈ 0.5 on these weakly-correlated fixtures —
    measured in tests); on real embedding corpora with tight clusters
    the same config probes far less.

    Scoring is per-bucket block BLAS: vectors shuffle once into their
    (table, bucket) groups — the physical layout of an LSH index — and
    each group emits only its per-query top-k, deduped across tables
    (the same pair scores identically everywhere), then re-ranked
    globally over ≤ L·k rows per query."""
    sigs = lsh_signatures(
        emb.select(id_col, vec_col),
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
        keep_vec=True,
    )
    id_type = {f.name: f.dataType.simpleString() for f in emb.schema.fields}[id_col]

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        mat = _vec_matrix(pdf, vec_col)
        return _pairs_topk(ids, mat, ids, mat, k, round_digits)

    per_bucket = sigs.groupBy("table_idx", "bucket").applyInPandas(
        bucket_topk, f"query_id {id_type}, neighbor_id {id_type}, sim double"
    )
    return _global_topk(per_bucket.distinct(), k)


def train_ivf_centroids(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 42,
    max_train: int = 4096,
) -> np.ndarray:
    """Spherical k-means centroids, trained driver-side on a BOUNDED
    sample — never the full corpus. When the corpus exceeds
    ``max_train`` rows, a deterministic hash stride
    (pmod(xxhash64(id), ceil(n/max_train)) == 0) keeps ~max_train
    vectors regardless of partitioning, so training is reproducible and
    the driver holds at most max_train·dim doubles (a few MB) however
    large the corpus grows. Centroids converge from a few hundred
    vectors per list, so the cap does not hurt quality; only the
    [n_centroids, dim] matrix — kilobytes — is broadcast for
    assignment. Fixed-seed init + id-ordered sample keep lists
    reproducible run-to-run."""
    sample = emb.select(id_col, vec_col)
    n = sample.count()
    if n > max_train:
        stride = -(-n // max_train)  # ceil
        sample = sample.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
        )
    pdf = sample.orderBy(id_col).select(vec_col).toPandas()
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
    keep_vec: bool = False,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroid lists
    (cosine). n_probe=1 partitions the corpus into inverted lists;
    n_probe>1 is the query-side probe fan-out. One row per (vector,
    probed list); by default vectors are dropped — only ids shuffle.
    ``probe_rank`` orders the probed lists by centroid proximity, so
    rank 0 is the vector's home list — one pass serves both the
    corpus-side filing (probe_rank = 0) and the query-side fan-out.
    ``keep_vec`` carries the vector along (n_probe copies) so a
    downstream groupBy(list_id) co-locates each list's vectors — the
    physical layout of a sharded IVF index."""
    bc = emb.sparkSession.sparkContext.broadcast(centroids)

    def batches(it):
        cents = bc.value
        for pdf in it:
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            order = np.argsort(-(mat @ cents.T), axis=1)[:, :n_probe]
            base = pdf if keep_vec else pdf.drop(columns=[vec_col])
            for p in range(n_probe):
                out = base.copy()
                out["list_id"] = order[:, p].astype(np.int32)
                out["probe_rank"] = np.int32(p)
                yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields
        if keep_vec or f.name != vec_col
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
    brute force in tests.

    One assignment pass serves both sides: within each list group,
    probe_rank 0 rows are the corpus filing (a vector lives in exactly
    one home list) and ALL rows are query probes, so no union or
    join-back is needed. Each list scores as one BLAS block and emits
    per-query top-k; the global re-rank sees ≤ n_probe·k rows per
    query. Vectors shuffle once, partitioned by list — a sharded IVF
    index's layout — so the plan holds however large the corpus."""
    vecs = emb.select(id_col, vec_col)
    cents = train_ivf_centroids(
        vecs, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
    )
    assigned = ivf_assign(
        vecs, cents, vec_col=vec_col, n_probe=n_probe, keep_vec=True
    )
    id_type = {f.name: f.dataType.simpleString() for f in emb.schema.fields}[id_col]

    def list_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        home = pdf["probe_rank"].to_numpy() == 0
        ids = pdf[id_col].to_numpy()
        if not home.any():  # list holds only probes, nothing filed
            return pd.DataFrame(
                {
                    "query_id": np.asarray([], dtype=ids.dtype),
                    "neighbor_id": np.asarray([], dtype=ids.dtype),
                    "sim": np.asarray([], dtype=np.float64),
                }
            )
        mat = _vec_matrix(pdf, vec_col)
        return _pairs_topk(ids, mat, ids[home], mat[home], k, round_digits)

    per_list = assigned.groupBy("list_id").applyInPandas(
        list_topk, f"query_id {id_type}, neighbor_id {id_type}, sim double"
    )
    # a neighbor's home list is unique → each (query, neighbor) pair
    # surfaces from exactly one group; no dedup needed
    return _global_topk(per_list, k)
