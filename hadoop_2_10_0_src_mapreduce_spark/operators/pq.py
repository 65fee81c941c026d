"""Product quantization (PQ) for embedding columns — the memory tier
below int8.

Extension beyond the reference (no vector ops existed in Hadoop MR;
per SURVEY §0 no reference file:line exists to cite). Published
technique: Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011) — split each d-dim vector into ``m``
contiguous subvectors, k-means each subspace into ``k`` codes, store
each vector as ``m`` small code ids. At 100 TB this is the difference
between an embedding store that fits in cluster memory and one that
doesn't:

  float32, d=64:   256 B/vector
  int8  (quantize_embeddings):   64 B + scale  (4×)
  PQ, m=8, k≤256:   8 B of codes (32×) + one shared [m,k,d/m] codebook

Query-side scoring is ADC (asymmetric distance computation): the
query stays FULL precision; one lookup table LUT[m, k] =
dot(query_sub_m, codebook[m, k]) per query turns every corpus
approximate dot into ``m`` table lookups + adds — no per-dimension
work at scan time. Candidates from ADC are then (optionally) rescored
exactly against the float vectors, the same candidates-then-rescore
recipe as the int8 path.

Spark shapes, same posture as operators/similarity.py:

- training is driver-side on the SAME bounded md5-stride sample as
  ``train_ivf_centroids`` (≤ max_train vectors, a few MB) — the corpus
  is never collected;
- encode/decode/score run in Arrow-batched ``mapInPandas`` where the
  codes live — the corpus never shuffles; only ≤ partitions·k
  candidate rows per query move into the global re-rank;
- the codebook ([m, k, d/m] float64 — for m=8, k=256, d=64:
  ~1 MB) is a broadcast variable, the same kilobyte-scale broadcast
  class as IVF centroids;
- exact rescore joins candidate ids back to the distributed float
  table (``_score_pairs``) — vectors join where they live.

PQ is pytest-verified (determinism, nearest-code invariant,
reconstruction dominance over int8, recall pins vs brute force) — the
same verification class as int8 quantization; ADC ranking is
approximate by construction, so there is no exact SQL oracle twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.operators.similarity import (
    _global_topk,
    _md5_key,
    _score_pairs,
    _seq_sq_norms,
)


def _pq_geometry(dim: int, n_subspaces: int) -> int:
    if dim % n_subspaces != 0:
        raise ValueError(
            f"PQ needs dim divisible by n_subspaces: dim={dim}, "
            f"n_subspaces={n_subspaces} (pad or pick a divisor)"
        )
    return dim // n_subspaces


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    """Unit-normalize (cosine convention, matching the ANN family);
    zero vectors stay zero rather than NaN-poisoning the codebooks."""
    norms = np.sqrt(_seq_sq_norms(mat))
    norms[norms == 0.0] = 1.0
    return mat / norms[:, None]


def _kmeans_l2(
    ids: np.ndarray, sub: np.ndarray, n_codes: int, n_iters: int
) -> np.ndarray:
    """Deterministic L2 k-means for ONE subspace: init = the first
    ``n_codes`` sample subvectors ordered by (md5(id), id) — the same
    seeding trick as ``_kmeans_spherical`` — assignment by min
    squared-L2 with ties toward the lowest code index (stable argmin),
    empty codes keep their previous centroid. Plain numpy reductions:
    PQ has no SQL oracle to replay, so the sequential-accumulation
    discipline of the IVF trainer isn't needed here."""
    init = sorted(range(len(ids)), key=lambda i: _md5_key(ids[i]))
    k = min(n_codes, len(ids))
    codes = sub[init[:k]].copy()
    for _ in range(n_iters):
        # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² is rank-constant
        d2 = -2.0 * (sub @ codes.T) + (codes * codes).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)  # np.argmin returns the FIRST min
        for c in range(k):
            members = sub[assign == c]
            if len(members):
                codes[c] = members.mean(axis=0)
    return codes


def train_pq_codebooks(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 8,
    n_codes: int = 256,
    n_iters: int = 5,
    max_train: int = 4096,
) -> np.ndarray:
    """Train the [n_subspaces, n_codes, dim/n_subspaces] PQ codebook
    on the same BOUNDED deterministic sample as ``train_ivf_centroids``
    (md5-stride keeps ~max_train vectors however large the corpus; the
    driver holds a few MB). Vectors are unit-normalized first — the
    cosine convention of the whole ANN family — so ADC dot sums
    approximate cosine directly. Training is deterministic (md5-seeded
    init per subspace, first-min ties), so two trains over the same
    corpus produce identical codebooks.

    When the sample has fewer than ``n_codes`` vectors the codebook
    holds one code per sample vector (reconstruction is then exact on
    the sample); the returned array's second axis reflects the actual
    code count."""
    sample = emb.select(id_col, vec_col)
    n = sample.count()
    if n > max_train:
        stride = -(-n // max_train)  # ceil
        from hadoop_2_10_0_src_mapreduce_spark.functions.hashing import md5_u32

        sample = sample.where(
            md5_u32(F.col(id_col).cast("string")) % F.lit(stride) == 0
        )
    pdf = sample.orderBy(id_col).toPandas()
    if not len(pdf):
        raise ValueError("train_pq_codebooks: empty training corpus")
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
    dsub = _pq_geometry(mat.shape[1], n_subspaces)
    mat = _normalize_rows(mat)
    books = [
        _kmeans_l2(ids, mat[:, s * dsub : (s + 1) * dsub], n_codes, n_iters)
        for s in range(n_subspaces)
    ]
    return np.stack(books)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as its per-subspace nearest-code ids:
    (id, codes array<smallint> of length m, *keep_cols). Runs where the
    vectors live (Arrow-batched mapInPandas, broadcast codebook) — the
    corpus never shuffles, and the emitted payload is m smallints per
    row instead of d floats. smallint (not tinyint) so n_codes up to
    32k work and 256 stays unsigned-safe."""
    m, _, dsub = codebooks.shape
    bc = emb.sparkSession.sparkContext.broadcast(codebooks)

    def batches(it):
        books = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            mat = _normalize_rows(mat)
            codes = np.empty((len(pdf), m), dtype=np.int16)
            for s in range(m):
                sub = mat[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * (sub @ books[s].T) + (books[s] * books[s]).sum(axis=1)[None, :]
                codes[:, s] = d2.argmin(axis=1).astype(np.int16)
            out = pdf[[id_col, *keep_cols]].copy()
            out[codes_col] = list(codes)
            yield out

    keep_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields
        if f.name in keep_cols
    )
    id_type = {f.name: f.dataType.simpleString() for f in emb.schema.fields}[id_col]
    return emb.select(id_col, vec_col, *keep_cols).mapInPandas(
        batches, f"{id_col} {id_type}{keep_schema}, {codes_col} array<smallint>"
    )


def pq_decode(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct the (unit-normalized) vector each code row stands
    for: concat of the m looked-up codewords. The PQ analogue of
    ``dequantize_embeddings`` — used for audits and tests; production
    scoring goes through ``pq_topk``'s LUT instead of materializing
    reconstructions."""
    m, _, dsub = codebooks.shape
    bc = codes_df.sparkSession.sparkContext.broadcast(codebooks)

    def batches(it):
        books = bc.value
        flat = books.reshape(m, -1, dsub)
        for pdf in it:
            if not len(pdf):
                continue
            codes = np.stack(pdf[codes_col].map(np.asarray))
            rec = np.concatenate(
                [flat[s][codes[:, s]] for s in range(m)], axis=1
            )
            out = pdf[[id_col]].copy()
            out[out_col] = list(rec)
            yield out

    id_type = {f.name: f.dataType.simpleString() for f in codes_df.schema.fields}[
        id_col
    ]
    return codes_df.select(id_col, codes_col).mapInPandas(
        batches, f"{id_col} {id_type}, {out_col} array<double>"
    )


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
    rescore: DataFrame | None = None,
    oversample: int = 4,
    max_queries: int = 4096,
) -> DataFrame:
    """ADC top-k over a PQ-encoded corpus: (query_id, rnk,
    neighbor_id, sim), the ANN-family output shape.

    The query batch is the SMALL serving side (same contract as
    ``brute_force_topk``'s broadcast): it is collected to the driver
    (guarded by ``max_queries``), normalized, and shipped as one
    [q, m, k_codes] lookup table — LUT[q, s, c] = dot(q_sub_s,
    codebook[s, c]) — inside a broadcast. Each corpus partition then
    scores its own rows with m lookups + adds per (row, query) and
    emits only its per-query top-(k·oversample); the global window
    re-ranks ≤ partitions·k·oversample rows per query. The corpus
    never shuffles and never leaves its executors.

    ``rescore`` (the float vector table, e.g. the original embeddings)
    turns the ADC ranking into candidates-then-exact: the top
    k·oversample ADC candidates per query join back to their float
    vectors (``_score_pairs`` — exact sequential cosine where the
    vectors live) and the final top-k ranks by TRUE cosine. sim is
    then exact for every returned row; ADC error can only cost recall,
    never precision."""
    n_q = queries.count()
    if n_q == 0:
        raise ValueError("pq_topk: empty query batch")
    if n_q > max_queries:
        raise ValueError(
            f"pq_topk: {n_q} queries > max_queries={max_queries}; ADC "
            "broadcasts one LUT row per query — batch the queries, or "
            "raise max_queries if the LUT (q·m·k_codes doubles) fits"
        )
    m, k_codes, dsub = codebooks.shape
    qpdf = queries.select(id_col, vec_col).toPandas()
    qids = qpdf[id_col].to_numpy()
    qmat = _normalize_rows(
        np.stack(qpdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
    )
    lut = np.empty((len(qids), m, k_codes))
    for s in range(m):
        lut[:, s, :] = qmat[:, s * dsub : (s + 1) * dsub] @ codebooks[s].T
    bc = codes_df.sparkSession.sparkContext.broadcast((qids, lut))
    n_cand = k * (oversample if rescore is not None else 1)
    scale = 10.0**round_digits

    def batches(it):
        b_qids, b_lut = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            codes = np.stack(pdf[codes_col].map(np.asarray))
            # sims[q, row] = Σ_s LUT[q, s, codes[row, s]]
            sims = np.zeros((len(b_qids), len(cids)))
            for s in range(m):
                sims += b_lut[:, s, :][:, codes[:, s]]
            sims[:, :] = np.copysign(
                np.floor(np.abs(sims) * scale + 0.5), sims
            ) / scale
            sims[b_qids[:, None] == cids[None, :]] = -np.inf
            kk = min(n_cand, sims.shape[1])
            out_q, out_n, out_s = [], [], []
            for i in range(len(b_qids)):
                top = np.lexsort((cids, -sims[i]))[:kk]
                top = top[sims[i, top] != -np.inf]
                out_q.extend([b_qids[i]] * len(top))
                out_n.extend(cids[top])
                out_s.extend(sims[i, top])
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(out_q, dtype=qids.dtype),
                    "neighbor_id": np.asarray(out_n, dtype=cids.dtype),
                    "sim": np.asarray(out_s, dtype=np.float64),
                }
            )

    id_type = {f.name: f.dataType.simpleString() for f in codes_df.schema.fields}[
        id_col
    ]
    per_part = codes_df.select(id_col, codes_col).mapInPandas(
        batches, f"query_id {id_type}, neighbor_id {id_type}, sim double"
    )
    if rescore is None:
        return _global_topk(per_part, k)
    cands = _global_topk(per_part, n_cand).select("query_id", "neighbor_id")
    exact = _score_pairs(rescore, cands, id_col, vec_col, round_digits)
    return _global_topk(exact, k)
