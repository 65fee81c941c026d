"""Catalog: similarity-search extensions over the embeddings table.

Cosine values are computed with sequential double accumulation on both
sides (Spark aggregate/zip_with ≡ DuckDB list_inner_product over
DOUBLE[]) — verified bit-identical — then rounded to 6 digits with
neighbor-id tiebreaks, so top-k sets and order are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions.hashing import md5_u32_sql
from hadoop_2_10_0_src_mapreduce_spark.operators import similarity
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import load_table

_COS = (
    "list_inner_product(a.v, b.v) / "
    "(sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))"
)

def _ivf_cte_chain(
    corpus_sql: str,
    *,
    n_centroids: int | str,
    n_iters: int,
    n_probe: int,
    max_train: int,
    dim: int,
) -> str:
    """The engine-replay of deterministic spherical k-means as a CTE
    chain (NO leading WITH, so callers can prepend WITH RECURSIVE):
    ``e`` (corpus as DOUBLE[]), ``vn`` (normalized), ``samp``
    (md5-stride bounded training sample), ``cent_0..cent_{n_iters}``
    (unrolled iterations: argmax-assign via ROW_NUMBER over
    list_inner_product, member-ordered sequential mean via
    list_inner_product(list(x ORDER BY id), ones), blanket
    renormalization), ``probes`` (stable n_probe fan-out), ``home``
    (probe_rank 0 filing). Shared by the IVF ANN oracle and the
    semantic-dedup oracle — one replay of the trainer, two consumers.
    ``n_centroids`` may be an int literal or a scalar-subquery string
    (e.g. ``similarity.adaptive_centroids_sql('e')``) so the cell
    count can scale with the corpus exactly as the engine's does."""
    u32 = md5_u32_sql("CAST(vec_id AS VARCHAR)")
    parts = [f"""e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM ({corpus_sql})),
nrm AS MATERIALIZED (
    SELECT vec_id, sqrt(list_inner_product(v, v)) AS nm FROM e
),
vn AS MATERIALIZED (
    SELECT e.vec_id, list_transform(e.v, x -> x / nrm.nm) AS nv
    FROM e JOIN nrm ON nrm.vec_id = e.vec_id
),
samp AS MATERIALIZED (
    SELECT vec_id, nv FROM vn
    WHERE ({u32}) %
          (SELECT CAST(CEIL(COUNT(*) / {max_train}.0) AS BIGINT) FROM e) = 0
),
cent_0 AS MATERIALIZED (
    SELECT rn - 1 AS c, nv AS vec FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
               nv
        FROM samp) WHERE rn <= {n_centroids}
)"""]
    for i in range(1, n_iters + 1):
        parts.append(f""",
assign_{i} AS (
    SELECT vec_id, c FROM (
        SELECT s.vec_id, ct.c,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                   ORDER BY list_inner_product(s.nv, ct.vec) DESC, ct.c) AS rn
        FROM samp s CROSS JOIN cent_{i - 1} ct) WHERE rn = 1
),
sums_{i} AS (
    SELECT a.c, d.di,
           list_inner_product(
               list(s.nv[d.di + 1] ORDER BY s.vec_id),
               list_transform(list(s.nv[d.di + 1] ORDER BY s.vec_id),
                              y -> CAST(1 AS DOUBLE))) AS sm,
           COUNT(*) AS cnt
    FROM assign_{i} a JOIN samp s USING (vec_id) CROSS JOIN range({dim}) d(di)
    GROUP BY a.c, d.di
),
merged_{i} AS (
    SELECT o.c, COALESCE(nw.vec, o.vec) AS vec
    FROM cent_{i - 1} o LEFT JOIN
         (SELECT c, list(sm / cnt ORDER BY di) AS vec FROM sums_{i} GROUP BY c) nw
         USING (c)
),
cent_{i} AS MATERIALIZED (
    SELECT c, list_transform(vec, x -> x / nrm) AS vec
    FROM (SELECT c, vec, sqrt(list_inner_product(vec, vec)) AS nrm FROM merged_{i})
)""")
    parts.append(f""",
probes AS MATERIALIZED (
    SELECT vec_id, c AS list_id, rn - 1 AS probe_rank FROM (
        SELECT vn.vec_id, ct.c,
               ROW_NUMBER() OVER (PARTITION BY vn.vec_id
                   ORDER BY list_inner_product(vn.nv, ct.vec) DESC, ct.c) AS rn
        FROM vn CROSS JOIN cent_{n_iters} ct) WHERE rn <= {n_probe}
),
home AS MATERIALIZED (SELECT vec_id, list_id FROM probes WHERE probe_rank = 0)""")
    return "".join(parts)

# --- brute-force top-k (correctness anchor) ---------------------------

_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round({_COS}, 6) AS sim
    FROM e a, e b
    WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, rnk, neighbor_id, sim
FROM ranked WHERE rnk <= 5
ORDER BY query_id, rnk
"""


@register("sim_topk_bruteforce", _TOPK_ORACLE, tags=("similarity",),
          doc="Exact cosine top-5 neighbors for query vectors (vec_id<20); broadcast queries, corpus never shuffles.")
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.brute_force_topk(emb, queries, k=5).orderBy("query_id", "rnk")


# --- embedding-cosine near-dup + SEMANTIC dedup (two branches) ---------
# 'pairs': LSH-candidate near-dup pairs at sim≥0.99 over a corpus with
# planted copies (unchanged semantics; oracle brute-forces all pairs).
# 'semdedup': SemDeDup-style semantic duplicate CLUSTERS — spherical
# k-means cells (the oracle-exact IVF trainer), pairs generated only
# within each home cell at sim≥0.95, connected components, one (id,
# rep) row per participating vector (sim NULL). Oracle replays the
# entire path: the unrolled k-means CTE chain (shared with
# sim_ann_ivf), home-cell pair join + sequential cosine, recursive
# reachability components — approximation and all.

from hadoop_2_10_0_src_mapreduce_spark.plans.catalog.dedupops import (
    PLANT_OFFSET,
)

_CORPUS_PLANTED_SQL = f"""
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {PLANT_OFFSET} AS vec_id, embedding
    FROM embeddings WHERE vec_id % 20 = 0
"""


def _neardup_oracle() -> str:
    chain = _ivf_cte_chain(
        _CORPUS_PLANTED_SQL,
        n_centroids=similarity.adaptive_centroids_sql("e"),
        n_iters=5, n_probe=1, max_train=4096, dim=64,
    )
    return f"""
WITH RECURSIVE {chain},
brute AS (
    -- sim computed ONCE per pair from shared per-vector norms (the
    -- old form evaluated the full cosine twice: WHERE + SELECT), on
    -- the one O(n^2) join this oracle keeps - bit-identical values
    SELECT id_a, id_b, sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_inner_product(a.v, b.v) / (na.nm * nb.nm), 6) AS sim
        FROM e a JOIN nrm na ON na.vec_id = a.vec_id,
             e b JOIN nrm nb ON nb.vec_id = b.vec_id
        WHERE a.vec_id < b.vec_id)
    WHERE sim >= 0.99
),
sem_pairs AS MATERIALIZED (
    SELECT ha.vec_id AS id_a, hb.vec_id AS id_b
    FROM home ha JOIN home hb
         ON ha.list_id = hb.list_id AND ha.vec_id < hb.vec_id
    JOIN e qa ON qa.vec_id = ha.vec_id
    JOIN e qb ON qb.vec_id = hb.vec_id
    JOIN nrm qan ON qan.vec_id = ha.vec_id
    JOIN nrm qbn ON qbn.vec_id = hb.vec_id
    WHERE round(list_inner_product(qa.v, qb.v) / (qan.nm * qbn.nm), 6)
          >= 0.95
),
sem_adj AS (
    SELECT id_a AS src, id_b AS dst FROM sem_pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM sem_pairs
),
sem_walk(id, lab) AS (
    SELECT src, src FROM sem_adj
    UNION
    SELECT a.src, w.lab FROM sem_adj a JOIN sem_walk w ON w.id = a.dst
),
sem_clusters AS (
    SELECT id, MIN(lab) AS rep FROM sem_walk GROUP BY id
)
SELECT 'pairs' AS branch, id_a, id_b, sim FROM brute
UNION ALL
SELECT 'semdedup' AS branch, id AS id_a, rep AS id_b,
       CAST(NULL AS DOUBLE) AS sim
FROM sem_clusters
ORDER BY branch, id_a, id_b
"""


@register("sim_near_dup_embeddings", _neardup_oracle(), tags=("similarity", "dedup"),
          doc="Embedding-cosine near-dup pairs (sim≥0.99, planted copies) PLUS SemDeDup-style semantic duplicate clusters (k-means home cells, within-cell pairs at sim≥0.95, connected components); oracle replays k-means, cell pairs, and components exactly.")
def sim_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    pairs = similarity.near_dup_pairs(corpus, threshold=0.99).select(
        F.lit("pairs").alias("branch"), "id_a", "id_b", "sim"
    )
    # n_centroids="auto": cells scale with the corpus (16 at the
    # sf≤0.1 fixtures — unchanged results there; 160 at sf1), keeping
    # within-cell pair volume linear in n. The oracle derives the SAME
    # count via adaptive_centroids_sql over its own corpus CTE.
    clusters = similarity.semantic_dedup(
        corpus, threshold=0.95, n_centroids="auto"
    ).select(
        F.lit("semdedup").alias("branch"),
        F.col("id").alias("id_a"),
        F.col("rep").alias("id_b"),
        F.lit(None).cast("double").alias("sim"),
    )
    return pairs.unionByName(clusters).orderBy("branch", "id_a", "id_b")


# --- LSH-bucketed ANN (scale path; oracle recomputes the index) --------
# Oracle-checkable because the hyperplanes are md5-derived (component
# (t,p,d) = 2·(uint32 of md5("t:p:d")[:8])/2³² − 1 — every step exact
# in binary64) and the sign dots accumulate sequentially, so DuckDB
# recomputes the identical buckets with list_inner_product, replays the
# same md5-ordered hot-bucket cap, and rescores candidates with the
# same sequential cosine — bit-for-bit the ANN result, approximation
# and all. Same technique as dedup_simhash's md5 signature bits.


def _ann_lsh_oracle(
    dim: int = 64,
    max_bucket: int = 1024,
    k: int = 5,
) -> str:
    # first 8 md5 hex digits → uint32, via positional digit arithmetic
    # (DuckDB parses float literals as DECIMAL, so everything numeric
    # here stays integer until the single exact ÷2³²).
    hex2int = " + ".join(
        f"(instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    # Adaptive bit AND table counts: planes are BUILT at the
    # structural max (range() takes only constants) but only the
    # first p planes of the first T tables are USED, where p/T come
    # from adaptive_planes_sql / adaptive_tables_sql — the identical
    # integer-threshold rules the engine's "auto" defaults apply, so
    # buckets match bit-for-bit at every corpus size. Component
    # (t,p,d) depends only on its own md5 key, so "first p of max" ==
    # "built with p" (and likewise for tables; T resolves to 16 at
    # every ≤10-bit fixture, where this mask is exactly the pre-r8
    # literal 16).
    p_expr = similarity.adaptive_planes_sql("e")
    t_expr = similarity.adaptive_tables_sql("e")
    return f"""
WITH raw AS (
    SELECT t.ti, p.pi, d.di,
           md5(CAST(t.ti AS VARCHAR) || ':' || CAST(p.pi AS VARCHAR) || ':' ||
               CAST(d.di AS VARCHAR)) AS h
    FROM range({similarity.LSH_MAX_TABLES}) t(ti),
         range({similarity.LSH_MAX_PLANES}) p(pi),
         range({dim}) d(di)
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (
    SELECT ti, pi, di, 2.0 * (({hex2int}) / 4294967296.0) - 1.0 AS c
    FROM raw WHERE ti < {t_expr} AND pi < {p_expr}
),
planes AS (SELECT ti, pi, list(c ORDER BY di) AS plane FROM comp GROUP BY ti, pi),
lnrm AS MATERIALIZED (
    SELECT vec_id, sqrt(list_inner_product(v, v)) AS nm FROM e
),
sigs AS (
    SELECT e.vec_id, pl.ti,
           SUM(CASE WHEN list_inner_product(e.v, pl.plane) > 0
               THEN (1 << pl.pi) ELSE 0 END) AS bucket
    FROM e, planes pl
    GROUP BY e.vec_id, pl.ti
),
capped AS (
    SELECT vec_id, ti, bucket FROM sigs
    QUALIFY ROW_NUMBER() OVER (PARTITION BY ti, bucket
                               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
            <= {max_bucket}
),
cands AS (
    SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
    FROM capped a JOIN capped b ON a.ti = b.ti AND a.bucket = b.bucket
    WHERE a.vec_id < b.vec_id
),
scored AS (
    SELECT c.qid, c.nid,
           round(list_inner_product(q.v, n.v) / (qn.nm * nn.nm), 6) AS sim
    FROM cands c
    JOIN e q ON q.vec_id = c.qid
    JOIN e n ON n.vec_id = c.nid
    JOIN lnrm qn ON qn.vec_id = c.qid
    JOIN lnrm nn ON nn.vec_id = c.nid
),
sym AS (
    SELECT qid AS query_id, nid AS neighbor_id, sim FROM scored
    UNION ALL
    SELECT nid AS query_id, qid AS neighbor_id, sim FROM scored
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rnk
    FROM sym
)
SELECT query_id, rnk, neighbor_id, sim
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rnk
"""


@register("sim_ann_lsh", _ann_lsh_oracle(), tags=("similarity",),
          doc="Approximate top-5 via multi-table LSH (16 tables, adaptive bit count holding E[bucket]~32, md5-derived hyperplanes, md5-ordered hot-bucket cap); oracle recomputes buckets+rescore exactly; recall unit test vs brute force.")
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Measured variance note (round 3): 2.0 s warm on a quiet box,
    # 2.5–3.0 s in-bench under host contention — the spread is load,
    # not plan (signature subtree is cache-reused across bench passes).
    # n_planes="auto": 6 bits at the sf≤0.1 fixtures (unchanged
    # results there), 10 bits at sf1 — E[bucket occupancy] stays ~32
    # so candidate-pair work is linear in n, not n²/buckets. The
    # oracle masks its structural-max plane set with the same rule.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(emb, k=5, n_planes="auto").orderBy(
        "query_id", "rnk"
    )


# --- IVF ANN (data-learned lists; the other half of the ANN dial) ------
# Oracle-checkable since round 4: training is deterministic (init =
# first n_centroids sample vectors by (md5(id), id); every float
# reduction sequential), so DuckDB re-runs the whole spherical k-means
# as n_iters unrolled CTE stages — argmax-assign via ROW_NUMBER over
# list_inner_product, member-ordered mean via
# list_inner_product(list(x ORDER BY id), ones) (sequential sum), same
# blanket renormalization — then replays probe assignment and the
# sequential cosine rescore. Block-shard membership is NOT replayed:
# the final top-k is block-invariant (proven by
# test_ivf_sharded_blocks_match_single_block), so the oracle computes
# the global rank directly. Same md5-seeding philosophy as
# _ann_lsh_oracle / dedup_simhash.
#
# Round 7 adds the 'ivfpq' branch: product-quantization ADC top-k +
# exact rescore (operators/pq.py), the serving path the persisted
# IVF-PQ index uses. Every float reduction in the PQ trainer, encoder,
# and ADC scorer is sequential (pq._l2_rank_dist / _seq_matdot), so
# the oracle replays the per-subspace L2 k-means codebooks (same
# md5-stride sample + (md5(id), id) init order as the IVF trainer,
# first-min ties toward the lower code id, member-ordered means,
# empty codes carry), the corpus encoding, the per-query LUT, the
# s-ordered ADC sums, the k·oversample candidate cut, and the exact
# cosine re-rank — approximation and all.

# PQ gate geometry: small codebooks keep the oracle's unrolled k-means
# CTEs cheap at sf1 while still exercising every kernel; both sides
# take the SAME literals.
_PQ_M, _PQ_CODES, _PQ_ITERS, _PQ_OVERSAMPLE = 8, 32, 3, 4


def _pq_cte_chain(
    *,
    n_subspaces: int,
    n_codes: int,
    n_iters: int,
    dim: int,
    query_pred: str,
    k: int,
    oversample: int,
) -> str:
    """PQ replay as CTEs appended AFTER ``_ivf_cte_chain`` — reuses its
    ``e`` (raw DOUBLE[] corpus), ``vn`` (normalized), and ``samp``
    (md5-stride bounded training sample): the PQ trainer samples and
    normalizes exactly like the IVF trainer, so one replay feeds both.
    Stages: per-subspace slices (``list_slice``), codebook init (first
    n_codes sample subvectors by (md5(id), id)), ``n_iters`` unrolled
    L2 k-means steps (assign by −2·lip(x,c)+lip(c,c) ASC with c-asc
    ties — pq._l2_rank_dist's exact expression — member-ordered
    sequential means, COALESCE carries empty codes), full-corpus
    encoding, per-query LUT, s-ordered sequential ADC sums rounded at
    6 digits, top-(k·oversample) candidates by (adc DESC, id), exact
    sequential-cosine re-rank to top-k."""
    dsub = dim // n_subspaces
    parts = [f"""
pqsub AS MATERIALIZED (
    SELECT vec_id, s.si AS s,
           list_slice(nv, s.si * {dsub} + 1, (s.si + 1) * {dsub}) AS sv
    FROM samp CROSS JOIN range({n_subspaces}) s(si)
),
pqcb_0 AS MATERIALIZED (
    SELECT s, rn - 1 AS c, sv AS cw FROM (
        SELECT s, sv,
               ROW_NUMBER() OVER (PARTITION BY s
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM pqsub) WHERE rn <= {n_codes}
)"""]
    for i in range(1, n_iters + 1):
        parts.append(f""",
pqa_{i} AS (
    SELECT vec_id, s, c FROM (
        SELECT p.vec_id, p.s, cb.c,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.s
                   ORDER BY -2.0 * list_inner_product(p.sv, cb.cw)
                            + list_inner_product(cb.cw, cb.cw), cb.c) AS rn
        FROM pqsub p JOIN pqcb_{i - 1} cb ON cb.s = p.s) WHERE rn = 1
),
pqsums_{i} AS (
    SELECT a.s, a.c, d.di,
           list_inner_product(
               list(p.sv[d.di + 1] ORDER BY p.vec_id),
               list_transform(list(p.sv[d.di + 1] ORDER BY p.vec_id),
                              y -> CAST(1 AS DOUBLE))) AS sm,
           COUNT(*) AS cnt
    FROM pqa_{i} a JOIN pqsub p ON p.vec_id = a.vec_id AND p.s = a.s
    CROSS JOIN range({dsub}) d(di)
    GROUP BY a.s, a.c, d.di
),
pqcb_{i} AS MATERIALIZED (
    SELECT o.s, o.c, COALESCE(nw.cw, o.cw) AS cw
    FROM pqcb_{i - 1} o LEFT JOIN
         (SELECT s, c, list(sm / cnt ORDER BY di) AS cw
          FROM pqsums_{i} GROUP BY s, c) nw
         ON nw.s = o.s AND nw.c = o.c
)""")
    parts.append(f""",
pqall AS MATERIALIZED (
    SELECT vec_id, s.si AS s,
           list_slice(nv, s.si * {dsub} + 1, (s.si + 1) * {dsub}) AS sv
    FROM vn CROSS JOIN range({n_subspaces}) s(si)
),
pqcodes AS MATERIALIZED (
    SELECT vec_id, s, c FROM (
        SELECT p.vec_id, p.s, cb.c,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.s
                   ORDER BY -2.0 * list_inner_product(p.sv, cb.cw)
                            + list_inner_product(cb.cw, cb.cw), cb.c) AS rn
        FROM pqall p JOIN pqcb_{n_iters} cb ON cb.s = p.s) WHERE rn = 1
),
pqlut AS MATERIALIZED (
    SELECT qs.vec_id AS qid, cb.s, cb.c,
           list_inner_product(qs.sv, cb.cw) AS term
    FROM pqall qs JOIN pqcb_{n_iters} cb ON cb.s = qs.s
    WHERE {query_pred.replace('vec_id', 'qs.vec_id')}
),
pqsims AS MATERIALIZED (
    SELECT l.qid, pc.vec_id AS nid,
           round(list_inner_product(
               list(l.term ORDER BY l.s),
               list_transform(list(l.term ORDER BY l.s),
                              y -> CAST(1 AS DOUBLE))), 6) AS adc
    FROM pqcodes pc JOIN pqlut l ON l.s = pc.s AND l.c = pc.c
    WHERE l.qid <> pc.vec_id
    GROUP BY l.qid, pc.vec_id
),
pqcand AS (
    SELECT qid, nid FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY adc DESC, nid) AS rn
        FROM pqsims) WHERE rn <= {k * oversample}
),
pqranked AS (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rnk
    FROM (
        SELECT c.qid AS query_id, c.nid AS neighbor_id,
               round({_COS}, 6) AS sim
        FROM pqcand c
        JOIN e a ON a.vec_id = c.qid
        JOIN e b ON b.vec_id = c.nid)
)""")
    return "".join(parts)


def _ann_ivf_oracle(
    n_centroids: int = 16,
    n_iters: int = 5,
    n_probe: int = 4,
    max_train: int = 4096,
    k: int = 5,
    dim: int = 64,
) -> str:
    chain = _ivf_cte_chain(
        "SELECT vec_id, embedding FROM embeddings",
        n_centroids=n_centroids, n_iters=n_iters, n_probe=n_probe,
        max_train=max_train, dim=dim,
    )
    pq_chain = _pq_cte_chain(
        n_subspaces=_PQ_M, n_codes=_PQ_CODES, n_iters=_PQ_ITERS,
        dim=dim, query_pred="vec_id < 20", k=k, oversample=_PQ_OVERSAMPLE,
    )
    parts = [f"""
WITH {chain}"""]
    parts.append(f""",
qside AS MATERIALIZED (
    -- r8: glue vector + norm onto the SMALL per-side tables first so
    -- the probes x home stream (~100M rows at sf1) flows through ONE
    -- join instead of five - the quadratic stream previously
    -- re-materialized through four more hash joins (e/nrm per side),
    -- which was the sf1 oracle wall. Same operands, same expression,
    -- bit-identical sims.
    SELECT p.vec_id, p.list_id, e.v, nrm.nm
    FROM probes p JOIN e USING (vec_id) JOIN nrm USING (vec_id)
),
hside AS MATERIALIZED (
    SELECT h.vec_id, h.list_id, e.v, nrm.nm
    FROM home h JOIN e USING (vec_id) JOIN nrm USING (vec_id)
),
scored AS (
    -- norms from the shared nrm CTE: one sqrt(lip) per VECTOR instead
    -- of two per PAIR (bit-identical values, ~3x less lip work)
    SELECT q.vec_id AS query_id, nb.vec_id AS neighbor_id,
           round(list_inner_product(q.v, nb.v) / (q.nm * nb.nm), 6) AS sim
    FROM qside q JOIN hside nb
        ON q.list_id = nb.list_id AND q.vec_id <> nb.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rnk
    FROM scored
),
{pq_chain.lstrip()}
SELECT 'ivf' AS branch, query_id, rnk, neighbor_id, sim
FROM ranked WHERE rnk <= {k}
UNION ALL
SELECT 'ivfpq' AS branch, query_id, rnk, neighbor_id, sim
FROM pqranked WHERE rnk <= {k}
ORDER BY branch, query_id, rnk""")
    return "".join(parts)


@register("sim_ann_ivf", _ann_ivf_oracle(), tags=("similarity",),
          doc="Two hash-checked ANN strategies in one slot: 'ivf' (md5-seeded deterministic spherical k-means lists, queries probe 4/16 nearest lists) and 'ivfpq' (per-subspace L2 k-means codebooks, s-ordered sequential ADC sums, k·oversample candidates, exact cosine re-rank — the PQ serving path); oracle unrolls BOTH trainers as CTE stages and replays probes/codes/LUT/rescore exactly.")
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_2_10_0_src_mapreduce_spark.operators import pq

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # ONE corpus count serves both trainers' md5-stride rule (each
    # paid its own count() job before — same value, same stride)
    n_corpus = emb.count()
    ivf = similarity.ann_ivf_topk(emb, k=5, corpus_count=n_corpus).select(
        F.lit("ivf").alias("branch"), "query_id", "rnk", "neighbor_id", "sim"
    )
    # 'ivfpq': in-session PQ — train codebooks on the shared bounded
    # sample, encode the corpus (never shuffles), ADC-score a bounded
    # query batch, exact-rescore the candidates. Same geometry
    # literals as the oracle's _PQ_* constants.
    books = pq.train_pq_codebooks(
        emb, n_subspaces=_PQ_M, n_codes=_PQ_CODES, n_iters=_PQ_ITERS,
        n=n_corpus,
    )
    codes = pq.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 20)
    ivfpq = pq.pq_topk(
        codes, queries, books, k=5, rescore=emb, oversample=_PQ_OVERSAMPLE
    ).select(
        F.lit("ivfpq").alias("branch"), "query_id", "rnk", "neighbor_id", "sim"
    )
    return ivf.unionByName(ivfpq).orderBy("branch", "query_id", "rnk")
