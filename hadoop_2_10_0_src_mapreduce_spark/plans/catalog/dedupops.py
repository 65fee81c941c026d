"""Catalog: deduplication extensions.

All 500 fixture document texts are distinct, so dedup queries run over
a deterministically CONSTRUCTED corpus: the documents plus planted
exact copies (doc_id+PLANT_OFFSET for doc_id%10==0) and
near-duplicates with the last 5 tokens dropped (doc_id+2·PLANT_OFFSET
for doc_id%7==0, only docs with >10 tokens). Both engines build the
same corpus from the same expressions, so oracles stay exact.

PLANT_OFFSET is 10M, far above any corpus these gates run at: the
round-5 offsets (10000/20000) COLLIDED with real doc_ids once the
corpus passed 10k docs — at sf1 the Spark side kept one xcut/lines row
per corpus ROW while the oracle's GROUP BY doc_id collapsed the
colliding ids, the first divergence the sf1 full-gate run surfaced
(SURVEY §8 r6). Offsets that partition the id space are part of the
fixture contract, so they must dominate the id range at every sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions import text as T
from hadoop_2_10_0_src_mapreduce_spark.functions.text import fingerprint_sql, shingles_sql
from hadoop_2_10_0_src_mapreduce_spark.operators import dedup
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
    load_table,
    parallelize_scan,
)


PLANT_OFFSET = 10_000_000


def corpus_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies ∪ truncated near-dups (see module doc).

    The UNION is parallelize_scan'd (no-op once the input splits to ≥
    the target): every consumer of this corpus tokenizes/hashes each
    row (the dedup family's dominant scalar cost), and a single-row-
    group fixture file otherwise serializes all of it onto one core.
    Placement and width are measured, not guessed (sf0.1, 32 cores,
    steady-state min-of-passes): repartitioning the union to
    defaultParallelism//4 = 8 beat plain (dedup_exact 1.65 s vs 2.50,
    simhash 1.3 vs 2.3, ngram 3.0 vs 4.3), while 32-wide overshot
    (2.96/2.2/4.3 — dedup_exact fans this frame into ~7 branches of
    small stages, and every extra cached partition multiplies into a
    task in each) and repartitioning the base BEFORE the union was
    worst (3 legs × N cached partitions)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    toks = T.tokens("text")
    near = (
        d.where((F.col("doc_id") % 7 == 0) & (F.size(toks) > 10))
        .select(
            (F.col("doc_id") + 2 * PLANT_OFFSET).alias("doc_id"),
            F.array_join(F.slice(toks, 1, F.size(toks) - 5), " ").alias("text"),
        )
    )
    union = d.unionByName(exact).unionByName(near)
    return parallelize_scan(
        union, "doc_id", target=spark.sparkContext.defaultParallelism // 4,
        # the split-count probe is a full planning pass of the union —
        # memoized per session+fixture so only the first corpus build
        # pays it (readers.parallelize_scan docstring)
        memo_key=f"{sf_dir}:corpus_with_dups",
    )


_TOKS = f"regexp_extract_all(lower(text), '{T.TOKEN_PATTERN}')"

# the near-dup leg tokenizes ONCE in a subquery (the inline form ran
# the token regex three times per row — part of the r8 oracle-wall cut)
_CORPUS_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {2 * PLANT_OFFSET} AS doc_id,
           array_to_string(toks[1:len(toks)-5], ' ') AS text
    FROM (SELECT doc_id, {_TOKS} AS toks FROM documents
          WHERE doc_id % 7 = 0)
    WHERE len(toks) > 10
"""

# --- exact dedup + winnowing (two hash-checked branches) ---------------
# 'exact' = whole-document fingerprint groups. 'winnow' = SHARED
# winnowing fingerprints (MOSS rolling-min selection over md5 shingle
# hashes): fps held by ≥2 docs — the content-defined-chunk dedup view,
# which also catches the planted truncated near-dups the exact branch
# can't see. Oracle-checkable because the md5 variant's position hash
# is the signed int64 of the first 16 hex digits of md5(shingle) —
# reassembled as (hi − [hi ≥ 2³¹]·2³²)·2³² + lo, verified bit-equal to
# Spark's shiftleft(hi,32)|lo — and window minima are integer min over
# the same positional lists.

_W = 4  # winnowing window (guarantee: shared runs of w+k−1 tokens collide)
_XGRAM_K = 3  # k-gram size of the positional (xgram/xspan) branches —
# must match shingles_sql's default k so the oracle's pos CTE lines up
_XCUT_MIN = 20  # xcut branch: only spans of ≥ this many tokens are cut

# 'lines' branch: every corpus doc gets a planted boilerplate line (in
# ALL docs — far over the min_docs=5 bar) and three docs get a RARE
# shared line (3 < 5 — must survive); line-dedup must strip exactly
# the banner and preserve everything else byte-for-byte, which the
# oracle states as md5 of the expected cleaned text
_BANNER = "this website uses cookies accept to continue reading"
_RARE = "rare shared footnote only three documents carry this line"
_RARE_IDS = (1, 3, 7)

_HEX2INT_HI = " + ".join(
    f"(instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
    for j in range(8)
)
_HEX2INT_LO = " + ".join(
    f"(instr('0123456789abcdef', substring(h, {j + 9}, 1)) - 1) * {16 ** (7 - j)}"
    for j in range(8)
)

_EXACT_ORACLE = f"""
WITH corpus AS MATERIALIZED ({_CORPUS_SQL}),
exact AS (
    SELECT 'exact' AS branch, {fingerprint_sql('text')} AS fp,
           MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM corpus GROUP BY fp
),
tokraw AS MATERIALIZED (
    -- two-stage shingle build (the r9 oracle-wall finding): DuckDB
    -- inlines a subselect's column into the WHERE predicate, so the
    -- one-CTE form ran the whole tokenize+gram build TWICE per row
    -- (once in the filter, once in the projection); materializing the
    -- raw build first makes the filter a cheap len() over stored rows
    SELECT doc_id, {shingles_sql('text')} AS sgs FROM corpus
),
tok AS MATERIALIZED (
    SELECT doc_id, sgs FROM tokraw WHERE len(sgs) > 0
),
pos AS MATERIALIZED (
    SELECT doc_id, unnest(sgs) AS s, generate_subscripts(sgs, 1) AS i FROM tok
),
parsed AS (
    SELECT doc_id, i,
           (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
           * 4294967296 + lo AS v
    FROM (SELECT doc_id, i, {_HEX2INT_HI} AS hi, {_HEX2INT_LO} AS lo
          FROM (SELECT doc_id, i, md5(s) AS h FROM pos))
),
sigs AS MATERIALIZED (
    SELECT doc_id, list(v ORDER BY i) AS sg FROM parsed GROUP BY doc_id
),
wins AS (
    SELECT doc_id,
           CASE WHEN len(sg) >= {_W}
                THEN list_transform(range(1, len(sg) - {_W} + 2),
                                    i -> list_min(sg[i:i+{_W - 1}]))
                ELSE [list_min(sg)] END AS mins
    FROM sigs
),
doc_fps AS (
    SELECT DISTINCT doc_id, unnest(mins) AS fp FROM wins
),
winnow AS (
    SELECT 'winnow' AS branch, CAST(fp AS VARCHAR) AS fp,
           MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM doc_fps GROUP BY fp HAVING COUNT(*) >= 2
),
incr AS (
    -- incremental invariant: folding the planted batch into the
    -- originals' index must equal the one-shot recompute, so the
    -- oracle IS the exact branch relabeled; the Spark side actually
    -- runs the index-merge path and must land on the same rows
    SELECT 'incr' AS branch, fp, keeper, n_copies FROM exact
),
flagged AS MATERIALIZED (
    -- cross-document repeated n-grams (exact-substring dedup at
    -- k-gram granularity): every position whose k-gram occurs in ≥2
    -- distinct docs; the oracle flags STRING shingles where Spark
    -- flags xxhash64 chains (they agree modulo ~2^-64 collisions, the
    -- Jaccard convention)
    SELECT doc_id, i FROM pos
    WHERE s IN (SELECT s FROM pos
                GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2)
),
xgram AS (
    -- per-doc view: first flagged position in keeper, flagged-position
    -- count in n_copies
    SELECT 'xgram' AS branch, CAST(doc_id AS VARCHAR) AS fp,
           MIN(i) AS keeper, COUNT(*) AS n_copies
    FROM flagged
    GROUP BY doc_id
),
islands AS (
    -- maximal-span view: adjacent flagged positions merge into runs
    -- (pos − row_number is constant within a run)
    SELECT doc_id, i,
           i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
    FROM flagged
),
spans AS MATERIALIZED (
    SELECT doc_id, MIN(i) AS s,
           MAX(i) - MIN(i) + {_XGRAM_K} AS len
    FROM islands GROUP BY doc_id, grp
),
xspan AS (
    -- one row per maximal repeated span: start position in keeper,
    -- token length (= positions + k − 1) in n_copies
    SELECT 'xspan' AS branch, CAST(doc_id AS VARCHAR) AS fp,
           s AS keeper, len AS n_copies
    FROM spans
),
tokpos AS (
    SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
    FROM (SELECT doc_id, {_TOKS} AS toks FROM corpus)
),
cutkept AS (
    -- the CUT replayed: keep every token position not inside a
    -- qualifying (≥ {_XCUT_MIN}-token) span of its own document
    SELECT t.doc_id, t.tok, t.p FROM tokpos t
    WHERE NOT EXISTS (
        SELECT 1 FROM spans q
        WHERE q.doc_id = t.doc_id AND q.len >= {_XCUT_MIN}
          AND t.p >= q.s AND t.p < q.s + q.len
    )
),
xcut AS (
    -- md5 of the cleaned text in fp = a byte-exact text comparison;
    -- kept-token count in n_copies; one row per corpus document
    SELECT 'xcut' AS branch,
           md5(COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '')) AS fp,
           c.doc_id AS keeper, COUNT(k.tok) AS n_copies
    FROM corpus c LEFT JOIN cutkept k ON c.doc_id = k.doc_id
    GROUP BY c.doc_id
),
lines AS (
    -- line-boilerplate branch: the planted everywhere-banner must be
    -- stripped, the 3-doc rare line kept, all other bytes preserved —
    -- stated as md5 of the expected cleaned text + kept-line count
    SELECT 'lines' AS branch,
           md5(text || CASE WHEN doc_id IN {_RARE_IDS}
                            THEN chr(10) || '{_RARE}' ELSE '' END) AS fp,
           doc_id AS keeper,
           CAST(CASE WHEN doc_id IN {_RARE_IDS} THEN 2 ELSE 1 END
                AS BIGINT) AS n_copies
    FROM corpus
)
SELECT * FROM exact
UNION ALL
SELECT * FROM winnow
UNION ALL
SELECT * FROM incr
UNION ALL
SELECT * FROM xgram
UNION ALL
SELECT * FROM xspan
UNION ALL
SELECT * FROM xcut
UNION ALL
SELECT * FROM lines
ORDER BY branch, keeper, fp
"""


@register("dedup_exact", _EXACT_ORACLE, tags=("dedup",),
          doc="Exact dedup (normalized-text md5 groups) + winnowing branch (shared MOSS rolling-min fingerprints; catches the truncated near-dups exact dedup can't) + incremental branch (fold the planted batch into the originals' index; must equal the one-shot recompute) + cross-document repeated-n-gram branches: per-doc stats (xgram), maximal spans via islands-and-gaps (xspan), and the applied CUT with the cleaned text byte-checked by md5 (xcut) — all six hash-checked.")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three branches scan the corpus (fingerprints ×2, shingles ×1) —
    # persist the small constructed frame once
    corpus = corpus_with_dups(spark, sf_dir).persist()
    exact = dedup.exact_dedup(corpus, "text", "doc_id").select(
        F.lit("exact").alias("branch"), "fp", "keeper", "n_copies"
    )
    winnow = (
        dedup.winnowing_fingerprints(
            corpus, "text", "doc_id", k=3, w=_W, shingle_hash="md5"
        )
        .groupBy("fp")
        .agg(F.min("id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") >= 2)
        .select(
            F.lit("winnow").alias("branch"),
            F.col("fp").cast("string").alias("fp"),
            "keeper",
            "n_copies",
        )
    )
    # continuous-ingestion shape: index the pre-existing documents,
    # fold the planted-duplicate batch in incrementally; the merged
    # index must equal the exact branch row-for-row (the invariant the
    # oracle encodes by relabeling its exact CTE)
    incr = dedup.incremental_exact_dedup(
        corpus.where(F.col("doc_id") >= PLANT_OFFSET),
        "text",
        "doc_id",
        dedup.exact_dedup(
            corpus.where(F.col("doc_id") < PLANT_OFFSET), "text", "doc_id"
        ),
    ).select(F.lit("incr").alias("branch"), "fp", "keeper", "n_copies")
    # cross-document repeated-n-gram views over ONE shared flagged-
    # position index: 'xgram' = per-doc stats (doc id in fp, first
    # flagged position in keeper, flagged-position count in n_copies);
    # 'xspan' = maximal repeated spans (doc id in fp, span start in
    # keeper, token length in n_copies) — the actionable cut-this-span
    # output of the exact-substring recipe
    # persist: xgram's doc-stats agg, xspan's islands window, and
    # xcut's position filter all read the flagged positions — without
    # it the hot-hash agg + flag-back semi-join re-run per branch
    flagged = dedup.repeated_ngram_flagged_positions(
        corpus, "text", "doc_id", k=_XGRAM_K
    ).persist()
    xgram = dedup.repeated_ngram_doc_stats(
        corpus, "text", "doc_id", k=_XGRAM_K, flagged=flagged
    ).select(
        F.lit("xgram").alias("branch"),
        F.col("id").cast("string").alias("fp"),
        F.col("first_pos").alias("keeper"),
        F.col("n_repeated").alias("n_copies"),
    )
    xspan = dedup.repeated_ngram_spans(
        corpus, "text", "doc_id", k=_XGRAM_K, flagged=flagged
    ).select(
        F.lit("xspan").alias("branch"),
        F.col("id").cast("string").alias("fp"),
        F.col("span_start").alias("keeper"),
        F.col("span_len").alias("n_copies"),
    )
    # 'xcut' = the CUT applied: md5 of each doc's cleaned text (≥
    # _XCUT_MIN-token repeated spans removed) in fp — a byte-exact
    # comparison of the published text against the oracle's replay —
    # plus the kept-token count
    xcut = dedup.cut_repeated_spans(
        corpus, "text", "doc_id",
        k=_XGRAM_K, min_span_tokens=_XCUT_MIN, flagged=flagged,
    ).select(
        F.lit("xcut").alias("branch"),
        F.md5("text").alias("fp"),
        F.col("id").alias("keeper"),
        F.size(T.tokens("text")).cast("long").alias("n_copies"),
    )
    # 'lines' = line-granular boilerplate removal over a multiline
    # reconstruction of the corpus (banner planted in every doc, rare
    # line in three): the machinery must strip exactly the banner and
    # keep everything else byte-identical (md5 of the cleaned text)
    ml = corpus.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n" + _BANNER),
            F.when(
                F.col("doc_id").isin(*_RARE_IDS), F.lit("\n" + _RARE)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    lines = dedup.drop_boilerplate_lines(
        ml, "text", "doc_id", min_docs=5
    ).select(
        F.lit("lines").alias("branch"),
        F.md5("text").alias("fp"),
        F.col("id").alias("keeper"),
        F.size(F.split("text", "\n")).cast("long").alias("n_copies"),
    )
    return (
        exact.unionByName(winnow)
        .unionByName(incr)
        .unionByName(xgram)
        .unionByName(xspan)
        .unionByName(xcut)
        .unionByName(lines)
        .orderBy("branch", "keeper", "fp")
    )


# --- n-gram Jaccard (inverted-index candidates vs O(n²) oracle) -------
# Both engines apply the same stop-shingle document-frequency cap (the
# hot-key guard that keeps the inverted-index self-join sub-quadratic
# at corpus scale), so Jaccard-over-retained-shingles stays exact.

_DF_CAP = 100

_JACCARD_SQL_PAIRS = f"""
WITH corpus AS MATERIALIZED ({_CORPUS_SQL}),
shraw AS MATERIALIZED (
    -- two-stage shingle build: DuckDB inlines a subselect's column
    -- into the WHERE predicate (the one-CTE form ran the tokenize+
    -- gram build twice per row) and re-inlines non-materialized CTEs
    -- per reference — materialize the raw build, then filter stored
    -- rows (the r9 oracle-wall finding)
    SELECT doc_id, list_distinct({shingles_sql('text')}) AS sh
    FROM corpus
),
shingled AS MATERIALIZED (
    SELECT doc_id, sh FROM shraw WHERE len(sh) > 0
),
inv AS MATERIALIZED (SELECT doc_id, unnest(sh) AS h FROM shingled),
kept AS MATERIALIZED (
    SELECT doc_id, h FROM inv
    WHERE h IN (SELECT h FROM inv GROUP BY h HAVING COUNT(*) <= {_DF_CAP})
),
-- intersection-count form of the same exact Jaccard: a thresholded
-- pair must share >= 1 kept shingle, so generating candidates through
-- the shared-shingle equi join (bounded by the df-cap: <= cap rows per
-- shingle) and deriving |union| = |a| + |b| - |common| is EQUAL to the
-- all-pairs cross join for every pair the branches keep — the round-5
-- cross-join form was O(corpus^2) and infeasible at the sf1 gate
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id),
common AS (
    SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_common
    FROM kept x JOIN kept y ON x.h = y.h AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT id_a, id_b,
       round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
"""

_NGRAM_ORACLE = f"""
WITH pairs AS MATERIALIZED ({_JACCARD_SQL_PAIRS})
SELECT 'plain' AS branch, id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.6
UNION ALL
SELECT 'prefix' AS branch, id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.8
ORDER BY branch, id_a, id_b
"""


@register("dedup_ngram_jaccard", _NGRAM_ORACLE, tags=("dedup",),
          doc="n-gram Jaccard near-dup pairs via TWO hash-checked branches: the plain inverted-index join at J≥0.6 and the prefix-filtered (AllPairs/PPJoin-style) join at J≥0.8 — its winning regime; oracle derives the same exact Jaccard from shared-shingle intersection counts (equal to the all-pairs scan for thresholded pairs, and feasible at the sf1 gate) with the same df-cap at both thresholds.")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Branch pattern (cf. scan_fixed_multi): both similarity-join
    # strategies share one driver slot, each hash-checked. 'prefix'
    # runs at its measured crossover regime — high thresholds index
    # only ~|d|·(1−t) rare shingles per doc, so candidate volume
    # collapses; prefix filtering is lossless, so its output equals
    # the brute-force pairs at the same threshold.
    corpus = corpus_with_dups(spark, sf_dir)
    # ONE shingle index (the dominant scalar cost), built and persisted
    # once, feeds both strategies
    inv = dedup._df_capped(
        dedup._hashed_index(dedup._shingled(corpus, "text", "doc_id", 3)),
        _DF_CAP,
    ).persist()
    plain = dedup.ngram_pairs_from_index(inv, 0.6)
    prefix = dedup.prefix_pairs_from_index(inv, 0.8)
    return (
        plain.select(F.lit("plain").alias("branch"), "id_a", "id_b", "jaccard")
        .unionByName(
            prefix.select(F.lit("prefix").alias("branch"), "id_a", "id_b", "jaccard")
        )
        .orderBy("branch", "id_a", "id_b")
    )


# --- MinHash + LSH -----------------------------------------------------
# Oracle = the same exact-Jaccard pairs at τ=0.8: LSH (32 bands × 4
# rows) finds every J≥0.8 pair with P(miss) < 1e-10 on this corpus, and
# candidates are verified with exact Jaccard, so false positives are
# filtered — the outputs coincide. A recall unit test pins this.

# Second branch: duplicate CLUSTERS via connected components over the
# verified pairs — Spark runs iterative min-label propagation (unique
# fixpoint = min id of the component), the oracle recomputes the same
# components with a recursive reachability CTE. For 'clusters' rows
# id_b is the component representative and score is NULL.

_MINHASH_ORACLE = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
    -- MATERIALIZED: the shared-shingle Jaccard replay is the gate's
    -- dominant cost (the r8 sf1 long pole at 568 s) and this CTE
    -- feeds the adjacency twice AND the 'pairs' branch — inlining
    -- re-ran the whole inverted-index self-join per reference
    SELECT id_a, id_b, jaccard
    FROM ({_JACCARD_SQL_PAIRS}) WHERE jaccard >= 0.8
),
adj AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
walk(id, lab) AS (
    SELECT src, src FROM adj
    UNION
    SELECT a.src, w.lab FROM adj a JOIN walk w ON w.id = a.dst
),
clusters AS (
    SELECT id, MIN(lab) AS rep FROM walk GROUP BY id
)
SELECT 'pairs' AS branch, id_a, id_b, jaccard AS score
FROM pairs
UNION ALL
SELECT 'clusters' AS branch, id AS id_a, rep AS id_b,
       CAST(NULL AS DOUBLE) AS score
FROM clusters
ORDER BY branch, id_a, id_b
"""


@register("dedup_minhash_lsh", _MINHASH_ORACLE, tags=("dedup",),
          doc="MinHash(128)+LSH(32×4) near-dup pairs (exact-verified at J≥0.8) PLUS duplicate clusters: connected components over the pair graph via min-label propagation; oracle replays components with a recursive CTE.")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_dups(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        corpus, "text", "doc_id", k=3, num_hashes=128, bands=32, threshold=0.8,
        max_doc_freq=_DF_CAP,
        # this gate's 'pairs' branch is CONTRACTUALLY exact all-pairs
        # (the oracle replays them) over a fixture-bounded corpus —
        # suppress the unguarded-all-pairs lint here, not globally
        warn_unguarded=False,
    ).persist()  # feeds both branches AND the iterative propagation
    clusters = dedup.duplicate_components(pairs)
    return (
        pairs.select(
            F.lit("pairs").alias("branch"), "id_a", "id_b",
            F.col("jaccard").alias("score"),
        )
        .unionByName(
            clusters.select(
                F.lit("clusters").alias("branch"),
                F.col("id").alias("id_a"),
                F.col("rep").alias("id_b"),
                F.lit(None).cast("double").alias("score"),
            )
        )
        .orderBy("branch", "id_a", "id_b")
    )


# --- SimHash -----------------------------------------------------------
# Oracle-checkable because the catalog query hashes tokens with md5
# (engine-independent) instead of Spark's xxhash64: bit i of a token's
# 64-bit hash is (hexdigit[i//4] >> (i%4)) & 1 over the first 16 hex
# digits of md5(token) — the oracle recomputes the identical signatures
# in DuckDB SQL (instr-on-hex-digit = Spark's conv), then finds every
# hamming<=6 pair through the pigeonhole chunk joins (first-equal-chunk
# claiming; provably equal to the all-pairs scan). All arithmetic is
# integer, so the match is exact. The xxhash64 default stays the scale
# path.


_LINKED_MAX_BUCKET = 2  # engages on every ≥3 bucket — measured at
# sf0.01: 1362 oversized buckets (max 36 members), lpairs 189 ⊊
# pairs 240, so the branch exercises both the consecutive-edge leg
# and the verify-drop of linked false positives (non-vacuity pinned
# by test_simhash_lpairs_branch_nonvacuous)


def _simhash_oracle() -> str:
    digits = ",\n           ".join(
        f"instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1 AS d{j}"
        for j in range(16)
    )
    bit_sums = ",\n           ".join(
        f"SUM(((d{i // 4} >> {i % 4}) & 1) * 2 - 1) AS s{i}" for i in range(64)
    )
    sig_bits = ",\n           ".join(
        f"CASE WHEN s{i} > 0 THEN 1 ELSE 0 END AS t{i}" for i in range(64)
    )
    # the 64 bits packed into the same 7 pigeonhole chunks the engine
    # blocks on (10+9·6): any hamming<=6 pair agrees on >= 1 whole
    # chunk, so generating candidates through 7 chunk equi joins —
    # each pair CLAIMED at its FIRST equal chunk (inequality guards on
    # the earlier chunks), no distinct — is EQUAL to the all-pairs
    # cross join, which was O(corpus^2) and infeasible at the sf1 gate
    bounds = [(0, 10), (10, 19), (19, 28), (28, 37), (37, 46), (46, 55),
              (55, 64)]
    chunk_cols = ",\n           ".join(
        " + ".join(f"t{i} * {1 << (i - lo)}" for i in range(lo, hi))
        + f" AS c{j}"
        for j, (lo, hi) in enumerate(bounds)
    )
    hamming = " + ".join(f"bit_count(xor(a.c{j}, b.c{j}))" for j in range(7))
    claim_legs = "\n    UNION ALL\n".join(
        f"""    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           {hamming} AS hamming
    FROM chunks a JOIN chunks b
      ON a.c{j} = b.c{j} AND a.doc_id < b.doc_id"""
        + "".join(f" AND a.c{jj} != b.c{jj}" for jj in range(j))
        for j in range(7)
    )
    return f"""
WITH corpus AS MATERIALIZED ({_CORPUS_SQL}),
toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM corpus
),
hx AS (SELECT doc_id, md5(tok) AS h FROM toks),
dig AS (SELECT doc_id,
           {digits}
        FROM hx),
sums AS (SELECT doc_id,
           {bit_sums}
         FROM dig GROUP BY doc_id),
bits AS MATERIALIZED (SELECT doc_id,
           {sig_bits}
         FROM sums),
chunks AS MATERIALIZED (SELECT doc_id,
           {chunk_cols}
         FROM bits),
pairs AS (
{claim_legs}
),
{_linked_ctes()}
SELECT 'lpairs' AS branch, id_a, id_b, CAST(hamming AS INTEGER) AS hamming
FROM lpairs
UNION ALL
SELECT 'pairs' AS branch, id_a, id_b, CAST(hamming AS INTEGER) AS hamming
FROM pairs
WHERE hamming <= 6
ORDER BY branch, id_a, id_b
"""


def _linked_ctes() -> str:
    """CTE chain replaying the ENGINE's max_bucket linked-edge mode
    exactly (the r8 mega-bucket guard, _capped_bucket_pairs): the same
    28 chunk-pair tables simhash_pairs buckets on (8-bit chunks i<j →
    16-bit keys, posexplode order), per-bucket COUNT + LEAD windows,
    all-pairs for ≤max_bucket groups and id-sorted consecutive edges
    for oversized ones, DISTINCT, then the same hamming≤6 verify —
    so the 'lpairs' branch hash-checks the linked-edge candidate
    generation itself, not just its clustering contract."""
    # engine chunk i = bits [8i, 8i+8) of the signature:
    # shiftrightunsigned(sim, i*8) & 255
    echunks = ",\n           ".join(
        " + ".join(f"t{8 * i + b} * {1 << b}" for b in range(8)) + f" AS e{i}"
        for i in range(8)
    )
    legs = []
    tidx = 0
    for i in range(8):
        for j in range(i + 1, 8):
            legs.append(
                f"    SELECT doc_id, {tidx} AS tidx,"
                f" e{i} * 256 + e{j} AS bucket FROM ech"
            )
            tidx += 1
    tbl = "\n    UNION ALL\n".join(legs)
    lham = " + ".join(f"bit_count(xor(x.e{i}, y.e{i}))" for i in range(8))
    return f"""ech AS MATERIALIZED (SELECT doc_id,
           {echunks}
         FROM bits),
tbl AS (
{tbl}
),
sized AS MATERIALIZED (
    SELECT doc_id, tidx, bucket,
           COUNT(*) OVER (PARTITION BY tidx, bucket) AS bsz,
           LEAD(doc_id) OVER (
               PARTITION BY tidx, bucket ORDER BY doc_id) AS nid
    FROM tbl
),
lcand AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sized a JOIN sized b
      ON a.tidx = b.tidx AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE a.bsz <= {_LINKED_MAX_BUCKET}
    UNION
    SELECT doc_id AS id_a, nid AS id_b FROM sized
    WHERE bsz > {_LINKED_MAX_BUCKET} AND nid IS NOT NULL
),
lpairs AS (
    SELECT c.id_a, c.id_b, {lham} AS hamming
    FROM lcand c
    JOIN ech x ON x.doc_id = c.id_a
    JOIN ech y ON y.doc_id = c.id_b
    WHERE {lham} <= 6
)"""


@register("dedup_simhash", _simhash_oracle(), tags=("dedup",),
          doc="SimHash-64 near-dup pairs (hamming ≤ 6) via chunk-pair pigeonhole tables (28 tables, 16-bit keys); md5-derived bits so the oracle recomputes exact signatures; recall additionally pinned by unit test. Second hash-checked branch 'lpairs' (r8): the same query under max_bucket=2 linked-edge mode — oversized buckets emit id-sorted consecutive edges instead of all-pairs (the mega-cluster guard measured at the 500k decade corpus) — with the oracle replaying the 28-table bucket/window/lead structure exactly, so the capped candidate generation itself is value-checked, not just its clustering contract.")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_dups(spark, sf_dir)
    # one signature pass feeds both branches (the dominant cost)
    sigs = dedup.simhash_signatures(
        corpus, "text", "doc_id", token_hash="md5"
    ).persist()
    pairs = dedup.simhash_pairs(
        corpus, "text", "doc_id", max_hamming=6, token_hash="md5",
        sigs=sigs, warn_unguarded=False,  # all-pairs branch by contract
    )
    lpairs = dedup.simhash_pairs(
        corpus, "text", "doc_id", max_hamming=6, token_hash="md5",
        max_bucket=_LINKED_MAX_BUCKET, sigs=sigs,
    )
    return (
        pairs.select(F.lit("pairs").alias("branch"), "id_a", "id_b", "hamming")
        .unionByName(
            lpairs.select(
                F.lit("lpairs").alias("branch"), "id_a", "id_b", "hamming"
            )
        )
        .orderBy("branch", "id_a", "id_b")
    )
