"""Catalog: text analysis extensions (lang-ID, quality, token counts,
fingerprints) over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions import text as T
from hadoop_2_10_0_src_mapreduce_spark.pipeline import chunk_sql, split_sql
from hadoop_2_10_0_src_mapreduce_spark.plans.registry import register
from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
    load_table,
    parallelize_scan,
)

# --- language ID ------------------------------------------------------

_LANG_ID_ORACLE = f"""
SELECT lang AS labeled_lang, {T.lang_id_sql('text')} AS pred_lang, COUNT(*) AS cnt
FROM documents
GROUP BY lang, pred_lang
ORDER BY labeled_lang, pred_lang
"""


@register("text_lang_id", _LANG_ID_ORACLE, tags=("text",),
          doc="Language-ID heuristic (stopword profiles + CJK chars): predicted vs labeled confusion counts.")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(
        # width measured: defaultParallelism//4 — see corpus_with_dups
        load_table(spark, sf_dir, "documents"), "doc_id",
        target=spark.sparkContext.defaultParallelism // 4,
        memo_key=f"{sf_dir}:documents",  # probe once per session (readers)
    )
    # tokenize once, below the scoring projection (shared regex pass);
    # hoist the one-pass stopword-hit accumulator the same way — the
    # argmax array references every language's score, and Catalyst
    # inlines dict-built expressions per reference (the before-plan ran
    # the aggregate pass 8× per row; a named non-cheap column stays a
    # single evaluation — plans/r12/text_lang_id_{before,after}.txt)
    toked = docs.select("lang", "text", T.tokens("text").alias("_toks"))
    acced = toked.select(
        "lang", "text", "_toks", T.lang_acc(F.col("_toks")).alias("_lacc")
    )
    return (
        acced.select(
            F.col("lang").alias("labeled_lang"),
            T.lang_id("text", F.col("_toks"), acc=F.col("_lacc"))
            .alias("pred_lang"),
        )
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("labeled_lang", "pred_lang")
    )


# --- quality features + composite score -------------------------------

_Q_TOKS = f"regexp_extract_all(lower(text), '{T.TOKEN_PATTERN}')"
_Q_NTOK = f"greatest(len({_Q_TOKS}), 1)"
_Q_NCH = "greatest(length(text), 1)"
_Q_STOP = "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS["en"]) + "]"
_Q_FEATURES = {
    "n_chars": "length(text)",
    "n_tokens": f"len({_Q_TOKS})",
    "mean_token_len": f"round(list_sum(list_transform({_Q_TOKS}, t -> length(t))) / {_Q_NTOK}, 6)",
    "punct_ratio": rf"round(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) / {_Q_NCH}, 6)",
    "stopword_ratio": f"round(len(list_filter({_Q_TOKS}, t -> list_contains({_Q_STOP}, t))) / {_Q_NTOK}, 6)",
    "digit_ratio": f"round(length(regexp_replace(text, '[^0-9]', '', 'g')) / {_Q_NCH}, 6)",
}
# Token counting (whitespace-ish + BPE-ish) rides in the same per-doc
# row as the quality features — one checked-window slot for the §M7
# text components, one scan of documents. Round 4 adds the remaining
# per-doc pipeline signals to the same row, still one scan:
# - Gopher-style repetition (dup 2-/3-gram occurrence fractions over
#   the shared token array — pure array exprs, no shuffle);
# - PII audit + redaction over a deterministically PLANTED variant
#   (docs have no natural PII): doc_id % 5 == 0 gets an email + IPv4 +
#   phone suffix built from doc_id in BOTH engines; counts come from
#   the same patterns and redacted_fp = md5(redacted text) proves the
#   redaction byte-identical through the value hash.

def _pii_suffix_spark() -> F.Column:
    # built lazily: Column construction needs an active SparkContext,
    # and catalog modules must stay importable before a session exists
    return F.concat(
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.1."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call 555-123-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )


_PII_SUFFIX_SQL = (
    "' contact u' || CAST(doc_id AS VARCHAR) || '@example.com from 10.1.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-123-'"
    " || CAST(1000 + doc_id % 9000 AS VARCHAR)"
)
_PII_TEXT_SQL = (
    f"CASE WHEN doc_id % 5 = 0 THEN text || {_PII_SUFFIX_SQL} ELSE text END"
)
_PII_COUNT_SQL = T.pii_counts_sql(f"({_PII_TEXT_SQL})")

# model-based (fasttext-shape) quality filter: linear weights over the
# already-hash-checked features, rational sigmoid — weights chosen with
# exact binary representations so both engines see identical doubles
_MODEL_W = {
    "stopword_ratio": 2.0,
    "punct_ratio": -2.0,
    "digit_ratio": -1.0,
    "mean_token_len": 0.25,
}
_MODEL_BIAS = -0.5

# Hoisted-tokenization variants of the features: the oracle's CTE
# computes the token array (and each gram list) ONCE per row and every
# feature references the column — expression-for-expression identical
# to the inline forms (same functions, same rounding), so the value
# hash carries; measured at sf1 this cut the oracle wall 250 -> 71 s
# (~3.5x — the inline form re-ran the token regex per feature column:
# the r8 gate's second-longest pole).
_Q_NTOK_H = "greatest(len(toks), 1)"
# text-based features (n_chars/punct/digit) inherit from _Q_FEATURES —
# single source of truth; only the token-array features re-key to the
# hoisted column
_Q_FEATURES_H = {
    **_Q_FEATURES,
    "n_tokens": "len(toks)",
    "mean_token_len": f"round(list_sum(list_transform(toks, t -> length(t))) / {_Q_NTOK_H}, 6)",
    "stopword_ratio": f"round(len(list_filter(toks, t -> list_contains({_Q_STOP}, t))) / {_Q_NTOK_H}, 6)",
}
_Q_SCORE_SQL_H = (
    "round("
    f"0.3 * least({_Q_FEATURES_H['n_tokens']} / 100.0, 1.0)"
    f" + 0.2 * (CASE WHEN {_Q_FEATURES_H['mean_token_len']} BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)"
    f" + 0.2 * least({_Q_FEATURES_H['stopword_ratio']} * 5, 1.0)"
    f" + 0.3 * greatest(0.0, 1.0 - {_Q_FEATURES_H['punct_ratio']} * 4 - {_Q_FEATURES_H['digit_ratio']} * 2)"
    ", 6)"
)

_QUALITY_ORACLE = f"""
WITH dt AS MATERIALIZED (
    -- tokenize ONCE: g2/g3 referencing the toks lateral alias in the
    -- same SELECT re-inlined the token regexp (3× the scan's scalar
    -- cost — the r9 sf1 profile put 64 of the oracle's 76 s here);
    -- materializing toks first makes the gram build a list slice
    SELECT doc_id, text, {_Q_TOKS} AS toks FROM documents
),
d AS MATERIALIZED (
    SELECT doc_id, text, toks,
           {T.dup_ngram_grams_sql('toks', 2)} AS g2,
           {T.dup_ngram_grams_sql('toks', 3)} AS g3
    FROM dt
)
SELECT doc_id,
       {_Q_FEATURES_H['n_chars']} AS n_chars,
       {_Q_FEATURES_H['n_tokens']} AS n_tokens,
       {T.bpe_ish_token_count_sql('text')} AS n_bpe_tokens,
       {_Q_FEATURES_H['mean_token_len']} AS mean_token_len,
       {_Q_FEATURES_H['punct_ratio']} AS punct_ratio,
       {_Q_FEATURES_H['stopword_ratio']} AS stopword_ratio,
       {_Q_FEATURES_H['digit_ratio']} AS digit_ratio,
       {_Q_SCORE_SQL_H} AS quality,
       {T.linear_score_sql(_Q_FEATURES_H, _MODEL_W, bias=_MODEL_BIAS)} AS model_quality,
       {T.dup_ngram_fraction_from_grams_sql('g2')} AS dup_2gram_frac,
       {T.dup_ngram_fraction_from_grams_sql('g3')} AS dup_3gram_frac,
       {_PII_COUNT_SQL['email']} AS pii_email,
       {_PII_COUNT_SQL['ipv4']} AS pii_ipv4,
       {_PII_COUNT_SQL['phone']} AS pii_phone,
       md5({T.redact_pii_sql(f'({_PII_TEXT_SQL})')}) AS redacted_fp
FROM d
ORDER BY doc_id
"""


@register("text_token_quality", _QUALITY_ORACLE, tags=("text",),
          doc="Per-document token counts (whitespace-ish + BPE-ish), quality features (length/punct/stopword/digit ratios) + composite score + MODEL-based linear quality score (fasttext-shape weights, rational sigmoid), Gopher-style dup-n-gram repetition fractions, and PII audit + byte-checked redaction over planted PII — all in one scan.")
def text_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(
        # width measured: defaultParallelism//4 — see corpus_with_dups
        load_table(spark, sf_dir, "documents"), "doc_id",
        target=spark.sparkContext.defaultParallelism // 4,
        memo_key=f"{sf_dir}:documents",  # probe once per session (readers)
    )
    pii_text = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), _pii_suffix_spark())
    ).otherwise(F.col("text"))
    # Hoisting ladder (the Spark-side twin of the oracle's r8 hoisted
    # CTEs — guide §1.2 "per-task work"): Catalyst inlines dict-built
    # expressions into EVERY reference, so the before-plan ran the
    # (len_sum, stop) aggregate pass ~12× per row, each regexp_replace
    # ratio ~6×, and rebuilt the n-gram hash chains ~12×
    # (plans/r12/text_token_quality_before.txt). Multi-referenced
    # non-cheap NAMED columns are not collapsed, so each level below
    # evaluates once per row and the scores above reference columns.
    # Same expression trees, same rounding — bit-identical values.
    toked = docs.select(
        "doc_id", "text", T.tokens("text").alias("_toks"),
        pii_text.alias("_pii_text"),
    )
    tc = F.col("_toks")
    # level 2: one-pass accumulator + 2-gram chain (3-gram extends it)
    chains = T.dup_ngram_chains(tc, (2, 3))
    l2 = toked.select(
        "doc_id", "text", "_toks", "_pii_text",
        T.quality_acc(tc).alias("_qacc"),
        chains[2].alias("_g2"),
    )
    # level 3: 3-gram chain from the PROJECTED 2-gram chain
    n3_windows = F.greatest(F.size(tc) - 2, F.lit(0))
    g3 = F.zip_with(
        F.slice(F.col("_g2"), 1, n3_windows),
        F.slice(tc, 3, n3_windows),
        lambda acc, t: F.xxhash64(acc, t),
    )
    l3 = l2.select(
        "doc_id", "text", "_toks", "_pii_text", "_qacc", "_g2",
        g3.alias("_g3"),
    )
    # level 4: the six feature ratios, each computed once
    feats = T.quality_features("text", tc, acc=F.col("_qacc"))
    l4 = l3.select(
        "doc_id", "text", "_toks", "_pii_text", "_g2", "_g3",
        *[feats[name].alias(name) for name in
          ("n_chars", "n_tokens", "mean_token_len", "punct_ratio",
           "stopword_ratio", "digit_ratio")],
    )
    # level 5: scores over the feature COLUMNS + single-use columns
    featsc = {name: F.col(name) for name in
              ("n_chars", "n_tokens", "mean_token_len", "punct_ratio",
               "stopword_ratio", "digit_ratio")}
    pii = T.pii_counts("_pii_text")
    return l4.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        T.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        "mean_token_len", "punct_ratio", "stopword_ratio", "digit_ratio",
        T.quality_score("text", tc, features=featsc).alias("quality"),
        T.linear_score(featsc, _MODEL_W, bias=_MODEL_BIAS).alias("model_quality"),
        T.dup_fraction_from_chain(F.col("_g2")).alias("dup_2gram_frac"),
        T.dup_fraction_from_chain(F.col("_g3")).alias("dup_3gram_frac"),
        pii["email"].alias("pii_email"),
        pii["ipv4"].alias("pii_ipv4"),
        pii["phone"].alias("pii_phone"),
        F.md5(T.redact_pii("_pii_text")).alias("redacted_fp"),
    ).orderBy("doc_id")


# --- fingerprint rollup + decontamination + split (three branches) -----
# One checked slot for three corpus-hygiene passes (branch pattern, cf.
# scan_fixed_multi), harmonized under (branch, grp, n_docs,
# n_distinct_fp, total_chars):
# - 'rollup': the per-source fingerprint rollup (unchanged semantics).
# - 'decontam': train–eval contamination audit. Eval set = doc_id%50==0
#   (benchmark stand-in); the remaining docs are the training corpus,
#   with doc_id%31==0 rows CONTAMINATED deterministically (the first 5
#   tokens of eval doc 0 appended — an exact benchmark quote). A train
#   doc is flagged iff it shares ≥1 5-token shingle with any eval doc
#   (the GPT-3 13-gram recipe, n dialed to these short fixtures). Per
#   source: n_docs = flagged, n_distinct_fp = clean, total_chars = sum
#   of clean docs' n_chars. Planted quotes MUST flag; natural shingle
#   collisions may add more — both engines replay them identically.
# - 'split': deterministic train/val/test assignment (split_assign:
#   u = uint32(md5(id)[:8])/2³² into cumulative-weight intervals —
#   engine-replayable, stable under corpus growth). Per split:
#   n_docs, n_distinct_fp = distinct sources seen, total_chars.
# - 'gsplit': the LEAKAGE-SAFE variant — same intervals, hashed on
#   source instead of doc_id, so whole sources are held out and no
#   near-dup pair can straddle train/test. Per split: n_docs,
#   n_distinct_fp = distinct sources (sums to 20 across splits — the
#   disjointness is visible in the checked rows), total_chars.
# - 'chunk': token-budget chunking (max_tokens=32, overlap=8 — the
#   long-document half of sequence preparation; see
#   pipeline.chunk_documents). Per source: n_docs = chunks emitted,
#   n_distinct_fp = DISTINCT md5(chunk_text) — every chunk's exact
#   token content is hash-checked, not just counted — total_chars =
#   sum of chunk text lengths.

_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}

_DECON_N = 5

_Q5 = (
    f"(SELECT array_to_string(({_Q_TOKS})[1:{_DECON_N}], ' ') FROM documents WHERE doc_id = 0)"
)

_FINGERPRINT_ORACLE = f"""
WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
tr AS (
    SELECT doc_id,
           CASE WHEN doc_id % 31 = 0 THEN text || ' ' || {_Q5}
                ELSE text END AS text,
           source, n_chars
    FROM documents WHERE doc_id % 50 <> 0
),
evsh AS (
    SELECT DISTINCT unnest({T.shingles_sql('text', _DECON_N)}) AS s FROM ev
),
trsh AS (
    SELECT doc_id, unnest(list_distinct({T.shingles_sql('text', _DECON_N)})) AS s
    FROM tr
),
contam AS (
    SELECT DISTINCT doc_id FROM trsh WHERE s IN (SELECT s FROM evsh)
)
SELECT 'rollup' AS branch, source AS grp,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT {T.fingerprint_sql('text')}) AS n_distinct_fp,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY grp
UNION ALL
SELECT 'decontam' AS branch, t.source AS grp,
       COUNT(*) FILTER (WHERE c.doc_id IS NOT NULL) AS n_docs,
       COUNT(*) FILTER (WHERE c.doc_id IS NULL) AS n_distinct_fp,
       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN t.n_chars ELSE 0 END) AS BIGINT)
           AS total_chars
FROM tr t LEFT JOIN contam c USING (doc_id)
GROUP BY grp
UNION ALL
SELECT 'split' AS branch, {split_sql('doc_id', _SPLIT_WEIGHTS)} AS grp,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_distinct_fp,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY grp
UNION ALL
SELECT 'gsplit' AS branch, {split_sql('source', _SPLIT_WEIGHTS)} AS grp,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_distinct_fp,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY grp
UNION ALL
SELECT 'chunk' AS branch, d.source AS grp,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(c.chunk_text)) AS n_distinct_fp,
       CAST(SUM(length(c.chunk_text)) AS BIGINT) AS total_chars
FROM ({chunk_sql('documents', 'text', 'doc_id', max_tokens=32, overlap=8)}) c
JOIN documents d ON c.id = d.doc_id
GROUP BY grp
ORDER BY branch, grp
"""


@register("text_fingerprint_rollup", _FINGERPRINT_ORACLE, tags=("text",),
          doc="Five corpus-hygiene branches in one slot: per-source fingerprint rollup (normalized md5), train-eval DECONTAMINATION audit (5-token shingle overlap vs a planted-quote eval set; GPT-3 n-gram recipe), deterministic md5-bucket train/val/test SPLIT counts, the LEAKAGE-SAFE group split holding out whole sources (gsplit), and token-budget document CHUNKING with every chunk's content md5-checked — all hash-checked.")
def text_fingerprint_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_2_10_0_src_mapreduce_spark.operators import dedup
    from hadoop_2_10_0_src_mapreduce_spark.pipeline import (
        chunk_documents,
        split_corpus,
    )

    docs = parallelize_scan(
        # width measured: defaultParallelism//4 — see corpus_with_dups
        load_table(spark, sf_dir, "documents"), "doc_id",
        target=spark.sparkContext.defaultParallelism // 4,
        memo_key=f"{sf_dir}:documents",  # probe once per session (readers)
    )

    rollup = (
        docs.select("source", "n_chars", T.fingerprint("text").alias("fp"))
        .groupBy(F.col("source").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(F.lit("rollup").alias("branch"), "grp", "n_docs",
                "n_distinct_fp", "total_chars")
    )

    ev = docs.where(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    quote = ev.where(F.col("doc_id") == 0).select(
        F.array_join(F.slice(T.tokens("text"), 1, _DECON_N), " ").alias("_q")
    )
    tr = (
        docs.where(F.col("doc_id") % 50 != 0)
        .crossJoin(F.broadcast(quote))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 31 == 0,
                F.concat(F.col("text"), F.lit(" "), F.col("_q")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "source",
            "n_chars",
        )
    )
    bad = dedup.contaminated_ids(tr, ev, "text", "doc_id", n=_DECON_N).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("_c")
    )
    # The aggregate side never reads the CONSTRUCTED text — only
    # (doc_id, source, n_chars), which the quote-append can't change.
    # Joining the narrow projection of the raw table instead of ``tr``
    # stops the quote-crossJoin+concat subtree from evaluating twice
    # (once inside ``bad``'s shingle index, once on the join's left
    # side) and lets the scan prune the text column entirely on this
    # side (guide §2.3 "project before the exchange" / §6 pruning).
    # Same doc_ids, same source/n_chars → identical rows.
    tr_meta = docs.where(F.col("doc_id") % 50 != 0).select(
        "doc_id", "source", "n_chars"
    )
    decontam = (
        tr_meta.join(bad, "doc_id", "left")
        .groupBy(F.col("source").alias("grp"))
        .agg(
            F.sum(F.when(F.col("_c").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_docs"),
            F.sum(F.when(F.col("_c").isNull(), 1).otherwise(0))
            .cast("long").alias("n_distinct_fp"),
            F.sum(F.when(F.col("_c").isNull(), F.col("n_chars")).otherwise(0))
            .cast("long").alias("total_chars"),
        )
        .select(F.lit("decontam").alias("branch"), "grp", "n_docs",
                "n_distinct_fp", "total_chars")
    )

    split = (
        split_corpus(docs, _SPLIT_WEIGHTS, id_col="doc_id")
        .groupBy(F.col("split").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_distinct_fp"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(F.lit("split").alias("branch"), "grp", "n_docs",
                "n_distinct_fp", "total_chars")
    )

    gsplit = (
        split_corpus(docs, _SPLIT_WEIGHTS, id_col="doc_id", key_col="source")
        .groupBy(F.col("split").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_distinct_fp"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(F.lit("gsplit").alias("branch"), "grp", "n_docs",
                "n_distinct_fp", "total_chars")
    )

    chunk = (
        chunk_documents(docs, max_tokens=32, overlap=8, keep_cols=("source",))
        .groupBy(F.col("source").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("chunk_text")).alias("n_distinct_fp"),
            F.sum(F.length("chunk_text")).alias("total_chars"),
        )
        .select(F.lit("chunk").alias("branch"), "grp", "n_docs",
                "n_distinct_fp", "total_chars")
    )

    return (
        rollup.unionByName(decontam)
        .unionByName(split)
        .unionByName(gsplit)
        .unionByName(chunk)
        .orderBy("branch", "grp")
    )
