"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

These extend the reference (its only text ops were tokenize/grep —
SURVEY.md §2.3); they're the per-document scoring pass every LLM data
pipeline runs before filtering. Everything is Column expressions —
JVM-side, codegen-compiled, no Python in the row path — so a 100 TB
corpus pays one vectorized scan.

Each function has a ``*_SQL`` twin generating the equivalent DuckDB
expression from the SAME constants, so catalog queries stay
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"

# Tiny per-language stopword profiles (public common-word lists). The
# heuristic: predicted language = argmax over stopword-hit fraction,
# with CJK-character fraction overriding for zh; ties break
# lexicographically. Deliberately simple — n-gram models beat it, but
# it is deterministic, vectorizable, and SQL-expressible.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
}
# \x{...} escapes parse identically in Java regex (Spark) and RE2
# (DuckDB); \uXXXX would silently degrade in RE2.
CJK_RANGE = "\\x{4e00}-\\x{9fff}"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    """Whitespace-ish token count (the 'wc -w' of the pipeline)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored proxy count: word pieces + standalone punctuation.
    Approximates tokenizer cost well enough for budgeting/filtering
    without shipping a vocab to every executor."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


def bpe_ish_token_count_sql(expr: str) -> str:
    return rf"len(regexp_extract_all({expr}, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))"


def stopword_hits(col: Column | str, lang: str) -> Column:
    toks = tokens(col)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def lang_acc(toks: Column) -> Column:
    """The ONE-pass per-language stopword-hit struct accumulator
    ``lang_scores`` folds over the token array. Exposed so a caller
    can HOIST it into its own projection column: Catalyst inlines a
    dict-built expression into every reference (the lang_id argmax
    array references each score, so the plan re-ran this aggregate
    pass 8× per row — measured in plans/r12/text_lang_id_before.txt),
    while a multi-referenced non-cheap *named column* stays a single
    evaluation. Pass the column back via ``lang_scores(acc=...)``."""
    langs = sorted(STOPWORDS)
    stops = {
        lang: F.array(*[F.lit(w) for w in STOPWORDS[lang]]) for lang in langs
    }
    zero = F.struct(*[F.lit(0).alias(lang) for lang in langs])
    return F.aggregate(
        toks,
        zero,
        lambda a, t: F.struct(
            *[
                (a[lang] + F.array_contains(stops[lang], t).cast("int")).alias(
                    lang
                )
                for lang in langs
            ]
        ),
    )


def lang_scores(
    col: Column | str, toks: Column | None = None, acc: Column | None = None
) -> dict[str, Column]:
    """Per-language stopword-hit fraction, plus CJK char fraction.

    All four languages' hit counts come from ONE ``aggregate`` pass
    with a struct accumulator — higher-order functions run interpreted
    per element, so one pass carrying four counters beats four
    ``filter`` passes ~2× (measured). Values are identical: the same
    integer counts divide by the same n. Pass a pre-projected ``toks``
    column to also share the tokenization regex with sibling
    expressions (another measured ~30%). Pass ``acc`` (a projected
    ``lang_acc`` column) to share the aggregate pass itself across
    every score reference — see lang_acc's plan note."""
    tcol = toks if toks is not None else tokens(col)
    n = F.greatest(F.size(tcol), F.lit(1))
    langs = sorted(STOPWORDS)
    if acc is None:
        acc = lang_acc(tcol)
    scores = {lang: F.round(acc[lang] / n, 6) for lang in langs}
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.greatest(F.length(c), F.lit(1))
    cjk = F.length(F.regexp_replace(c, f"[^{CJK_RANGE}]", ""))
    scores["zh"] = F.round(cjk / n_chars, 6)
    return scores


def lang_id(
    col: Column | str, toks: Column | None = None, acc: Column | None = None
) -> Column:
    """argmax over lang_scores; lexicographic tiebreak; 'und' when all
    scores are zero (undetermined)."""
    scores = lang_scores(col, toks, acc)
    # sort by (score desc, lang asc): negate the score and sort the
    # (neg, lang) structs ascending — struct compare is field-ordered
    ordered = F.sort_array(
        F.array(*[
            F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ])
    )
    first = F.get(ordered, 0)
    return F.when(first["neg"] == 0, F.lit("und")).otherwise(first["lang"])


def lang_id_sql(expr: str) -> str:
    """DuckDB twin of lang_id built from the same STOPWORDS constants."""
    toks = f"regexp_extract_all(lower({expr}), '{TOKEN_PATTERN}')"
    n = f"greatest(len({toks}), 1)"
    parts = []
    for lang in sorted(STOPWORDS):
        stop = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
        score = (
            f"round(len(list_filter({toks}, t -> list_contains({stop}, t))) / {n}, 6)"
        )
        parts.append(f"{{'neg': -{score}, 'lang': '{lang}'}}")
    cjk = (
        f"round(length(regexp_replace({expr}, '[^{CJK_RANGE}]', '', 'g'))"
        f" / greatest(length({expr}), 1), 6)"
    )
    parts.append(f"{{'neg': -{cjk}, 'lang': 'zh'}}")
    arr = "[" + ", ".join(parts) + "]"
    first = f"list_sort({arr})[1]"
    return f"CASE WHEN {first}.neg = 0 THEN 'und' ELSE {first}.lang END"


def quality_acc(toks: Column) -> Column:
    """The (len_sum, stop) struct accumulator ``quality_features``
    folds over the token array — exposed for the same hoisting reason
    as ``lang_acc``: the quality/model-score expressions reference
    mean_token_len and stopword_ratio several times each, and Catalyst
    inlines dict-built expressions into every reference (the
    text_token_quality before-plan re-ran this pass ~12× per row).
    Project it once, pass it back via ``quality_features(acc=...)``."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    zero = F.struct(F.lit(0).alias("len_sum"), F.lit(0).alias("stop"))
    return F.aggregate(
        toks,
        zero,
        lambda a, t: F.struct(
            (a["len_sum"] + F.length(t)).alias("len_sum"),
            (a["stop"] + F.array_contains(stop, t).cast("int")).alias("stop"),
        ),
    )


def quality_features(
    col: Column | str, toks: Column | None = None, acc: Column | None = None
) -> dict[str, Column]:
    """The classic cheap quality signals: length, token count, mean
    token length, punctuation ratio, stopword(en) ratio, uppercase
    ratio, digit ratio.

    Token-length sum and stopword hits come from ONE ``aggregate``
    pass (struct accumulator) for the same reason as ``lang_scores``:
    interpreted per-element passes are the cost center. Same integer
    counts, same values. Pass ``toks`` to share the tokenization, and
    ``acc`` (a projected ``quality_acc`` column) to share the
    aggregate pass across every feature reference."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.greatest(F.length(c), F.lit(1))
    tcol = toks if toks is not None else tokens(col)
    n_toks = F.greatest(F.size(tcol), F.lit(1))
    if acc is None:
        acc = quality_acc(tcol)
    return {
        "n_chars": F.length(c),
        "n_tokens": F.size(tcol),
        "mean_token_len": F.round(acc["len_sum"] / n_toks, 6),
        "punct_ratio": F.round(
            F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) / n_chars, 6
        ),
        "stopword_ratio": F.round(acc["stop"] / n_toks, 6),
        "digit_ratio": F.round(
            F.length(F.regexp_replace(c, r"[^0-9]", "")) / n_chars, 6
        ),
    }


def quality_score(
    col: Column | str,
    toks: Column | None = None,
    features: dict[str, Column] | None = None,
) -> Column:
    """Composite 0..1-ish score: long enough, word-like tokens, some
    stopwords (prose-like), not punct/digit soup. Weights are plain
    constants — tune per corpus. Pass ``features`` (a
    ``quality_features`` dict) when the caller already projects the
    features — the score then reuses those column trees instead of
    rebuilding the aggregate pass."""
    f = features if features is not None else quality_features(col, toks)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    wordlen_term = F.when(
        (f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    stop_term = F.least(f["stopword_ratio"] * 5, F.lit(1.0))
    noise_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 4 - f["digit_ratio"] * 2
    )
    return F.round(
        0.3 * length_term + 0.2 * wordlen_term + 0.2 * stop_term + 0.3 * noise_term, 6
    )


def linear_score(
    features: dict[str, Column], weights: dict[str, float], *, bias: float = 0.0
) -> Column:
    """MODEL-based quality scoring: a linear classifier (the shape of a
    fasttext / logistic-regression quality filter — weights trained
    offline, applied at corpus scale as a pure column expression) over
    any feature dict, squashed to (0, 1) by the RATIONAL sigmoid
    0.5 + 0.5·z/(1 + |z|). Rational on purpose: no exp/log, only IEEE
    add/mul/div/abs, so any engine evaluating the same tree reproduces
    the score bit-for-bit (the ``tfidf_top_terms`` rational-idf trick)
    — and it is monotone in z exactly like the logistic, so rankings
    and thresholds behave identically. Accumulation order is the
    ``weights`` dict order; ``linear_score_sql`` replays it."""
    z: Column = F.lit(float(bias))
    for name, w in weights.items():
        z = z + F.lit(float(w)) * features[name]
    return F.round(F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z)), 6)


def linear_score_sql(
    features: dict[str, str], weights: dict[str, float], *, bias: float = 0.0
) -> str:
    """DuckDB twin of ``linear_score`` — same terms, same left-to-right
    accumulation, same rational sigmoid. Use weights with exact binary
    representations (±0.25, ±0.5, ±1, ±2, …) so the decimal literals
    parse to the identical doubles."""
    z = " + ".join(
        [repr(float(bias))]
        + [f"({float(w)!r}) * ({features[n]})" for n, w in weights.items()]
    )
    return f"round(0.5 + 0.5 * ({z}) / (1.0 + abs({z})), 6)"


# PII scrubbing — the redaction pass every training-data pipeline runs
# before publishing a corpus. Patterns are deliberately conservative and
# written in the common subset of Java regex (Spark) and RE2 (DuckDB):
# \d, \b, bounded repetition, and character classes behave identically,
# so the SQL twins reproduce the redaction byte-for-byte. Applied in a
# FIXED order (emails, then IPv4, then phone-ish digit runs) — order
# matters when matches could overlap, so both engines apply the same.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()\- ]{6,}\d\b", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tokens. Pure Column expressions (three regex
    passes), one vectorized scan at any corpus size."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of redact_pii from the same PII_PATTERNS."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Match counts per PII category — the audit view (how much PII a
    source carries) that drives keep/drop/redact policy.
    ``regexp_count`` rather than size(regexp_extract_all): same
    integers without materializing the match arrays (measured ~15%
    cheaper; the oracle twin keeps len(regexp_extract_all), DuckDB has
    no count form — counts are engine-independent either way)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS
    }


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        name: f"len(regexp_extract_all({expr}, '{pat}'))"
        for name, pat, _ in PII_PATTERNS
    }


def dup_ngram_fractions(
    col: Column | str, ns: tuple[int, ...], toks: Column | None = None
) -> dict[int, Column]:
    """Fraction of n-gram OCCURRENCES that are repeats of an earlier
    occurrence, for each n in ``ns`` — the Gopher-style repetition
    signal (a document whose 3-grams are mostly repeats is boilerplate
    or looping text): 1 − distinct/total over the doc's n-gram
    multiset, 0 for docs with no n-grams. Pure Column expressions —
    n-grams are xxhash64 chains over shifted token-array slices (the
    _shingled technique), so no string materialization and no shuffle.
    The chains are built INCREMENTALLY (the n-chain extends the
    (n−1)-chain with one zip_with), so requesting {2,3} costs three
    interpreted array passes, not five — higher-order functions run
    per element, and sharing the prefix chain is the cheapest win."""
    tcol = toks if toks is not None else tokens(col)
    return {
        n: dup_fraction_from_chain(chain)
        for n, chain in dup_ngram_chains(tcol, ns).items()
    }


def dup_ngram_chains(
    toks: Column, ns: tuple[int, ...]
) -> dict[int, Column]:
    """The incremental n-gram hash chains ``dup_ngram_fractions``
    builds, exposed per n so a caller can HOIST each chain into its
    own projection column (the fraction expression references its
    chain four times, and the n-chain embeds the (n−1)-chain — the
    text_token_quality before-plan rebuilt the chains ~12× per row;
    see quality_acc's note on Catalyst inlining)."""
    out: dict[int, Column] = {}
    want = sorted(set(ns))
    chain = F.transform(toks, lambda t: F.xxhash64(t))  # n = 1 chain
    if 1 in want:
        out[1] = chain
    for n in range(2, want[-1] + 1):
        n_windows = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        chain = F.zip_with(
            F.slice(chain, 1, n_windows),
            F.slice(toks, n, n_windows),
            lambda acc, t: F.xxhash64(acc, t),
        )
        if n in want:
            out[n] = chain
    return out


def dup_fraction_from_chain(chain: Column) -> Column:
    """1 − distinct/total over an n-gram hash chain (0 when empty) —
    the per-n fraction of ``dup_ngram_fractions``, split out so the
    chain can be a projected column shared across references."""
    total = F.size(chain)
    return F.when(total > 0, F.round(
        (total - F.size(F.array_distinct(chain))) / total, 6
    )).otherwise(F.lit(0.0))


def dup_ngram_fraction(
    col: Column | str, n: int, toks: Column | None = None
) -> Column:
    """Single-n convenience wrapper over ``dup_ngram_fractions``."""
    return dup_ngram_fractions(col, (n,), toks)[n]


def dup_ngram_grams_sql(toks_expr: str, n: int) -> str:
    """The n-gram list over an already-tokenized array expression —
    split out so an oracle can hoist ONE tokenization (and one gram
    list per n) into a materialized CTE instead of re-running the
    token regex per feature column (the r8 sf1 oracle-wall cut)."""
    return (
        f"list_transform(range(1, greatest(len({toks_expr}) - {n - 1}, 0) + 1),"
        f" i -> array_to_string({toks_expr}[i:i+{n - 1}], ' '))"
    )


def dup_ngram_fraction_from_grams_sql(grams_expr: str) -> str:
    """The fraction over a (possibly hoisted) gram-list expression."""
    return (
        f"CASE WHEN len({grams_expr}) > 0 THEN "
        f"round((len({grams_expr}) - len(list_distinct({grams_expr})))"
        f" / CAST(len({grams_expr}) AS DOUBLE), 6) ELSE 0.0 END"
    )


def dup_ngram_fraction_sql(expr: str, n: int) -> str:
    """DuckDB twin of dup_ngram_fraction. The engines hash n-grams
    differently (xxhash64 chain vs the literal string), but distinct-
    vs-total COUNTS agree modulo a ~2^-64 collision — the same
    equivalence _shingled relies on."""
    toks = f"regexp_extract_all(lower({expr}), '{TOKEN_PATTERN}')"
    return dup_ngram_fraction_from_grams_sql(dup_ngram_grams_sql(toks, n))


def top_ngram_stats(
    docs, text_col: str, id_col: str, *, n: int = 2
):
    """(id, top_gram_count, total_grams, top_gram_fraction): how much
    of the document the single most frequent n-gram covers — the other
    Gopher repetition rule (dup_ngram_fraction catches diffuse repeats;
    this catches one phrase stamped over and over). Distributed
    WordCount shape: explode n-gram hashes, count per (id, gram), max
    per id — grams shuffle as 8-byte hashes, ties need no break (only
    the max count is kept)."""
    tcol = tokens(text_col)
    n_windows = F.greatest(F.size(tcol) - (n - 1), F.lit(0))
    slices = [F.slice(tcol, j + 1, n_windows) for j in range(n)]
    grams = F.transform(slices[0], lambda t: F.xxhash64(t))
    for s in slices[1:]:
        grams = F.zip_with(grams, s, lambda acc, t: F.xxhash64(acc, t))
    exploded = docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("g")
    )
    per_gram = exploded.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("id")
        .agg(
            F.max("c").alias("top_gram_count"),
            F.sum("c").cast("long").alias("total_grams"),
        )
        .withColumn(
            "top_gram_fraction",
            F.round(F.col("top_gram_count") / F.col("total_grams"), 6),
        )
    )


def fingerprint(col: Column | str) -> Column:
    """Exact-dedup fingerprint: md5 of whitespace-normalized lowercased
    text (md5 exists in both engines, so oracles can reproduce it)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def fingerprint_sql(expr: str) -> str:
    return rf"md5(regexp_replace(lower(trim({expr})), '\s+', ' ', 'g'))"


def shingles(col: Column | str, k: int = 3) -> Column:
    """k-token shingles (the unit of n-gram Jaccard / MinHash):
    ['a','b','c','d'], k=3 → ['a b c','b c d']. Empty when < k tokens."""
    toks = tokens(col)
    n = F.size(toks)
    # guard n<k explicitly: sequence(1, 0) DESCENDS in Spark ([1,0]),
    # feeding slice() an illegal start index
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))


def shingles_sql(expr: str, k: int = 3) -> str:
    toks = f"regexp_extract_all(lower({expr}), '{TOKEN_PATTERN}')"
    return (
        f"list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1),"
        f" i -> array_to_string({toks}[i:i+{k - 1}], ' '))"
    )


def hash_embeddings(
    docs,
    text_col: str,
    id_col: str,
    *,
    dim: int = 64,
    ngram: int = 1,
    out_col: str = "embedding",
):
    """Text → dense vector via the FEATURE-HASHING trick (HashingTF
    with signed buckets): every token (or token n-gram) scatters into
    bucket pmod(xxhash64(gram), dim) with sign ±1 from an independent
    hash bit, per-bucket signs sum, and the vector is L2-normalized.
    Signed hashing keeps bucket collisions unbiased (E[collision
    contribution] = 0 — the classic hashing-kernel result), so cosine
    between hashed vectors tracks n-gram overlap: exact duplicates →
    1.0, near-dups → high, unrelated → near 0.

    This is the engine's text→embedding boundary: the output column
    composes directly with every vector operator (semantic_dedup,
    ann_*_topk, near_dup_pairs, quantize/save_ivf_index), so a corpus
    with no model embeddings still gets semantic-family dedup. Swap in
    model vectors by renaming their column — everything downstream is
    schema-compatible. Entirely JVM: explode → two hash exprs → two
    aggregations (by (id, bucket), then by id) → one map-to-array
    projection; no Python, no UDF, shuffles carry (id, bucket, count)
    only.

    Returns (id, out_col array<double> unit-norm; all-zero if the text
    has no tokens or all buckets cancel)."""
    # ngram > 1 reuses the shingles() sliding window (same space-joined
    # grams the dedup family shingles on); ngram == 1 is the raw tokens
    grams = (
        tokens(F.col(text_col))
        if ngram == 1
        else shingles(F.col(text_col), ngram)
    )
    exploded = docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("_g")
    ).select(
        "id",
        F.pmod(F.xxhash64("_g"), F.lit(dim)).cast("int").alias("_b"),
        # independent sign bit: hash with a different seed column
        (F.pmod(F.xxhash64("_g", F.lit(1)), F.lit(2)) * 2 - 1)
        .cast("double")
        .alias("_s"),
    )
    bucket_sums = exploded.groupBy("id", "_b").agg(F.sum("_s").alias("_v"))
    vecs = bucket_sums.groupBy("id").agg(
        F.map_from_arrays(F.collect_list("_b"), F.collect_list("_v")).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(F.element_at("_m", d.cast("int")), F.lit(0.0)),
    )
    raw = vecs.select("id", dense.alias("_raw"))
    # explode drops gram-less documents (no tokens, or < ngram of
    # them) — restore them via a left join so the contract holds:
    # every input id gets a row, all-zero when nothing hashed
    ids = docs.select(F.col(id_col).alias("id"))
    zero = F.array_repeat(F.lit(0.0), dim)
    filled = ids.join(raw, "id", "left").select(
        "id", F.coalesce("_raw", zero).alias("_raw")
    )
    nrm = F.sqrt(
        F.aggregate("_raw", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return filled.select(
        F.col("id").alias(id_col),
        F.when(nrm > 0, F.transform("_raw", lambda x: x / nrm))
        .otherwise(F.col("_raw"))
        .alias(out_col),
    )


def tfidf_top_terms(docs, text_col: str, id_col: str, *, k: int = 3):
    """Top-k terms per document by smoothed TF-IDF — keyword
    extraction / importance weighting for the training-data pipeline.
    Returns (id, rnk, term, tfidf), ties broken term-asc.

    RATIONAL idf on purpose: tfidf = (cnt/n_d) · ((N+1)/(df+1)) uses
    only IEEE divides and one multiply, no log — so any engine
    evaluating the same expression tree reproduces the doubles
    bit-for-bit (ln differs in the last ulp across libm
    implementations, which breaks value-hash comparison; the rational
    form ranks identically for fixed N). Entirely JVM: two shuffles
    (by doc, by term) + a broadcast single-row N — at corpus scale the
    term table is the big side and shuffles on the term key exactly
    like WordCount."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    lens = tf.groupBy("id").agg(F.sum("cnt").alias("n_d"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_tbl = tf.agg(F.countDistinct("id").alias("n_docs"))
    scored = (
        tf.join(lens, "id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_tbl))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("cnt") / F.col("n_d"))
                * ((F.col("n_docs") + F.lit(1)) / (F.col("df") + F.lit(1))),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("id", "rnk", "term", "tfidf")
    )
