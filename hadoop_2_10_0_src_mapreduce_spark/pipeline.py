"""End-to-end training-data preparation recipe.

The reference's users ran CHAINS of jobs (JobControl DAGs of
map/reduce passes — SURVEY.md §2.8); the modern equivalent this engine
serves is the LLM-corpus cleaning pipeline. ``prepare_training_corpus``
composes the engine's own operators into that standard chain:

    exact dedup → near-dup clustering → representative selection
    → language / quality / repetition gating → PII redaction
    → per-doc stats

Everything stays one lazy DataFrame program except the near-dup
clustering step (iterative — see dedup.duplicate_components), so
Catalyst sees the whole filter chain and pushes scans/projections down;
at 100 TB each stage shuffles ids/fingerprints, never raw text, except
the shingle index the near-dup step is built on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions import text as T
from hadoop_2_10_0_src_mapreduce_spark.functions.hashing import (
    MD5_HEX2INT_SQL,
    md5_unit,
)
from hadoop_2_10_0_src_mapreduce_spark.operators import dedup


def prepare_training_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] | None = None,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    near_dup_threshold: float = 0.8,
    max_doc_freq: int | None = None,
    max_bucket: int | None = 64,
    max_dup_3gram_frac: float | None = 0.5,
    redact: bool = True,
    eval_df: DataFrame | None = None,
    decontam_ngram: int = 13,
    split_weights: dict[str, float] | None = None,
    model_weights: dict[str, float] | None = None,
    min_model_quality: float = 0.5,
    cut_spans_min_tokens: int | None = None,
    drop_boilerplate_min_docs: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """The standard corpus-cleaning chain, one call.

    ``checkpoint_dir`` (r10): forwarded to the near-dedup clustering
    step (``dedup.duplicate_components``) — on preemptible clusters
    set it to an HDFS/object-store path so the iterative label
    propagation survives executor loss (reliable parquet checkpoints
    instead of executor-local blocks); results are pinned identical
    under both modes.

    ``resume=True`` (r12) extends the r11 driver-loss recovery from
    the clustering loop to the WHOLE chain: a restarted job pointed
    at the same ``checkpoint_dir`` — called with the SAME arguments
    as the crashed run (the pin numbering mirrors the enabled
    stages) — skips every stage whose chain pin
    (``<checkpoint_dir>/chain/step-k``) committed its _SUCCESS, and
    continues from the newest one; if no chain pin landed yet,
    ``resume`` is forwarded to ``duplicate_components`` so even a
    crash inside the clustering loop restarts mid-loop rather than
    from round 0. Every stage is deterministic, so the resumed run's
    output is the one the crash interrupted (pinned by test at each
    boundary). A multi-hour 5M-doc recipe killed by driver loss no
    longer restarts from scratch.

    0. LINE BOILERPLATE — when ``drop_boilerplate_min_docs`` is set,
       lines verbatim-repeated across that many documents (cookie
       banners, nav chrome, license headers) are removed FIRST
       (dedup.drop_boilerplate_lines), so template chrome neither
       defeats exact dedup (two distinct articles sharing a footer
       stay distinct either way, but two identical articles with
       different footers now deduplicate) nor skews quality scores.
    1. EXACT dedup — keep the min-id representative per normalized-text
       fingerprint (byte-duplicates are the bulk of web-scale dups).
    2. NEAR-dup clustering — MinHash+LSH candidate pairs, exact-Jaccard
       verified at ``near_dup_threshold``, connected components over
       the pair graph; only each cluster's min-id representative
       survives. ``max_bucket`` (default 64) caps in-bucket candidate
       generation: a boilerplate mega-cluster of m near-identical docs
       otherwise owes C(m,2) candidates per band (measured 200M
       candidates / 1009 s on one 20k-doc cluster at 500k docs —
       fixtures/DEDUP_DECADE_baseline.jsonl); oversized buckets emit
       id-sorted consecutive edges instead. This step only consumes
       ``duplicate_components(pairs)``, and the linked-edge clustering
       is pinned identical on near-dup cluster pile-ups (the case the
       cap exists for: every consecutive pair in such a bucket passes
       the Jaccard verify — tests/test_extensions.py
       test_minhash_max_bucket_linked_preserves_clusters, plus the
       500k/5M decade runs where the component histogram equals the
       planted truth exactly). The contract is NOT unconditional
       exactness: if an oversized bucket interleaves a true near-dup
       pair with sub-threshold interlopers in EVERY band they share,
       the consecutive edges through the interlopers fail verify and
       that pair's cluster can split locally (_capped_bucket_pairs
       documents the same limit) — the deliberate trade against a
       candidate list quadratic in cluster size. Set
       ``max_bucket=None`` to buy back exact all-pairs semantics at
       that quadratic cost.
       ``max_doc_freq`` defaults to None HERE on purpose (the
       operator's own default): the r9 end-to-end decade run caught
       the composition defect a df cap hides — a near-dup cluster of
       m > cap docs has ALL its shared shingles above the cap, so
       every member's signature is built from its few unique edit
       shingles (disjoint across members) and the cluster sails
       through near-dedup undetected; the planted 200-variant
       mega-cluster survived 200-strong at cap=100 and collapsed to 1
       at None (tools/dedup_decade.py 'recipe'). The boilerplate docs
       a df cap blinds the step to are exactly the most-duplicated
       content in a web corpus. In the MINHASH path the cap was only
       ever a candidate-volume guard, and ``max_bucket`` now bounds
       that at O(bucket) without touching recall — set a df cap here
       only for the stop-shingle SEMANTICS (scoring Jaccard over rare
       shingles), never for cost.
    2b. SPAN CUTTING — when ``cut_spans_min_tokens`` is set, maximal
       cross-document repeated runs of at least that many tokens are
       REMOVED from the surviving documents
       (dedup.cut_repeated_spans — the exact-substring recipe's cut
       step; note it tokenizer-normalizes the text), so boilerplate
       that survives document-level dedup still leaves the token
       stream, and the gates below score the cleaned text.
    3. DECONTAMINATION — when ``eval_df`` is given, drop every doc
       sharing a ``decontam_ngram``-token shingle with the benchmark
       set (dedup.decontaminate) BEFORE the gates, so no eval text
       can leak into the published corpus.
    4. GATES — language allow-list (omit ``languages`` to keep all),
       composite quality floor, minimum token count, a repetition
       ceiling (``max_dup_3gram_frac``: Gopher-style — documents whose
       3-grams are mostly repeats are boilerplate/looping text; None
       disables), and optionally a MODEL-based filter
       (``model_weights``: offline-trained linear weights over the
       quality features, scored with the rational sigmoid — the
       fasttext-classifier stage; rows below ``min_model_quality``
       drop).
    5. REDACTION — published text has emails/IPs/phone-runs replaced
       with typed placeholders (``redact=False`` keeps raw text).
    6. SPLIT — when ``split_weights`` is given, attach the
       deterministic md5-bucket train/val/test label as ``split``.

    Returns (id, text, pred_lang, quality, [model_quality,] n_tokens,
    dup_3gram_frac [, split]) for the surviving documents —
    ``model_quality`` rides through only when ``model_weights`` is set. Deterministic end to end:
    every keeper is a min-id choice, hashing is fixed-seed, and the
    quality/language scores are pure expressions — rerunning yields
    the identical corpus.
    """
    from hadoop_2_10_0_src_mapreduce_spark.checkpointing import (
        RoundCheckpointer,
        _hadoop_delete,
    )

    spark = docs.sparkSession
    ckpt = RoundCheckpointer(
        spark, checkpoint_dir and f"{checkpoint_dir}/chain", resume=resume
    )
    # chain pins a crashed run already landed (0 on a fresh run).
    # Pin k is the INPUT to pinned stage k, so `start` complete pins
    # mean stages 0..start-2 fully executed (their outputs are inside
    # pin start-1) and stage start-1 is where the crash interrupted.
    start = ckpt.n

    # the pinned stages, in pin-number order — resume therefore
    # requires the same stage-selecting arguments as the crashed run
    stages = []
    if cut_spans_min_tokens is not None:
        # 2b. exact-substring span cutting over the deduped survivors
        stages.append(
            lambda df: dedup.cut_repeated_spans(
                df, "text", "id", min_span_tokens=cut_spans_min_tokens
            )
        )
    if eval_df is not None:
        # 3. decontamination: no benchmark text leaks into the corpus
        # (eval_df shares the corpus column names — same
        # text_col/id_col)
        eval_base = eval_df.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text")
        )
        stages.append(
            lambda df: dedup.decontaminate(
                df, eval_base, "text", "id", n=decontam_ngram
            )
        )
    if start > len(stages):
        raise ValueError(
            f"resume found {start} chain pins under {checkpoint_dir}/chain "
            f"but only {len(stages)} pinned stages are enabled — the "
            "resumed call must use the same arguments as the crashed run"
        )

    if start == 0:
        base = docs.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text")
        )

        # 0. line-level boilerplate removal ahead of every fingerprint
        if drop_boilerplate_min_docs is not None:
            base = dedup.drop_boilerplate_lines(
                base, "text", "id", min_docs=drop_boilerplate_min_docs
            )

        # 1. exact dedup: anti-join away everything but the keeper
        keepers = dedup.exact_dedup(base, "text", "id").select(
            F.col("keeper").alias("id")
        )
        uniq = base.join(keepers, "id", "left_semi")

        # 2. near-dup clusters over the exact-unique survivors: a doc
        # is dropped iff it belongs to a cluster and is not its
        # representative. ``resume`` rides through: a crash INSIDE the
        # clustering loop (before any chain pin landed) restarts from
        # the loop's own newest complete step, not round 0.
        pairs = dedup.minhash_lsh_pairs(
            uniq, "text", "id",
            threshold=near_dup_threshold, max_doc_freq=max_doc_freq,
            max_bucket=max_bucket,
        )
        losers = (
            dedup.duplicate_components(
                pairs,
                checkpoint_dir=checkpoint_dir
                and f"{checkpoint_dir}/components",
                resume=resume,
            )
            .where(F.col("id") != F.col("rep"))
            .select("id")
        )
        survivors = uniq.join(losers, "id", "left_anti")
    else:
        # chain pin start-1 captures everything upstream of stage
        # start-1 — the dedup prefix (and the crashed run's components
        # steps, which fed pin 0) is superseded; drop its files now,
        # exactly as pin() would have on the run the crash interrupted
        survivors = None
        _hadoop_delete(spark, f"{checkpoint_dir}/components")

    # Multi-reference boundary pins (r10, found by the 5M decade run):
    # cut_repeated_spans and decontaminate each read their input TWICE
    # (stats/flag pass + join-back), and Spark re-executes an unpinned
    # subtree per reference — so the fused chain re-ran the whole
    # boiler→exact→near-dup prefix up to 4× at those boundaries. At
    # 500k that recompute hid inside overhead (fused beat the
    # stage-isolated sum by 34%); at 5M it inverted the claim (fused
    # 2153 s vs 1204 s stage sum). Pinning the chain at each
    # multi-reference boundary (eager localCheckpoint by default; the
    # reliable parquet checkpointer when ``checkpoint_dir`` is set)
    # restores one-evaluation-per-stage; superseded pins are retired
    # as the next lands, so at most two boundaries hold storage.

    def pin(df):
        """Chain-pin, then retire the components FINAL step: the pin
        just materialized everything downstream of the clustering, so
        the parquet step backing `losers` is superseded the moment the
        first pin lands (r11, from the r10 ADVICE — it used to live
        until the caller deleted checkpoint_dir by hand)."""
        out = ckpt(df)
        if checkpoint_dir is not None:
            _hadoop_delete(spark, f"{checkpoint_dir}/components")
        return out

    try:
        for k, stage in enumerate(stages):
            if k < start - 1:
                continue  # fully executed — its output is inside pin start-1
            if k == start - 1:
                # the crash interrupted THIS stage; its input is the
                # resumed pin — re-enter without writing a new one
                survivors = stage(ckpt.resumed)
            else:
                survivors = stage(pin(survivors))
    except BaseException:
        ckpt.close()  # a failed recipe must not leak live chain steps
        raise

    # 4. score + gate (tokens computed once; the one-pass accumulators
    # and the 3-gram chain are HOISTED as named columns — Catalyst
    # inlines dict-built expressions per reference, so the inline form
    # re-ran the lang aggregate 8× and the quality aggregate several ×
    # per row; see quality_acc/lang_acc in functions/text.py, the r12
    # text_token_quality finding)
    toked = survivors.select("id", "text", T.tokens("text").alias("_toks"))
    acced = toked.select(
        "id", "text", "_toks",
        T.quality_acc(F.col("_toks")).alias("_qacc"),
        T.lang_acc(F.col("_toks")).alias("_lacc"),
        T.dup_ngram_chains(F.col("_toks"), (3,))[3].alias("_g3"),
    )
    feats = T.quality_features("text", F.col("_toks"), acc=F.col("_qacc"))
    model_cols = (
        [T.linear_score(feats, model_weights).alias("model_quality")]
        if model_weights is not None
        else []
    )
    scored = acced.select(
        "id",
        "text",
        T.lang_id("text", F.col("_toks"), acc=F.col("_lacc")).alias("pred_lang"),
        T.quality_score("text", F.col("_toks"), features=feats).alias("quality"),
        *model_cols,
        F.size("_toks").alias("n_tokens"),
        T.dup_fraction_from_chain(F.col("_g3")).alias("dup_3gram_frac"),
    )
    out = scored.where(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    if model_weights is not None:
        out = out.where(F.col("model_quality") >= min_model_quality)
    if max_dup_3gram_frac is not None:
        out = out.where(F.col("dup_3gram_frac") <= max_dup_3gram_frac)
    if languages is not None:
        out = out.where(F.col("pred_lang").isin(*languages))
    if redact:
        # gates ran on the RAW text above; only the published column is
        # scrubbed, so a redaction placeholder never skews a score
        out = out.withColumn("text", T.redact_pii("text"))
    if split_weights is not None:
        out = out.withColumn("split", split_assign("id", split_weights))
    # the returned frame reads only the NEWEST chain pin (each pin is
    # materialized from the previous before the previous is dropped)
    ckpt.retire_intermediates()
    return out


def sample_by_token_budget(
    docs: DataFrame,
    budgets: dict[str, int],
    *,
    text_col: str = "text",
    source_col: str = "source",
    seed: int = 7,
    id_col: str | None = "auto",
) -> DataFrame:
    """Data MIXING: downsample each source to ~its token budget — the
    step that turns per-source corpora into a training mixture with
    chosen proportions. Computes per-source token totals (one
    aggregate over token counts, never text), derives a keep-fraction
    min(1, budget/total) per source, and Bernoulli-samples rows.
    Sources absent from ``budgets`` are kept whole. Expected (not
    exact) budgets, the standard trade: an exact cut needs a global
    sort; Bernoulli is one pass and unbiased.

    ``id_col`` selects LAYOUT-INDEPENDENT determinism: a row is kept
    iff uint32(md5(seed:id)[:8])/2³² < fraction — a pure function of
    (seed, id), so the sample is identical whatever the partitioning,
    file order, or cluster size (the ``split_assign`` property). The
    default ``"auto"`` infers the id column (``doc_id`` or ``id``
    when present) so the safe path is the DEFAULT path; only when no
    id column exists — or on an explicit ``id_col=None`` — does
    sampling fall back to ``sampleBy``, whose rand(seed) stream is
    seeded PER PARTITION: deterministic only while the physical
    layout is, so a repartitioned rerun samples different rows. At
    corpus scale always carry an id."""
    if id_col == "auto":
        id_col = next(
            (c for c in ("doc_id", "id") if c in docs.columns), None
        )
    totals = {
        r[source_col]: r.total
        for r in docs.groupBy(source_col)
        .agg(F.sum(T.token_count(text_col)).alias("total"))
        .collect()
    }
    fractions = {
        src: min(1.0, budgets[src] / totals[src]) if totals.get(src) else 1.0
        for src in totals
        if src in budgets
    }
    keep_all = [s for s in totals if s not in budgets]
    if id_col is not None:
        u = md5_unit(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        )
        frac = F.create_map(
            *[x for s, f in fractions.items() for x in (F.lit(s), F.lit(f))]
        )
        sampled = docs.where(
            F.col(source_col).isin(list(fractions)) & (u < frac[F.col(source_col)])
        )
    else:
        sampled = docs.sampleBy(source_col, fractions, seed=seed)
    if keep_all:
        sampled = sampled.unionByName(
            docs.where(F.col(source_col).isin(keep_all))
        )
    return sampled


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int,
    overlap: int = 0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Token-budget CHUNKING — the training-prep stage that cuts long
    documents down to a model's sequence length (packing handles the
    short side; chunking handles the long side, and the two compose:
    chunk to ``max_tokens`` = seq_len, then pack the chunks).

    Each document's token stream (``text.tokens`` — the engine's
    shared tokenizer, identical in the DuckDB oracle) is cut into
    windows of at most ``max_tokens`` tokens whose starts advance by
    ``stride = max_tokens - overlap``, so consecutive chunks share
    exactly ``overlap`` tokens of context and every token position is
    covered. Chunk count is closed-form — 1 if n ≤ max_tokens else
    ceil((n − max_tokens)/stride) + 1 — which makes the whole operator
    ONE projection + ``posexplode``: no shuffle, no UDF, linear in
    corpus bytes, embarrassingly parallel at 100 TB. The final chunk
    lands wherever the stream ends; by the closed form its length is
    always in (overlap, max_tokens], so no degenerate tail chunks are
    emitted. Documents with zero tokens emit NO rows (nothing to
    train on).

    Returns ``(id_col, *keep_cols, chunk_idx, n_chunks, chunk_text,
    n_tokens, start_token)`` where ``chunk_text`` is the tokens
    rejoined with single spaces — chunking operates on the token
    stream, so original inter-token whitespace/case/punctuation is
    NOT preserved (the same normalization every other token-level
    operator here applies).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be > 0, got {max_tokens}")
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens, got {overlap}"
        )
    _out_names = {"chunk_idx", "n_chunks", "chunk_text", "n_tokens",
                  "start_token"}
    clash = _out_names.intersection(keep_cols) | ({id_col} & _out_names)
    if clash:
        raise ValueError(
            f"keep_cols/id_col collide with chunk output columns: {sorted(clash)}"
        )
    stride = max_tokens - overlap
    toks = T.tokens(text_col)
    n = F.size(toks)
    n_chunks = (
        F.when(n <= max_tokens, F.lit(1))
        .otherwise(
            F.ceil((n - max_tokens) / F.lit(float(stride))).cast("int") + 1
        )
    )
    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        toks.alias("_toks"),
        n_chunks.alias("n_chunks"),
    ).where(F.size("_toks") > 0)
    start = F.col("chunk_idx") * stride
    chunk = F.slice("_toks", start + 1, max_tokens)
    return (
        base.select(
            id_col,
            *keep_cols,
            "n_chunks",
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            *keep_cols,
            "chunk_idx",
            "n_chunks",
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("n_tokens"),
            start.alias("start_token"),
        )
    )


def chunk_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    *,
    max_tokens: int,
    overlap: int = 0,
) -> str:
    """DuckDB twin of ``chunk_documents`` (same tokenizer, same
    closed-form chunk count, same 1-based inclusive slicing) — a
    SELECT producing (id, chunk_idx, chunk_text) for oracle checks."""
    stride = max_tokens - overlap
    toks = f"regexp_extract_all(lower({text_expr}), '{T.TOKEN_PATTERN}')"
    return f"""
SELECT id, ci AS chunk_idx,
       array_to_string(toks[ci*{stride}+1 : ci*{stride}+{max_tokens}], ' ')
           AS chunk_text
FROM (
    SELECT id, toks,
           unnest(generate_series(0, nc - 1)) AS ci
    FROM (
        SELECT {id_expr} AS id, toks,
               CASE WHEN len(toks) <= {max_tokens} THEN 1
                    ELSE CAST(ceil((len(toks) - {max_tokens})
                              / CAST({stride} AS DOUBLE)) AS INT) + 1
               END AS nc
        FROM (SELECT *, {toks} AS toks FROM {table})
        WHERE len(toks) > 0
    )
)
"""


def assign_packing_bins(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_tokens: int = 2048,
    shard_col: str | None = None,
    auto_shards: int | None = None,
    max_global_window_rows: int = 1_000_000,
    count_col: str | None = None,
) -> DataFrame:
    """Sequence PACKING assignment: group documents into bins of
    ~``target_tokens`` so a downstream step can concatenate each bin
    into one training sequence. This is SEQUENTIAL packing (concat in
    deterministic id order, cut at the boundary the running total
    crosses) — what production pipelines actually run; bin-optimal
    packing is NP-hard and unnecessary. The running total is a window
    cumsum over ``id_col`` order (per ``shard_col`` when given, so
    window partitions are bounded at corpus scale — shard first, e.g.
    by source or by pmod(hash(id), k); ``auto_shards=k`` does the
    pmod(xxhash64(id), k) shard for you, emitted as ``_shard``).
    Without any shard the cumsum is ONE GLOBAL window partition — the
    whole corpus through a single task — so the unsharded path is
    GUARDED: it counts the input and raises above
    ``max_global_window_rows`` rather than silently funneling (a
    count is one cheap aggregate; the window it guards against is a
    full-corpus single-task sort). Each
    document lands in the bin its START position falls in:
    bin = floor((cumsum − n) / target) — so every bin holds at most
    ``target_tokens`` plus the overshoot of its one boundary-crossing
    document (truncation of that tail is the caller's policy), and a
    document that crosses several boundaries still belongs to exactly
    one bin.

    ``count_col`` packs on a PRECOMPUTED per-row token count (e.g.
    the BPE counts ``bpe_encode`` emits — the budget that actually
    matters once a real tokenizer exists) instead of re-deriving
    whitespace counts from ``text_col``, which then goes unread.

    Returns (shard?, bin, id, n_tokens, bin_tokens) — the bound above
    is pinned by test."""
    from pyspark.sql.window import Window

    if shard_col is None and auto_shards is not None:
        shard_col = "_shard"
        docs = docs.withColumn(
            "_shard",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(auto_shards)).cast("int"),
        )
    part = [shard_col] if shard_col else []
    # guard cost is bounded: limit(N+1).count() stops scanning at the
    # threshold instead of fully evaluating an arbitrarily expensive
    # upstream lineage just to learn it is huge
    if (
        not part
        and docs.limit(max_global_window_rows + 1).count()
        > max_global_window_rows
    ):
        raise ValueError(
            "assign_packing_bins without a shard runs ONE global window "
            f"partition and the input exceeds {max_global_window_rows} "
            "rows; pass shard_col= (e.g. source) or auto_shards=k to "
            "bound window partitions"
        )
    w = Window.partitionBy(*part).orderBy(id_col) if part else (
        Window.orderBy(id_col)
    )
    n_expr = (
        F.col(count_col).cast("long")
        if count_col is not None
        else T.token_count(text_col)
    )
    sized = docs.select(*part, F.col(id_col), n_expr.alias("n_tokens"))
    csum = F.sum("n_tokens").over(w)
    binned = sized.withColumn(
        "bin",
        F.floor((csum - F.col("n_tokens")) / F.lit(target_tokens)).cast("long"),
    )
    wb = Window.partitionBy(*part, "bin")
    return binned.withColumn(
        "bin_tokens", F.sum("n_tokens").over(wb)
    ).select(*part, "bin", id_col, "n_tokens", "bin_tokens")


def cap_per_source(
    docs: DataFrame,
    max_docs: int,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    cap_salts: int = 16,
) -> DataFrame:
    """Per-source document CAP — the source-diversity guard (one crawl
    domain must not be half the corpus): keep each source's
    ``max_docs`` smallest rows by (md5(id), id) — deterministic,
    engine-independent, and stable under corpus growth for the docs
    already kept... until the source exceeds the cap, after which the
    keeper set is still a pure function of the id set. Two-level
    salted cap (the ``capped_lsh_buckets`` pattern): rows first cap
    within pmod(xxhash64(id), s) sub-groups, survivors take the final
    cap — output identical to the one-level window (any global
    smallest-``max_docs`` row is among its own salt's smallest), but
    no window partition ever sees a whole hot source."""
    from pyspark.sql.window import Window

    w1 = Window.partitionBy(source_col, "_salt").orderBy("_capkey", id_col)
    w2 = Window.partitionBy(source_col).orderBy("_capkey", id_col)
    return (
        docs.withColumn("_capkey", F.md5(F.col(id_col).cast("string")))
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(cap_salts)).cast("int"),
        )
        .withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= max_docs)
        .withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= max_docs)
        .drop("_capkey", "_salt", "_rn1", "_rn")
    )


def split_assign(
    id_col: str, weights: dict[str, float]
) -> F.Column:
    """Deterministic corpus SPLIT assignment (train/val/test): the
    document's unit-interval coordinate is u = uint32(md5(id)[:8])/2³²
    — a pure function of the id, so membership is stable across runs,
    machines, and engines (md5 exists everywhere; ``split_sql`` is the
    oracle twin) — and the row lands in the first split whose
    cumulative normalized weight exceeds u. Properties that matter for
    training hygiene, all by construction: splits are DISJOINT and
    COMPLETE (a CASE over non-overlapping half-open intervals),
    adding documents never moves an existing one between splits
    (membership depends only on the id), and proportions converge to
    the weights by uniformity of the hash. ``weights`` order is the
    interval order; the last split absorbs the u = 1 edge."""
    u = md5_unit(F.col(id_col).cast("string"))
    total = sum(weights.values())
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    if expr is None:  # single split
        return F.lit(names[-1])
    return expr.otherwise(F.lit(names[-1]))


def split_sql(id_expr: str, weights: dict[str, float]) -> str:
    """DuckDB twin of ``split_assign`` — same md5 coordinate, same
    cumulative-weight CASE, so an external oracle reproduces every
    split assignment exactly."""
    u = (
        f"((SELECT {MD5_HEX2INT_SQL} FROM (SELECT md5(CAST({id_expr} AS VARCHAR)) AS h))"
        " / 4294967296.0)"
    )
    total = sum(weights.values())
    acc = 0.0
    cases = []
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cases.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    if not cases:
        return f"'{names[-1]}'"
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def split_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    split_col: str = "split",
    key_col: str | None = None,
) -> DataFrame:
    """Attach the deterministic split label (see ``split_assign``) as
    ``split_col``. One projection — no shuffle, no sampling state.

    ``key_col`` selects the hashing granularity. Default (None) hashes
    ``id_col`` — per-document assignment. Passing a GROUP column
    (e.g. ``source`` or a domain) makes the split LEAKAGE-SAFE at that
    granularity: every row of a group lands in the same split because
    the assignment is a pure function of the group value, so near-
    duplicate documents from one crawl domain (or one benchmark
    family) can never straddle train and test. The cost of the
    guarantee is granularity — realized proportions converge to
    ``weights`` over the number of GROUPS, not rows, so with few large
    groups expect lumpy sizes (that is the semantics, not a bug)."""
    return docs.withColumn(split_col, split_assign(key_col or id_col, weights))


def split_corpus_by_components(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """CLUSTER-SAFE splits — the strongest leakage guard: assign every
    near-duplicate CLUSTER, not every document, to one split.
    Per-document splits leak whenever two near-dups straddle train and
    test (the test doc is effectively in the training set); per-source
    splits (``key_col``) only guard within-source duplication. This
    variant hashes the cluster REPRESENTATIVE (the smallest id
    reachable through the near-dup pair graph —
    ``dedup.duplicate_components``), so an entire duplicate cluster
    moves as one unit regardless of which sources it spans; unpaired
    documents are their own cluster and hash by their own id, making
    the assignment IDENTICAL to ``split_corpus`` for them.

    ``pairs`` is any near-dup pair frame ((id_a, id_b) — MinHash-LSH,
    n-gram Jaccard, SemDeDup...). ``docs`` must not already carry a
    ``rep`` or ``_skey`` column (the join/working names — validated).
    Scale shape: components shuffle
    (id, label) ints, the join-back shuffles (id, rep), documents
    shuffle once on id for the join — no text moves twice, and the
    split itself stays one md5 projection.

    Caveat (inherent, documented): cluster membership depends on the
    pair graph, so unlike ``split_corpus`` the assignment is stable
    only while the near-dup RELATION is — a new document that bridges
    two clusters re-labels one side. Freeze the pair set with the
    corpus snapshot when reproducibility across growth matters."""
    clash = {"rep", "_skey"}.intersection(docs.columns)
    if clash:
        raise ValueError(
            f"split_corpus_by_components working columns collide with "
            f"docs columns: {sorted(clash)}"
        )
    comps = dedup.duplicate_components(pairs, id_a=id_a, id_b=id_b)
    rep = F.coalesce(F.col("rep"), F.col(id_col))
    return (
        docs.join(
            comps.withColumnRenamed("id", id_col),
            id_col,
            "left",
        )
        .withColumn("_skey", rep.cast("string"))
        .withColumn(split_col, split_assign("_skey", weights))
        .drop("rep", "_skey")
    )


def write_jsonl_shards(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    rows_per_shard: int = 100_000,
    mode: str = "error",
    shuffle: bool = False,
    compression: str | None = None,
) -> None:
    """Publish a corpus as JSON-lines shards — the interchange format
    training stacks ingest. Shard membership is DETERMINISTIC (range
    partition by id, sized from a count), so re-publishing the same
    corpus yields the same shard boundaries; within-shard order rides
    the range sort. One count + one range shuffle + the write.

    ``shuffle=True`` range-partitions and sorts by md5(id) instead of
    the raw id — a deterministic GLOBAL shuffle (same permutation every
    publish), so training order carries no curriculum bias from id
    locality (ids usually encode crawl order / source adjacency) while
    the publish stays reproducible byte-for-byte.

    ``compression`` ("gzip"/"zstd"/...) compresses each shard file —
    training stacks stream-decompress JSONL natively, and text corpora
    compress 3–5×, which at publish scale is the egress bill."""
    n = docs.count()
    shards = max(1, -(-n // rows_per_shard))
    key = (
        F.md5(F.col(id_col).cast("string")) if shuffle else F.col(id_col)
    )
    writer = (
        docs.withColumn("_shard_key", key)
        .repartitionByRange(shards, F.col("_shard_key"))
        .sortWithinPartitions("_shard_key")
        .drop("_shard_key")
        .write.mode(mode)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def pack_bins_to_sequences(
    docs: DataFrame,
    bins: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize ``assign_packing_bins`` output into training
    sequences: join the assignment back to the text, group per
    (shard?, bin), and concatenate members in id order —
    sort_array over (id, text) structs, so the within-bin order is
    deterministic without a sort exchange (struct compare is
    field-ordered; ids are unique). Returns (shard?, bin, seq_text,
    n_docs, n_tokens). Per-group payload is ~target_tokens of text —
    bounded by construction, so collect_list cannot blow up a task."""
    part = [shard_col] if shard_col else []
    joined = bins.join(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    return (
        joined.groupBy(*part, "bin")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col), F.col(text_col)))
            ).alias("_m"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            *part,
            "bin",
            F.array_join(
                F.transform("_m", lambda m: m[text_col]), sep
            ).alias("seq_text"),
            "n_docs",
            "n_tokens",
        )
    )


def corpus_report(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = None,
    exact_dup_counts: bool = True,
) -> DataFrame:
    """Corpus REPORT CARD — the profile a pipeline operator reads
    before choosing mixture weights, quality thresholds, and dedup
    budgets: one row per source (or one 'all' row) with volume,
    duplication, length-distribution, quality, and language columns,
    computed in ONE distributed aggregate over a single projection of
    the corpus (per-doc features are pure Column expressions from
    ``functions.text``; nothing shuffles except the per-source
    aggregation of those scalars, so the report costs a token-quality
    scan regardless of corpus size).

    Returns (source, n_docs, n_distinct_fp, dup_frac, total_tokens,
    p50_tokens, p90_tokens, mean_quality, top_lang, top_lang_frac):
    dup_frac = 1 − distinct normalized fingerprints / docs (exact-dup
    rate); percentiles are exact interpolated (``F.percentile``);
    top_lang breaks ties lexicographically so the report is
    deterministic.

    ``exact_dup_counts=False`` swaps the fingerprint countDistinct for
    ``approx_count_distinct`` (HLL++, rsd 0.01 → n_distinct_fp and
    dup_frac within ~1–2%): the exact count is the report's ONE
    full-width shuffle (every fingerprint scalar moves to its
    source's reducer); the sketch makes the report near-free at
    100 TB — partial HLL buffers merge map-side like the other
    aggregates — at the cost of dup_frac no longer being exact
    (tolerance-pinned by test). The exact default stays right for
    gate-sized corpora; the integer-token percentiles stay exact in
    both modes (their aggregation buffer is bounded by the distinct
    token-count range, not the corpus)."""
    langs = sorted(T.STOPWORDS) + ["und", "zh"]
    src = (
        F.col(source_col) if source_col is not None else F.lit("all")
    ).alias("source")
    # tokenize ONCE and share the array across the three token-level
    # features (the measured lang_scores pattern — the regex is the
    # scan's dominant per-row cost)
    per_doc = docs.select(
        src, F.col(text_col).alias("_t"), T.tokens(text_col).alias("_toks")
    ).select(
        "source", "_t", "_toks",
        # hoisted one-pass accumulators (see quality_acc/lang_acc):
        # the inline scores re-ran these aggregates per reference
        T.quality_acc(F.col("_toks")).alias("_qacc"),
        T.lang_acc(F.col("_toks")).alias("_lacc"),
    ).select(
        "source",
        F.size("_toks").alias("_nt"),
        T.quality_score(
            "_t", F.col("_toks"),
            features=T.quality_features("_t", F.col("_toks"), acc=F.col("_qacc")),
        ).alias("_q"),
        T.lang_id("_t", F.col("_toks"), acc=F.col("_lacc")).alias("_lang"),
        T.fingerprint("_t").alias("_fp"),
    )
    lang_cnt = [
        F.sum(F.when(F.col("_lang") == lang, 1).otherwise(0)).alias(f"_c_{lang}")
        for lang in langs
    ]
    distinct_fp = (
        F.countDistinct("_fp")
        if exact_dup_counts
        else F.approx_count_distinct("_fp", 0.01)
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        distinct_fp.alias("n_distinct_fp"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        F.percentile("_nt", 0.5).alias("_p50"),
        F.percentile("_nt", 0.9).alias("_p90"),
        F.avg("_q").alias("_mq"),
        *lang_cnt,
    )
    # deterministic argmax over the fixed language set: sort (-count,
    # lang) structs and take the head — same trick as lang_id itself
    top = F.get(
        F.sort_array(
            F.array(*[
                F.struct(
                    (-F.col(f"_c_{lang}")).alias("neg"),
                    F.lit(lang).alias("lang"),
                )
                for lang in langs
            ])
        ),
        0,
    )
    return agg.select(
        "source",
        "n_docs",
        "n_distinct_fp",
        F.round(1 - F.col("n_distinct_fp") / F.col("n_docs"), 6).alias(
            "dup_frac"
        ),
        "total_tokens",
        F.round("_p50", 3).alias("p50_tokens"),
        F.round("_p90", 3).alias("p90_tokens"),
        F.round("_mq", 6).alias("mean_quality"),
        top["lang"].alias("top_lang"),
        F.round(-top["neg"] / F.col("n_docs"), 6).alias("top_lang_frac"),
    ).orderBy("source")


def temperature_budgets(
    docs: DataFrame,
    total_budget: int,
    *,
    alpha: float = 0.3,
    text_col: str = "text",
    source_col: str = "source",
) -> dict[str, int]:
    """TEMPERATURE (α) SAMPLING weights — the standard multilingual /
    multi-source mixing rule: sample source s with probability
    ∝ (tokens_s)^α, so α=1 reproduces natural proportions, α=0 gives
    uniform, and the usual α≈0.2–0.5 upweights small sources without
    letting any one dominate. Returns the per-source token budget dict
    ``sample_by_token_budget`` consumes: budget_s = total_budget ·
    tokens_s^α / Σ tokens^α, capped at the source's own token count
    (a budget above it would silently under-fill the mixture — the
    cap surfaces as the realized total coming in under
    ``total_budget``, which is the honest outcome when upsampling is
    off the table; repeat-epoch the small sources at training time
    instead).

    One aggregate over token counts (never text) collapsed to a
    #sources-sized driver dict — the same bounded collect the budget
    sampler itself performs."""
    if total_budget <= 0:
        raise ValueError(f"total_budget must be > 0, got {total_budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    totals = {
        r[source_col]: int(r.total)
        for r in docs.groupBy(source_col)
        .agg(F.sum(T.token_count(text_col)).alias("total"))
        .collect()
        if r.total
    }
    weights = {s: t ** alpha for s, t in totals.items()}
    z = sum(weights.values())
    if z == 0:
        return {}
    return {
        s: min(totals[s], int(total_budget * w / z))
        for s, w in weights.items()
    }
