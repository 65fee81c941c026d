"""BPE vocabulary induction and encoding, Spark-first.

The tokenizer-training step of a real pretraining pipeline (Sennrich
et al. 2016's byte-pair-encoding recipe, the sentencepiece/GPT-2
family's core loop), architected the way the published trainers
actually behave at corpus scale: the CORPUS-sized work — word
frequency counting, and later encoding — is distributed, while the
merge-selection loop runs on the driver over the WORD-frequency table,
which is vocabulary-sized (distinct word forms), not corpus-sized, and
is further capped at ``max_words`` by (count desc, word asc) so driver
memory is bounded by construction. This split is not a shortcut: pair
counts are a pure function of the word-frequency table, so training on
it is EXACT, and every published BPE trainer does the same reduction.

Symbol model: the engine's shared ``[a-z0-9]+`` tokens split to
characters; merges apply strictly within a word (no cross-word
merges, no end-of-word marker — documented simplification; adding a
marker is a symbol-alphabet choice, not an algorithm change).
Determinism: merge selection breaks count ties by lexicographic pair
order, so the merge list is a pure function of the word-frequency
table and two engines produce identical vocabularies.

Encoding is the one Python boundary (like the multimodal codecs): an
Arrow-batched ``mapInPandas`` applying the merge ranks with the
standard lowest-rank-first loop and a per-batch word memo — each
DISTINCT word in a batch is encoded once, so the cost is bounded by
the batch's vocabulary, not its length.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions import text as T


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over the engine tokenizer — the corpus-sized →
    vocabulary-sized reduction BPE training runs on. One explode + one
    aggregate; map-side partial counts do the heavy lifting."""
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, merged = 0, pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    *,
    text_col: str = "text",
    max_words: int = 1_000_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Distributed
    word count → driver merge loop over the (capped) word-frequency
    dict; stops early when no pair reaches ``min_pair_count`` (merging
    singletons would memorize the tail). Returns the ordered merge
    list — rank = position — which IS the vocabulary artifact
    (``bpe_encode`` consumes it; persist it as two columns if it needs
    to live in a table)."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be > 0, got {num_merges}")
    freq_rows = (
        word_frequencies(docs, text_col)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return _train_from_freqs(
        [(r.word, r["count"]) for r in freq_rows],
        num_merges,
        min_pair_count=min_pair_count,
    )


def _train_from_freqs(
    freqs: list[tuple[str, int]],
    num_merges: int,
    *,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """The driver-side merge loop over a word-frequency table,
    INCREMENTAL (the standard BPE trainer optimization): a merge only
    changes pair counts of words CONTAINING the merged pair, so carry
    (pair -> count) and (pair -> word ids) across iterations and touch
    just those words, instead of rescanning the full word table per
    merge — at production vocab sizes (50k merges) the rescan is what
    dominates, and per-merge work here is proportional to the affected
    words' lengths only (tools/bpe_timing.py measures the two loops
    side by side). Words are keyed by index (each word's symbols
    always concatenate back to the word, so tuples stay distinct
    anyway — ids make that structural)."""
    import heapq

    words: list[list] = [[tuple(w), n] for w, n in freqs]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, n) in enumerate(words):
        for pr in zip(syms, syms[1:]):
            pair_counts[pr] = pair_counts.get(pr, 0) + n
            pair_words.setdefault(pr, set()).add(wid)

    # lazy max-heap for the argmax: (-count, pair) entries, re-pushed
    # whenever a pair's count changes; a popped entry is valid iff it
    # matches the CURRENT count (value equality — an entry that equals
    # the live count is a correct candidate no matter when it was
    # pushed). Heap order (-count, pair) reproduces the deterministic
    # count-desc-then-lexicographic tie-break exactly, and turns the
    # per-merge argmax from O(#pairs) into O(log #pairs) amortized.
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p) == -negc:
                best, best_n = p, -negc
                break
        if best is None or best_n < min_pair_count:
            break
        merges.append(best)
        touched: set[tuple[str, str]] = set()
        for wid in sorted(pair_words.get(best, ())):
            syms, n = words[wid]
            for pr in zip(syms, syms[1:]):
                left = pair_counts[pr] - n
                if left > 0:
                    pair_counts[pr] = left
                else:
                    del pair_counts[pr]
                touched.add(pr)
                ws = pair_words.get(pr)
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        del pair_words[pr]
            new = _merge_word(syms, best)
            words[wid][0] = new
            for pr in zip(new, new[1:]):
                pair_counts[pr] = pair_counts.get(pr, 0) + n
                touched.add(pr)
                pair_words.setdefault(pr, set()).add(wid)
        for p in touched:
            c = pair_counts.get(p)
            if c:
                heapq.heappush(heap, (-c, p))
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The token alphabet the merge list induces: every merge's joined
    form, in rank order (single characters are implicitly in-vocab)."""
    return [a + b for a, b in merges]


def _encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    memo: dict[str, tuple[str, ...]],
) -> tuple[str, ...]:
    got = memo.get(word)
    if got is not None:
        return got
    syms = tuple(word)
    # standard BPE encode: repeatedly apply the LOWEST-RANK applicable
    # merge (training order), not greedy-leftmost — this reproduces
    # exactly the segmentation training would have produced
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair)
    memo[word] = syms
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode every document with a trained merge list: returns
    (id_col, out_col array<string>, n_bpe_tokens). Arrow-batched
    ``mapInPandas`` with a per-batch distinct-word memo — the
    documented Python boundary (the merge loop is inherently
    sequential per word; everything around it stays columnar)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<string>, n_bpe_tokens int"
    # NULL text tokenizes to a NULL array; coalesce to empty so the
    # encoder emits an empty token list instead of crashing the task
    tokened = docs.select(
        F.col(id_col),
        F.coalesce(T.tokens(text_col), F.array()).alias("_toks"),
    )

    def enc(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        memo: dict[str, tuple[str, ...]] = {}
        for pdf in batches:
            out_tokens, out_n = [], []
            for toks in pdf["_toks"]:
                pieces: list[str] = []
                for w in toks:
                    pieces.extend(_encode_word(w, ranks, memo))
                out_tokens.append(pieces)
                out_n.append(len(pieces))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: out_tokens,
                    "n_bpe_tokens": out_n,
                }
            )

    return tokened.mapInPandas(enc, schema)
