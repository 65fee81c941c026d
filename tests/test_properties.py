"""Property tests (hypothesis): the engine's hand-built operators vs
naive single-process references on adversarial small inputs — the
analog of the reference's self-validating workloads (SURVEY §5.3:
TeraValidate/SortValidator style checks at any scale)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.functions.udf import sessionize
from hadoop_2_10_0_src_mapreduce_spark.operators.joins import asof_join

_BASE = dt.datetime(2024, 1, 1)

# (user, minutes-offset) event streams with heavy key collision
_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5000)),
    min_size=1,
    max_size=40,
)


def _naive_sessions(rows: list[tuple[int, int]], gap_minutes: int):
    """Reference sessionizer: per user, sorted, split on gap."""
    out = {}
    by_user: dict[int, list[int]] = {}
    for u, m in rows:
        by_user.setdefault(u, []).append(m)
    for u, ms in by_user.items():
        ms.sort()
        sid, n, start = 0, 0, ms[0]
        prev = ms[0]
        for m in ms:
            if m - prev > gap_minutes:
                out[(u, sid)] = (n, start, prev)
                sid, n, start = sid + 1, 0, m
            n += 1
            prev = m
        out[(u, sid)] = (n, start, prev)
    return out


@settings(max_examples=8, deadline=None)
@given(st.integers(1, 60), st.integers(1, 9))
def test_nline_exact_split_property(spark, tmp_path_factory, n_lines, per_split):
    """NLineInputFormat contract at any (file length, N): every
    partition holds exactly N lines except a final remainder, nothing
    lost/duplicated, splits are consecutive file ranges."""
    from hadoop_2_10_0_src_mapreduce_spark.sources.readers import read_text_lines

    p = str(tmp_path_factory.mktemp("nline_prop") / "f")
    spark.range(n_lines).select(
        F.format_string("%05d", "id").alias("value")
    ).coalesce(1).write.text(p)
    df = read_text_lines(spark, p, lines_per_split=per_split)
    parts = df.rdd.glom().collect()
    sizes = [len(pt) for pt in parts]
    full, rem = divmod(n_lines, per_split)
    assert sizes == [per_split] * full + ([rem] if rem else [])
    seen = [int(r[0]) for pt in parts for r in pt]
    assert seen == list(range(n_lines))


@settings(max_examples=10, deadline=None)
@given(_events)
def test_sessionize_matches_naive(spark, rows):
    gap = 60
    df = spark.createDataFrame(
        [(u, _BASE + dt.timedelta(minutes=m)) for u, m in rows],
        "user_id long, ts timestamp_ntz",
    )
    got = {
        (r.user_id, r.session_id): (
            r.n_events,
            int((r.start_ts - _BASE).total_seconds() // 60),
            int((r.end_ts - _BASE).total_seconds() // 60),
        )
        for r in sessionize(df, gap_minutes=gap).collect()
    }
    assert got == _naive_sessions(rows, gap)


_asof_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=25
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=0, max_size=25
)


@settings(max_examples=10, deadline=None)
@given(_asof_left, _asof_right)
def test_asof_join_matches_naive(spark, lrows, rrows):
    # unique (key, ts) on the right, as the operator contract requires
    rmap = {}
    for k, t in rrows:
        rmap[(k, t)] = float(k * 1000 + t)
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k long, ts long, rowid long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rmap.items()] or [(99, -1, 0.0)],
        "k long, ts long, v double",
    )
    got = {
        r.rowid: r.v
        for r in asof_join(left, right, ["k"], left_ts="ts", right_ts="ts").collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, got[i], want)


def test_asof_join_null_payload_not_backfilled(spark):
    """Regression: every payload column must come from the SAME matched
    right row — a NULL field in the matched row stays NULL instead of
    being backfilled from an older right row (the per-column-carry bug)."""
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 1, "old-a", "old-b"), (1, 5, None, "new-b")],
        "k long, ts long, a string, b string",
    )
    row = asof_join(left, right, ["k"]).collect()[0]
    assert (row.a, row.b) == (None, "new-b")


@settings(max_examples=8, deadline=None)
@given(_events)
def test_sessionize_matches_naive_across_arrow_batches(spark, rows):
    """Regression: the cross-batch carry must emit a carried session
    that the next batch CLOSES (5-row Arrow batches force many
    batch-boundary transitions that default batching never exercises)."""
    gap = 60
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        df = spark.createDataFrame(
            [(u, _BASE + dt.timedelta(minutes=m)) for u, m in rows],
            "user_id long, ts timestamp_ntz",
        )
        got = {
            (r.user_id, r.session_id): (
                r.n_events,
                int((r.start_ts - _BASE).total_seconds() // 60),
                int((r.end_ts - _BASE).total_seconds() // 60),
            )
            for r in sessionize(df, gap_minutes=gap).collect()
        }
        assert got == _naive_sessions(rows, gap)
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=18,
)


@settings(max_examples=8, deadline=None)
@given(_edges)
def test_duplicate_components_match_union_find(spark, edges):
    """Property: min-label propagation must agree with a driver-side
    union-find on arbitrary small graphs (chains, cliques, forests,
    parallel/duplicate edges, both orientations)."""
    from hadoop_2_10_0_src_mapreduce_spark.operators.dedup import (
        duplicate_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}
    # canonicalize: representative = min id of the component
    comp: dict[int, list[int]] = {}
    for x, r in expected.items():
        comp.setdefault(find(r), []).append(x)
    expected = {x: min(members) for r, members in comp.items() for x in members}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.id: r.rep for r in duplicate_components(df).collect()}
    assert got == expected


# words drawn from a tiny vocabulary → heavy duplicate fingerprints
_doc_texts = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
             min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=24,
)


@given(texts=_doc_texts, split=st.integers(0, 24))
@settings(max_examples=12, deadline=None)
def test_incremental_exact_dedup_chaining_property(spark, texts, split):
    """For ANY corpus and ANY split point: folding the tail batch into
    the head's index equals one exact_dedup over everything — the
    incremental invariant under adversarial duplicate density."""
    from hadoop_2_10_0_src_mapreduce_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    split = min(split, len(rows))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    head = docs.where(F.col("doc_id") < split)
    tail = docs.where(F.col("doc_id") >= split)
    merged = incremental_exact_dedup(
        tail, "text", "doc_id", exact_dedup(head, "text", "doc_id")
    )
    full = exact_dedup(docs, "text", "doc_id")
    key = lambda df: {(r.fp, r.keeper, r.n_copies) for r in df.collect()}
    assert key(merged) == key(full)


@given(
    sizes=st.lists(st.integers(1, 12), min_size=1, max_size=30),
    target=st.integers(4, 20),
)
@settings(max_examples=12, deadline=None)
def test_packing_bins_bound_property(spark, sizes, target):
    """For ANY document sizes and target: every bin's token total is at
    most target + its boundary-crossing (last) document's tokens, ids
    stay in sequential order, and every doc lands in exactly one bin."""
    from hadoop_2_10_0_src_mapreduce_spark.pipeline import assign_packing_bins

    rows = [(i, "w " * n, "s") for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = assign_packing_bins(
        docs, target_tokens=target, shard_col="src"
    ).collect()
    assert len(out) == len(sizes)
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault(r.bin, []).append(r)
    prev_max = -1
    for b in sorted(by_bin):
        members = sorted(by_bin[b], key=lambda r: r.doc_id)
        total = sum(r.n_tokens for r in members)
        assert total <= target + members[-1].n_tokens
        # contiguity: bins partition the id sequence in order
        assert members[0].doc_id == prev_max + 1
        prev_max = members[-1].doc_id


@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True),
    weights=st.lists(st.floats(0.05, 10.0), min_size=1, max_size=5),
)
@settings(max_examples=12, deadline=None)
def test_split_assign_partition_property(spark, ids, weights):
    """Every id gets exactly one split label, the label matches the
    naive md5-interval computation, and membership depends on the id
    alone (subset invariance is implied)."""
    import hashlib

    from hadoop_2_10_0_src_mapreduce_spark.pipeline import split_corpus

    w = {f"s{i}": wt for i, wt in enumerate(weights)}
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {r.doc_id: r.split for r in split_corpus(df, w).collect()}
    assert set(got) == set(ids)

    total = sum(w.values())
    names = list(w)
    for i in ids:
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        acc, want = 0.0, names[-1]
        for name in names[:-1]:
            acc += w[name] / total
            if u < acc:
                want = name
                break
        assert got[i] == want, (i, u, got[i], want)


@given(
    seed_texts=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=12),
        min_size=1,
        max_size=8,
    ),
    extra=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=12),
        max_size=4,
    ),
)
@settings(max_examples=10, deadline=None)
def test_contaminated_ids_monotone_in_eval_set(spark, seed_texts, extra):
    """Growing the eval set can only grow the contaminated set, and a
    train doc equal to an eval doc is always flagged (≥ n tokens)."""
    from hadoop_2_10_0_src_mapreduce_spark.operators.dedup import (
        contaminated_ids,
    )

    texts = [" ".join(t) for t in seed_texts]
    extra_texts = [" ".join(t) for t in extra]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    ev_small = spark.createDataFrame([(100, texts[0])], ["doc_id", "text"])
    flagged_small = {
        r.id for r in contaminated_ids(train, ev_small, "text", "doc_id", n=3).collect()
    }
    assert 0 in flagged_small  # self-overlap always flags

    ev_rows = [(100, texts[0])] + [(200 + i, t) for i, t in enumerate(extra_texts)]
    ev_big = spark.createDataFrame(ev_rows, ["doc_id", "text"])
    flagged_big = {
        r.id for r in contaminated_ids(train, ev_big, "text", "doc_id", n=3).collect()
    }
    assert flagged_small <= flagged_big


# range_join: adversarial points/intervals incl. negatives, empties,
# inversions, boundary-exact values, and fractional bin widths
_points = st.lists(
    st.integers(-40, 40).map(lambda v: v / 2.0), min_size=1, max_size=15
)
_intervals = st.lists(
    st.tuples(
        st.integers(-40, 40).map(lambda v: v / 2.0),
        st.integers(-40, 40).map(lambda v: v / 2.0),
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(_points, _intervals, st.sampled_from([0.75, 2.0, 9.0]), st.sampled_from(["left", "both"]))
def test_range_join_equals_naive_reference(spark, points, intervals, bw, closed):
    from hadoop_2_10_0_src_mapreduce_spark.operators.joins import range_join

    facts = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "fid long, p double"
    )
    ivals = spark.createDataFrame(
        [(j, lo, hi) for j, (lo, hi) in enumerate(intervals)],
        "iid long, lo double, hi double",
    )
    got = {
        (r.fid, r.iid)
        for r in range_join(
            facts, ivals, "p", "lo", "hi", bin_width=bw, closed=closed
        ).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, hi) in enumerate(intervals)
        if (lo <= p <= hi if closed == "both" else lo <= p < hi)
    }
    assert got == want


# cogroup_reduce: random two-sided keyed data with heavy key collision
# and one-sided keys — the reducer's view must reconstruct exactly the
# naive per-key partition of both inputs, sorted where asked
_coleft = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-50, 50)), max_size=25
)
_coright = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-50, 50)), max_size=25
)


@settings(max_examples=8, deadline=None)
@given(_coleft, _coright)
def test_cogroup_reduce_reconstructs_naive_per_key_partition(
    spark, left_rows, right_rows
):
    from hadoop_2_10_0_src_mapreduce_spark.functions.udf import cogroup_reduce

    left = spark.createDataFrame(left_rows, "k long, v long") if left_rows \
        else spark.createDataFrame([], "k long, v long")
    right = spark.createDataFrame(right_rows, "k long, w long") if right_rows \
        else spark.createDataFrame([], "k long, w long")

    def fn(key, l, r):
        # summarize each side's (sorted) values so equality proves both
        # membership AND the secondary-sort contract
        return pd.DataFrame(
            {
                "k": [key[0]],
                "lsig": [",".join(map(str, l["v"]))],
                "rsig": [",".join(map(str, sorted(r["w"])))],
            }
        )

    got = {
        r.k: (r.lsig, r.rsig)
        for r in cogroup_reduce(
            left, right, ["k"], fn, "k long, lsig string, rsig string",
            left_order=["v"],
        ).collect()
    }
    by_l: dict[int, list[int]] = {}
    by_r: dict[int, list[int]] = {}
    for k, v in left_rows:
        by_l.setdefault(k, []).append(v)
    for k, w in right_rows:
        by_r.setdefault(k, []).append(w)
    want = {
        k: (
            ",".join(map(str, sorted(by_l.get(k, [])))),
            ",".join(map(str, sorted(by_r.get(k, [])))),
        )
        for k in set(by_l) | set(by_r)
    }
    assert got == want


# rolling_metrics: random per-series values vs a pandas reference
_series_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 100)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),  # one value per (series, bucket)
)


@settings(max_examples=8, deadline=None)
@given(_series_rows)
def test_rolling_metrics_equal_pandas_reference(spark, rows):
    from hadoop_2_10_0_src_mapreduce_spark.operators.timeseries import (
        rolling_metrics,
    )

    df = spark.createDataFrame(rows, "k long, t long, n long")
    got = {
        (r.k, r.t): (r.lag1, r.mavg3, r.cume, r.prank)
        for r in rolling_metrics(
            df, part_col="k", order_col="t", value_col="n"
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "t", "n"]).sort_values(["k", "t"])
    for k, g in pdf.groupby("k"):
        v = g["n"].astype(float)
        lag1 = v.shift(1)
        mavg = v.rolling(3, min_periods=1).mean().round(6)
        cume = v.cumsum()
        # percent_rank = (rank-1)/(n-1), min-rank over value ties
        rk = v.rank(method="min")
        pr = ((rk - 1) / max(len(v) - 1, 1)).round(6)
        for i, t in enumerate(g["t"]):
            gl, gm, gc, gp = got[(k, t)]
            assert (gl is None) == pd.isna(lag1.iloc[i])
            if gl is not None:
                assert gl == lag1.iloc[i]
            assert gm == mavg.iloc[i] and gc == cume.iloc[i]
            assert gp == pr.iloc[i]


# --- cut_repeated_spans: subsequence + removal properties --------------
# random per-doc unique prefixes/suffixes around a shared run whose
# length hypothesis controls; the cutter must (a) emit a SUBSEQUENCE of
# each input token stream (it only deletes, never reorders/invents),
# (b) remove every occurrence of a shared run meeting the length floor,
# (c) leave docs untouched when the run is below the floor.

_span_words = st.integers(0, 8)


@settings(max_examples=8, deadline=None)
@given(
    run_len=st.integers(4, 24),
    floor=st.integers(6, 18),
    pre_a=_span_words, post_a=_span_words,
    pre_b=_span_words, post_b=_span_words,
)
def test_cut_spans_subsequence_and_removal(
    spark, run_len, floor, pre_a, post_a, pre_b, post_b
):
    from hadoop_2_10_0_src_mapreduce_spark.operators.dedup import (
        cut_repeated_spans,
    )

    k = 3
    run = " ".join(f"shared{i}" for i in range(run_len))
    mk = lambda tag, pre, post: " ".join(
        [f"{tag}pre{i}" for i in range(pre)]
        + [run]
        + [f"{tag}post{i}" for i in range(post)]
    )
    texts = {1: mk("a", pre_a, post_a), 2: mk("b", pre_b, post_b)}
    docs = spark.createDataFrame(
        list(texts.items()), ["doc_id", "text"]
    )
    out = {
        r.id: r.text.split() if r.text else []
        for r in cut_repeated_spans(
            docs, "text", "doc_id", k=k, min_span_tokens=floor
        ).collect()
    }
    for i, text in texts.items():
        toks = text.split()
        got = out[i]
        # (a) subsequence of the input tokens
        it = iter(toks)
        assert all(any(t == u for u in it) for t in got), (toks, got)
        # a fully-shared run of L tokens yields one maximal span of
        # exactly L tokens (L−k+1 flagged positions, +k−1), so the cut
        # fires iff L ≥ max(floor, k)
        if run_len >= max(floor, k):
            # (b) the shared run is gone entirely, and ONLY the run:
            # unique pre/post tokens all survive
            assert sum(1 for t in got if t.startswith("shared")) == 0
            assert len(got) == len(toks) - run_len
        else:
            # (c) below the floor: untouched
            assert got == toks


# --- drop_boilerplate_lines vs a naive reference -----------------------
# random docs assembled from a small line pool (heavy collision);
# the operator must equal the single-process reference exactly: count
# line occurrences by distinct doc over the trimmed/ws-normalized
# form, drop lines at/over the threshold (unless under the length
# floor), preserve everything else byte-for-byte in order.

_line_pool = st.sampled_from([
    "shared cookie banner line alpha",
    "shared cookie banner line beta",
    "an uncommon sentence about topic %d",
    "short",
    "  padded   whitespace   line  ",
])


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.tuples(_line_pool, st.integers(0, 9)), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(2, 4),
)
def test_drop_boilerplate_lines_matches_naive(spark, docs, min_docs):
    import re

    from hadoop_2_10_0_src_mapreduce_spark.operators.dedup import (
        drop_boilerplate_lines,
    )

    rendered = [
        "\n".join(tpl % n if "%d" in tpl else tpl for tpl, n in lines)
        for lines in docs
    ]
    norm = lambda line: re.sub(r"\s+", " ", line.strip())
    counts: dict[str, set[int]] = {}
    for i, text in enumerate(rendered):
        for line in text.split("\n"):
            if len(line.strip()) >= 10:
                counts.setdefault(norm(line), set()).add(i)
    hot = {k for k, v in counts.items() if len(v) >= min_docs}
    expected = {
        i: "\n".join(
            line for line in text.split("\n")
            if not (len(line.strip()) >= 10 and norm(line) in hot)
        )
        for i, text in enumerate(rendered)
    }

    df = spark.createDataFrame(list(enumerate(rendered)), ["doc_id", "text"])
    got = {
        r.id: r.text
        for r in drop_boilerplate_lines(
            df, "text", "doc_id", min_docs=min_docs
        ).collect()
    }
    assert got == expected


def _naive_chunks(tokens: list[str], max_tokens: int, overlap: int):
    """Reference chunker: sliding windows of max_tokens advancing by
    stride until the stream is covered."""
    if not tokens:
        return []
    stride = max_tokens - overlap
    out = []
    start = 0
    while True:
        out.append(tokens[start:start + max_tokens])
        if start + max_tokens >= len(tokens):
            return out
        start += stride


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 200), min_size=0, max_size=12),
    st.integers(2, 16),
    st.integers(0, 8),
)
def test_chunk_documents_matches_naive_reference(
    spark, doc_lens, max_tokens, overlap
):
    """chunk_documents == the naive sliding-window chunker for every
    (corpus shape, max_tokens, overlap) combination: same chunk count,
    same token content per (doc, idx), docs shorter than the budget
    pass through whole, empty docs vanish."""
    from hadoop_2_10_0_src_mapreduce_spark.pipeline import chunk_documents

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    corpus = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(doc_lens)]
    expected = {}
    for i, text in corpus:
        for ci, toks in enumerate(_naive_chunks(text.split(), max_tokens, overlap)):
            expected[(i, ci)] = " ".join(toks)
    docs = spark.createDataFrame(corpus or [(0, "")], ["doc_id", "text"])
    got = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in chunk_documents(
            docs, max_tokens=max_tokens, overlap=overlap
        ).collect()
        if corpus
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-50, 200), st.integers(0, 60)),
        min_size=1, max_size=15,
    ),
    st.lists(
        st.tuples(st.integers(-50, 200), st.integers(0, 60)),
        min_size=1, max_size=15,
    ),
    st.sampled_from([3.0, 7.5, 25.0, 100.0]),
)
def test_interval_join_property_vs_naive(spark, lspec, rspec, bin_width):
    """interval_join == the naive O(n·m) overlap scan for arbitrary
    interval sets (including zero-length and many-bin spans) at every
    bin width, with no duplicate pairs."""
    from hadoop_2_10_0_src_mapreduce_spark.operators.joins import interval_join

    L = [(i, float(lo), float(lo + ln)) for i, (lo, ln) in enumerate(lspec)]
    R = [(j, float(lo), float(lo + ln)) for j, (lo, ln) in enumerate(rspec)]
    left = spark.createDataFrame(L, "lid long, llo double, lhi double")
    right = spark.createDataFrame(R, "rid long, rlo double, rhi double")
    got = [
        (r.lid, r.rid)
        for r in interval_join(
            left, right, "llo", "lhi", "rlo", "rhi", bin_width=bin_width
        ).collect()
    ]
    want = sorted(
        (i, j)
        for i, alo, ahi in L
        for j, blo, bhi in R
        if alo < ahi and blo < bhi and alo < bhi and blo < ahi
    )
    assert sorted(got) == want
    assert len(got) == len(set(got))


def _naive_funnel(rows, stages, max_gap=None):
    """Reference funnel: per user, chain earliest-qualifying events."""
    out = {}
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, m, et in rows:
        by_user.setdefault(u, []).append((m, et))
    for u, evs in by_user.items():
        prev = None
        ts_chain = []
        for st in stages:
            cands = [
                m for m, et in evs
                if et == st
                and (prev is None or m > prev)
                and (prev is None or max_gap is None or m <= prev + max_gap)
            ]
            if not cands:
                break
            prev = min(cands)
            ts_chain.append(prev)
        if ts_chain:
            out[u] = (len(ts_chain), ts_chain[0], ts_chain[-1])
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 300),
                  st.sampled_from(["a", "b", "c", "x"])),
        min_size=1, max_size=50,
    ),
    st.sampled_from([None, 30, 120]),
)
def test_funnel_matches_naive_reference(spark, rows, max_gap):
    """funnel == a per-user naive chained-earliest scan for arbitrary
    event streams (heavy key collision, out-of-order stages, noise
    types, duplicate timestamps) with and without the conversion
    window."""
    from hadoop_2_10_0_src_mapreduce_spark.operators.timeseries import funnel

    ev = spark.createDataFrame(
        [(u, _BASE + dt.timedelta(minutes=m), et) for u, m, et in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r.user_id: (
            r.stages_completed,
            r.start_ts,
            r.end_ts,
        )
        for r in funnel(
            ev, ["a", "b", "c"], max_gap_minutes=max_gap
        ).collect()
    }
    want = {
        u: (d, _BASE + dt.timedelta(minutes=s), _BASE + dt.timedelta(minutes=e))
        for u, (d, s, e) in _naive_funnel(rows, ["a", "b", "c"], max_gap).items()
    }
    assert got == want


def _naive_funnel_any(rows, stages, max_gap=None):
    """Reference EXISTS-A-CHAIN funnel: per-user reachability DP —
    stage-k events reachable from any reachable stage-(k−1) event
    strictly before them and within the gap."""
    out = {}
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, m, et in rows:
        by_user.setdefault(u, []).append((m, et))
    for u, evs in by_user.items():
        reach = [m for m, et in evs if et == stages[0]]
        if not reach:
            continue
        mins = [min(reach)]
        for st in stages[1:]:
            nxt = [
                m for m, et in evs
                if et == st and any(
                    p < m and (max_gap is None or m <= p + max_gap)
                    for p in reach
                )
            ]
            if not nxt:
                break
            mins.append(min(nxt))
            reach = nxt
        out[u] = (len(mins), mins[0], mins[-1])
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 300),
                  st.sampled_from(["a", "b", "c", "x"])),
        min_size=1, max_size=50,
    ),
    st.sampled_from([None, 30, 120]),
)
def test_funnel_any_anchor_matches_naive_dp(spark, rows, max_gap):
    """funnel(anchor="any") == a per-user reachability DP for
    arbitrary streams; and with NO gap it equals anchor="first"
    exactly (no gap ⇒ the earliest chain dominates every chain)."""
    from hadoop_2_10_0_src_mapreduce_spark.operators.timeseries import funnel

    ev = spark.createDataFrame(
        [(u, _BASE + dt.timedelta(minutes=m), et) for u, m, et in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r.user_id: (r.stages_completed, r.start_ts, r.end_ts)
        for r in funnel(
            ev, ["a", "b", "c"], max_gap_minutes=max_gap, anchor="any"
        ).collect()
    }
    want = {
        u: (d, _BASE + dt.timedelta(minutes=s), _BASE + dt.timedelta(minutes=e))
        for u, (d, s, e) in _naive_funnel_any(
            rows, ["a", "b", "c"], max_gap
        ).items()
    }
    assert got == want
    if max_gap is None:
        first = {
            r.user_id: (r.stages_completed, r.start_ts, r.end_ts)
            for r in funnel(ev, ["a", "b", "c"], anchor="first").collect()
        }
        assert got == first


def test_funnel_any_anchor_flips_planted_counterexample(spark):
    """The documented fixed-anchor counterexample (a@0, a@100, b@105,
    gap=30): anchor="first" stays depth 1 (the a@0 anchor never
    reaches b), anchor="any" finds the a@100→b@105 chain — depth 2,
    stage_ts reporting earliest-reachable per stage [0, 105]."""
    from hadoop_2_10_0_src_mapreduce_spark.operators.timeseries import funnel

    ev = spark.createDataFrame(
        [
            (1, _BASE + dt.timedelta(minutes=0), "a"),
            (1, _BASE + dt.timedelta(minutes=100), "a"),
            (1, _BASE + dt.timedelta(minutes=105), "b"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    first = funnel(ev, ["a", "b"], max_gap_minutes=30).first()
    assert first.stages_completed == 1
    anyr = funnel(ev, ["a", "b"], max_gap_minutes=30, anchor="any").first()
    assert anyr.stages_completed == 2
    assert anyr.stage_ts[0] == _BASE
    assert anyr.stage_ts[1] == _BASE + dt.timedelta(minutes=105)
    with pytest.raises(ValueError, match="anchor"):
        funnel(ev, ["a", "b"], anchor="weird")
