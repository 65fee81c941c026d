"""Synthetic DOCUMENT corpus generator for the dedup-family decade check
— the text twin of tools/gen_vectors.py (SURVEY §8: the ANN decade jumps
found a real defect both times; this gives the dedup operators the same
hunt at ~10× the sf1 fixture's 50k docs).

Layout matches the fixture documents table (doc_id long, text, lang,
source, n_chars) so every dedup operator runs unmodified. Unlike the
sf fixtures' 30-token vocab (which at 500k docs would make EVERY
3-gram a stop-shingle — a vocab artifact, not a scale measurement),
the background here is a ~10k-word Zipfian vocab: background docs are
essentially all unique, so pair volume comes from the PLANTED
structure below, each group chosen to stress a specific suspect:

  - near clusters:  N_NEAR_CL cliques of 5 (base + 4 copies differing
    from the base in ONE token at a shared position) — every pair
    differs in ≤1 position, so 3-gram Jaccard ≥ ~0.90: the bread-and-
    butter near-dup signal; recall is checkable exactly.
  - exact clusters: N_EX_CL groups of 4 byte-identical docs (J = 1).
  - MEGA cluster:   one ~MEGA_FRAC·N near-dup cluster (200 one-edit
    variants of an 80-token base, each replicated) — the realistic
    boilerplate pile-up. All-pairs semantics owes C(m,2) ≈ 2·10⁸
    pairs at m=20k: the planted bomb for banded candidate volume.
  - chain:          CHAIN_LEN docs sliding a 60-token window by 4 over
    one token stream — adjacent Jaccard ≈ 0.87 (edge), skip-one
    ≈ 0.76 (non-edge at t=0.8), so the pair graph is a PATH of
    diameter CHAIN_LEN−1: the planted bomb for label-propagation
    round counts.

Ground truth (id ranges per group + expected pair counts at t=0.8,
k=3) is written to OUT_DIR/truth.json; tools/dedup_decade.py reads it.
Deterministic (fixed seed).

Usage:  python tools/gen_docs.py OUT_DIR [N]
Writes OUT_DIR/documents.parquet + OUT_DIR/truth.json.
Example: python tools/gen_docs.py /root/repo/fixtures/docs500k 500000
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_N = 10_000
N_NEAR_CL, NEAR_SZ = 2_000, 5
N_EX_CL, EX_SZ = 500, 4
MEGA_VARIANTS = 200
CHAIN_LEN, CHAIN_W, CHAIN_S = 256, 60, 4
LANGS = ["de", "en", "es", "fr", "zh"]


def _zipf_tokens(rng: np.random.Generator, n: int, vocab: np.ndarray) -> np.ndarray:
    """n token draws from a Zipf-ish distribution over the vocab
    (p_i ∝ 1/(i+10)) via inverse-CDF searchsorted — fast at 10⁷ draws."""
    w = 1.0 / (np.arange(len(vocab)) + 10.0)
    cdf = np.cumsum(w / w.sum())
    return vocab[np.searchsorted(cdf, rng.random(n))]


def generate(out_dir: str, n_total: int) -> dict:
    rng = np.random.default_rng(SEED)
    vocab = np.array([f"w{i:05d}" for i in range(VOCAB_N)])

    mega_sz = MEGA_VARIANTS * max(1, int(round(n_total * 0.04 / MEGA_VARIANTS)))
    n_planted = N_NEAR_CL * NEAR_SZ + N_EX_CL * EX_SZ + mega_sz + CHAIN_LEN
    n_bg = n_total - n_planted
    assert n_bg > 0, "corpus too small for the planted structure"

    texts: list[str] = []

    # background: unique word salad, 10..100 Zipf tokens
    lens = rng.integers(10, 101, n_bg)
    pool = _zipf_tokens(rng, int(lens.sum()), vocab)
    off = 0
    for ln in lens:
        texts.append(" ".join(pool[off:off + ln]))
        off += ln

    truth: dict = {"n_total": n_total, "threshold": 0.8, "k": 3}

    # near clusters: base + copies substituting ONE shared position
    truth["near"] = {"start": len(texts), "clusters": N_NEAR_CL, "size": NEAR_SZ}
    for _ in range(N_NEAR_CL):
        base = list(_zipf_tokens(rng, 60, vocab))
        p = int(rng.integers(3, 57))
        texts.append(" ".join(base))
        subs = rng.choice(vocab, NEAR_SZ, replace=False)
        for s in subs[:NEAR_SZ - 1]:
            cp = base.copy()
            cp[p] = str(s)
            texts.append(" ".join(cp))

    # exact clusters
    truth["exact"] = {"start": len(texts), "clusters": N_EX_CL, "size": EX_SZ}
    for _ in range(N_EX_CL):
        t = " ".join(_zipf_tokens(rng, 60, vocab))
        texts.extend([t] * EX_SZ)

    # MEGA cluster: 200 one-edit variants of one base, replicated
    truth["mega"] = {"start": len(texts), "size": mega_sz,
                     "variants": MEGA_VARIANTS}
    mbase = list(_zipf_tokens(rng, 80, vocab))
    reps = mega_sz // MEGA_VARIANTS
    msubs = rng.choice(vocab, MEGA_VARIANTS, replace=False)
    for v in range(MEGA_VARIANTS):
        cp = mbase.copy()
        cp[3 + (v % 60)] = str(msubs[v])
        texts.extend([" ".join(cp)] * reps)

    # chain: sliding window over one stream -> path graph
    truth["chain"] = {"start": len(texts), "len": CHAIN_LEN}
    stream = _zipf_tokens(rng, CHAIN_W + (CHAIN_LEN - 1) * CHAIN_S, vocab)
    for i in range(CHAIN_LEN):
        texts.append(" ".join(stream[i * CHAIN_S:i * CHAIN_S + CHAIN_W]))

    truth["expected_pairs_small"] = (
        N_NEAR_CL * NEAR_SZ * (NEAR_SZ - 1) // 2
        + N_EX_CL * EX_SZ * (EX_SZ - 1) // 2
        + CHAIN_LEN - 1
    )
    truth["mega_all_pairs"] = mega_sz * (mega_sz - 1) // 2

    n = len(texts)
    assert n == n_total, (n, n_total)
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    with open(os.path.join(out_dir, "truth.json"), "w") as f:
        json.dump(truth, f, indent=1)

    # self-check the planted Jaccard margins on ONE instance of each
    # group (python sets, the same distinct-3-gram semantics)
    def jac(a: str, b: str) -> float:
        def sh(t):
            w = t.split()
            return {tuple(w[i:i + 3]) for i in range(len(w) - 2)}
        sa, sb = sh(a), sh(b)
        return len(sa & sb) / len(sa | sb)

    ns = truth["near"]["start"]
    assert jac(texts[ns], texts[ns + 1]) >= 0.85          # base-copy
    assert jac(texts[ns + 1], texts[ns + 2]) >= 0.85      # copy-copy
    ms = truth["mega"]["start"]
    assert jac(texts[ms], texts[ms + reps]) >= 0.82       # variant pair
    cs = truth["chain"]["start"]
    assert jac(texts[cs], texts[cs + 1]) >= 0.8           # edge
    assert jac(texts[cs], texts[cs + 2]) < 0.8            # non-edge
    print(f"  documents: {n} rows (bg {n_bg}, mega {mega_sz}, "
          f"chain {CHAIN_LEN}); margins verified")
    return truth


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures/docs500k"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    print(f"generating {n} docs -> {out}")
    generate(out, n)
