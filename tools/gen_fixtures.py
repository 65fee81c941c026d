"""Deterministic fixture generator for scale factors beyond the driver's.

The driver ships sf{0.001,0.01,0.1} at /root/testdata (read-only). The
round-5 verdict asked for a full 50-query gate at sf1 — one more decade —
so this script extrapolates the SAME distributions (measured against the
driver fixtures with DuckDB; see SURVEY.md §8 r6) to any sf, seeded and
deterministic. The correctness gate is self-contained: tools/check_oracle.py
runs Spark and DuckDB against the SAME parquet files, so the gate does not
depend on matching the driver's exact RNG — only the distribution shapes
(which the queries' non-vacuity checks care about) need to hold:

  - lineitem 6M rows/sf1, 1..7 lines per order, shipdate = orderdate + 1..95d
  - events: exponential(mean 50) value, 5 uniform types, ~67 events/user
    over 30 days of Jan 2024 (sessionization density preserved)
  - documents: 10..100 words from the 30-token vocab, 5%% docs carry the
    rare 'dup' token, 0.16%% exact-duplicate pairs (8 pairs per 5k docs)
  - embeddings: unit-norm float32 d=64, 10 weak clusters
    (within-label mean cos ~= 0.018, matching the measured fixture)

Usage: python tools/gen_fixtures.py [sf] [out_dir]
Defaults: sf=1 out_dir=/root/repo/fixtures/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast row the "
    "agg key query a scan batch"
).split()  # 30 common tokens; 'dup' is the planted rare 31st

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
P_ADJ = "large hot blue green red small dark light shiny rusty".split()
P_NOUN = "ring bolt screw washer nut gear cog pin rod plate".split()
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]

US_PER_DAY = 86_400_000_000


def _ts_us(base_iso: str, us: np.ndarray) -> pa.Array:
    base = np.datetime64(base_iso, "us")
    return pa.array(base + us.astype("timedelta64[us]"), type=pa.timestamp("us"))


def write(out_dir: str, name: str, table: pa.Table) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    n_cust = max(150, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_ord = max(1500, int(1_500_000 * sf))
    n_evt = max(1000, int(1_000_000 * sf))
    n_user = max(150, int(15_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part)
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [f"{P_ADJ[i % 10]} {P_NOUN[(i // 10) % 10]}" for i in range(n_part)],
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 1),
    }))

    # orders: orderdate uniform 1995-01-01 .. 2001-08-01 (day-aligned us ts)
    ord_days = rng.integers(0, 2405, n_ord)  # 2405 days in that span
    o_custkey = rng.integers(0, n_cust, n_ord)
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(o_custkey, pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01T00:00:00", ord_days * US_PER_DAY),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: 1..7 lines per order (mean 4 -> ~4x orders rows)
    nlines = rng.integers(1, 8, n_ord)
    li_order = np.repeat(np.arange(n_ord), nlines)
    li_n = int(li_order.shape[0])
    linenumber = np.concatenate([np.arange(1, k + 1) for k in nlines])
    qty = rng.integers(1, 51, li_n).astype(np.float64)
    ship_days = np.repeat(ord_days, nlines) + rng.integers(1, 96, li_n)
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(li_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, li_n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, li_n), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, li_n), 2),
        "l_discount": np.round(rng.uniform(0, 0.10, li_n), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, li_n), 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, li_n)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, li_n)]),
        "l_shipdate": _ts_us("1995-01-01T00:00:00", ship_days * US_PER_DAY),
    }))

    # events: 30 days of Jan 2024, exponential(50) value, {"k": int} props
    evt_us = rng.integers(0, 30 * US_PER_DAY, n_evt)
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": _ts_us("2024-01-01T00:00:00", evt_us),
        "user_id": pa.array(rng.integers(0, n_user, n_evt), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: word salad over the 30-token vocab; 5% carry the rare
    # 'dup' token; 8 exact-duplicate pairs per 5k docs (0.16%)
    n_words = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        words = list(vocab[rng.integers(0, len(vocab), n_words[i])])
        if rng.random() < 0.05:
            words[int(rng.integers(0, len(words)))] = "dup"
            if rng.random() < 0.02 and len(words) > 1:
                words[int(rng.integers(0, len(words)))] = "dup"
        texts.append(" ".join(words))
    n_pairs = max(1, int(round(n_doc * 8 / 5000)))
    dup_to = rng.choice(n_doc, size=n_pairs * 2, replace=False)
    for j in range(n_pairs):
        texts[int(dup_to[2 * j + 1])] = texts[int(dup_to[2 * j])]
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n_doc)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm f32 d=64, 10 weak clusters. v ~ a*centroid + g,
    # g ~ N(0, I/d); a chosen so E[cos within-label] = a^2/(a^2+1) ~= 0.018.
    d = 64
    a = 0.135
    cent = rng.standard_normal((10, d))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    label = rng.integers(0, 10, n_emb)
    vecs = a * cent[label] + rng.standard_normal((n_emb, d)) / np.sqrt(d)
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/fixtures/sf1"
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
