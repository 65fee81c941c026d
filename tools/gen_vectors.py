"""Synthetic embedding corpus generator — reproduces the SURVEY §8
large-scale ANN measurements (the fixture tables stop at 21k vectors;
this makes the 200k+ corpora the ann_bench numbers cite).

Shape matches the fixture embeddings (vec_id long, embedding
array<float> unit-norm, label int): ``n_clusters`` unit centroids,
each vector = 0.5·centroid + N(0,1) noise, renormalized — clustered
enough that IVF routing means something, noisy enough to be hard.
Deterministic (fixed seed).

Usage:  python tools/gen_vectors.py OUT_DIR [N] [DIM] [N_CLUSTERS]
Writes OUT_DIR/embeddings.parquet (the layout ann_bench expects).
Example: python tools/gen_vectors.py /tmp/vec200k 200000
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_cl = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)
    cents = rng.randn(n_cl, dim)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.randint(0, n_cl, n)
    mat = cents[labels] * 0.5 + rng.randn(n, dim)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                list(mat.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"wrote {n} x {dim} vectors ({n_cl} clusters) to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
