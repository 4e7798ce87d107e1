#!/usr/bin/env python
"""Embeddings-only scale probes for the ANN-vs-brute crossover measurement.

Brute-force cosine top-k is O(n^2) FLOPs but rides BLAS; LSH/IVF candidate
volume is O(n x probes x bucket). The crossover point where the bucketed
paths WIN is an empirical constant of this implementation — this tool
builds the corpora to measure it (round-4 verdict #2).

Each decade is `copies` orthogonal-transform copies of the sf0.1
embeddings (seeded dimension permutation + sign flips per copy): norms and
all within-copy pairwise sims are preserved exactly, cross-copy sims are
~random — so every copy keeps a realistic neighbor structure and LSH
bucket occupancy scales the way a real 10x corpus would.

Usage:
    python tools/make_ann_probe.py /tmp/ann_sf1 10     # 20k vectors
    python tools/make_ann_probe.py /tmp/ann_sf10 100   # 200k vectors
    python tools/make_ann_probe.py /tmp/ann_clustered 100 clustered
        # 200k vectors in 1000 Gaussian clusters — the IVF-FAVORABLE
        # regime (real embedding corpora cluster; the orthogonal-copy
        # probe is the k-means-hostile worst case)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"


def make_clustered(outdir: str, copies: int) -> None:
    """n = copies x 2000 vectors drawn from 1000 isotropic Gaussian
    clusters (sigma 0.25 around unit-norm centers): nearest neighbors are
    overwhelmingly intra-cluster, the regime IVF's coarse quantizer is
    built for."""
    rng = np.random.default_rng(7)
    n = copies * 2000
    n_clusters = 1000
    dim = 64
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + 0.25 * rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "label": pa.array(assign.astype("int64")),
            "embedding": pa.array(pts.tolist(), type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, f"{outdir}/embeddings.parquet", row_group_size=65536)
    print(f"embeddings: {n} clustered ({n_clusters} gaussians) at {outdir}")


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(outdir, exist_ok=True)
    if len(sys.argv) > 3 and sys.argv[3] == "clustered":
        make_clustered(outdir, copies)
        return

    base = pq.read_table(SRC)
    n = base.num_rows
    stride = 10
    while stride <= n * copies:
        stride *= 10
    embs = np.array(base["embedding"].to_pylist(), dtype=np.float32)
    dim = embs.shape[1]

    parts = []
    for k in range(copies):
        t = base
        if k > 0:
            rng = np.random.default_rng(42 + k)
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            out = embs[:, perm] * signs[None, :]
            arr = pa.array(out.tolist(), type=pa.list_(pa.float32()))
            t = t.set_column(t.column_names.index("embedding"), "embedding", arr)
            vid = pc.add(t["vec_id"], pa.scalar(k * stride, type=t["vec_id"].type))
            t = t.set_column(t.column_names.index("vec_id"), "vec_id", vid)
        parts.append(t)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{outdir}/embeddings.parquet", row_group_size=65536)
    print(f"embeddings: {n} -> {out.num_rows} at {outdir}")


if __name__ == "__main__":
    main()
