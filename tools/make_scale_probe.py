#!/usr/bin/env python
"""Derive a 10x scale probe (sf1) from the driver's read-only sf0.1 tables.

The driver generates sf{0.001,0.01,0.1}; scaling exponents need one more
decade. This tool builds /tmp/sf1_probe without touching /root/testdata:

* relational tables — 10 key-shifted copies (every FK/PK offset by
  copy * stride), so joins keep exactly the same selectivity and the row
  counts scale 10x. nation/region are genuine dimensions and stay as-is.
* events — 10 copies with user/session ids shifted; timestamps untouched
  (the stream's time-window density grows 10x, like a 10x-traffic site).
* documents — 10 copies; copy k > 0 suffixes every token with k
  (vocabulary remap). Length distribution, Zipf shape and the planted
  near-dup structure survive per copy, while cross-copy shingle overlap is
  zero — so dedup candidate counts scale linearly, not quadratically, and
  a super-linear bench time really is an engine problem, not a
  data-construction artifact.
* embeddings — 10 copies; copy k applies a fixed seeded dimension
  permutation + sign-flip pattern (an orthogonal transform: norms and all
  within-copy pairwise sims preserved exactly; cross-copy sims ~ random).

Deterministic throughout (seed 42). Usage:

    python tools/make_scale_probe.py [outdir=/tmp/sf1_probe] [copies=10]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

#: key DOMAINS: every (table, column) referring to the same identifier must
#: shift by the SAME per-domain stride, or copy-k foreign keys point at
#: copy-k' rows and every join silently empties
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}

KEYED_TABLES = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

PASSTHROUGH = ["region", "nation"]


def domain_strides(tables: dict[str, pa.Table]) -> dict[tuple[str, str], int]:
    """(table, column) -> stride: a round power of ten above the domain max."""
    out: dict[tuple[str, str], int] = {}
    for members in DOMAINS.values():
        m = 0
        for tname, col in members:
            if col in tables[tname].column_names:
                m = max(m, pc.max(tables[tname][col]).as_py() or 0)
        s = 10
        while s <= m:
            s *= 10
        for member in members:
            out[member] = s
    return out


def remap_documents(tbl: pa.Table, k: int) -> pa.Table:
    texts = tbl["text"].to_pylist()
    suff = str(k)
    out = [re.sub(r"([a-z]+)", rf"\g<1>{suff}", t) for t in texts]
    arr = pa.array(out, type=pa.string())
    n_chars = pa.array([len(t) for t in out], type=pa.int64())
    tbl = tbl.set_column(tbl.column_names.index("text"), "text", arr)
    return tbl.set_column(tbl.column_names.index("n_chars"), "n_chars", n_chars)


def transform_embeddings(tbl: pa.Table, k: int, rng: np.random.Generator) -> pa.Table:
    embs = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    dim = embs.shape[1]
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    out = embs[:, perm] * signs[None, :]
    arr = pa.array(out.tolist(), type=pa.list_(pa.float32()))
    return tbl.set_column(tbl.column_names.index("embedding"), "embedding", arr)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(outdir, exist_ok=True)

    for name in PASSTHROUGH:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{outdir}/{name}.parquet", row_group_size=65536)
        print(f"{name}: passthrough {t.num_rows}")

    tables = {n: pq.read_table(f"{SRC}/{n}.parquet") for n in KEYED_TABLES}
    strides = domain_strides(tables)
    for name in KEYED_TABLES:
        base = tables[name]
        cols = [c for (t, c) in strides if t == name and c in base.column_names]
        parts = []
        for k in range(copies):
            t = base
            if k > 0:
                for c in cols:
                    shifted = pc.add(
                        t[c], pa.scalar(k * strides[(name, c)], type=t[c].type)
                    )
                    t = t.set_column(t.column_names.index(c), c, shifted)
                if name == "documents":
                    t = remap_documents(t, k)
                if name == "embeddings":
                    rng = np.random.default_rng(42 + k)
                    t = transform_embeddings(t, k, rng)
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{outdir}/{name}.parquet", row_group_size=65536)
        info = {c: strides[(name, c)] for c in cols}
        print(f"{name}: {base.num_rows} -> {out.num_rows} (strides {info})")


if __name__ == "__main__":
    main()
