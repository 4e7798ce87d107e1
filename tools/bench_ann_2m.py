#!/usr/bin/env python
"""Measure the persisted-IVF vs brute serving crossover at 2M vectors.

Round-6 verdict item 4: SCALING.md projected the brute->IVF crossover at
2-5M vectors but the largest measured corpus was 200k. This tool measures
the crossover actually happening (or not) on a >=2M clustered corpus:

    python tools/make_ann_probe.py /tmp/ann_2m 1000 clustered
    python tools/bench_ann_2m.py [corpus=/tmp/ann_2m] [index=/tmp/ivf_2m]

Protocol (the SCALING.md round-6 serving methodology, one decade up):
- build the persisted index once (timed: the amortization denominator);
  n_cells ~ sqrt(n), n_assign=3 (the recall lever the indexed recall
  check certifies).
- query batches of 1 / 100 / 1000 vectors (hash-sampled from the corpus):
  brute = one broadcast-matmul pass against all n candidates
  (_brute_topk_one_chunk — the exact path ann_lsh_topk auto-routes to
  below the crossover); IVF = ann_ivf_query at several n_probe settings.
- recall@5 of each IVF config vs the brute ground truth on the largest
  batch; a config only counts as "winning" if recall >= 0.9 (the
  ann_ivf_indexed_recall_check floor).

Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_2m"
INDEX = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ivf_2m"
K = 5


def main() -> None:
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.operators import similarity as S
    from symat_hbase_tools_spark.session import get_spark
    from symat_hbase_tools_spark.sources.tables import load_table

    spark = get_spark("ann-2m-bench")
    emb = load_table(spark, CORPUS, "embeddings")
    n = emb.count()
    n_cells = max(16, int(n**0.5))
    out: dict = {"n": n, "n_cells": n_cells, "k": K}

    if not os.path.exists(f"{INDEX}/centroids"):
        t0 = time.perf_counter()
        S.build_ivf_index(spark, CORPUS, INDEX, n_cells=n_cells, n_assign=3)
        out["build_sec"] = round(time.perf_counter() - t0, 1)
    else:
        out["build_sec"] = "cached"

    # deterministic query batches: hash-spread across the corpus (the
    # adversarial spread shape for directory pruning — see SCALING.md)
    def batch(size: int):
        return (
            emb.withColumn("h", F.pmod(F.xxhash64("vec_id"), F.lit(50261)))
            .orderBy("h", "vec_id")
            .limit(size)
            .select("vec_id", "embedding")
        )

    batches = {b: batch(b).persist() for b in (1, 100, 1000)}
    for df in batches.values():
        df.count()

    results: dict[str, dict] = {}
    truth_rows = None
    for bsize, q in batches.items():
        t0 = time.perf_counter()
        rows = S._brute_topk_one_chunk(spark, q, emb, K).collect()
        dt = time.perf_counter() - t0
        results.setdefault("brute", {})[str(bsize)] = round(dt, 1)
        if bsize == 1000:
            truth_rows = {(r["query_id"], r["neighbor_id"]) for r in rows}
        print(f"# brute batch={bsize}: {dt:.1f}s ({len(rows)} rows)", file=sys.stderr)

    for n_probe in (16, 64, n_cells // 4):
        for bsize, q in batches.items():
            t0 = time.perf_counter()
            rows = S.ann_ivf_query(spark, INDEX, q, k=K, n_probe=n_probe).collect()
            dt = time.perf_counter() - t0
            results.setdefault(f"ivf_probe{n_probe}", {})[str(bsize)] = round(dt, 1)
            if bsize == 1000 and truth_rows:
                got = {(r["query_id"], r["neighbor_id"]) for r in rows}
                rec = len(got & truth_rows) / max(len(truth_rows), 1)
                results[f"ivf_probe{n_probe}"]["recall@5"] = round(rec, 3)
            print(
                f"# ivf probe={n_probe} batch={bsize}: {dt:.1f}s",
                file=sys.stderr,
            )

    out["results"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
