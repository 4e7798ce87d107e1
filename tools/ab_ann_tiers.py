#!/usr/bin/env python
"""A/B/C of the flat vs composed ANN serving tiers at probe scale —
the committed, reproducible form of the round-14 SCALING.md table.

Tiers (all full self-search, k=5, serving path only — `.count()` on the
topk, no exact baseline inside the timing):

    bq     — flat binary quantization (`ann_bq_topk`): scans ALL vectors,
             asymmetric sign-bit first pass + in-kernel exact rescore.
    ivfpq  — IVF cell pruning + in-cell PQ-ADC + exact refine
             (`ann_ivfpq_topk`).
    ivfbq  — IVF cell pruning + packed sign-bit in-cell scan (16 B/member
             cogroup payload) + exact refine (`ann_ivfbq_topk`).

Usage:
    python tools/ab_ann_tiers.py bq    [sf_dir]
    python tools/ab_ann_tiers.py ivfpq [sf_dir]
    python tools/ab_ann_tiers.py ivfbq [sf_dir]

sf_dir defaults to /tmp/sf1_probe (20k vectors; regenerate with
tools/make_scale_probe.py after any testdata refresh). Each run prints
one JSON line {"mode", "wall_sec", "rows", "n_vectors"}. Round-14
measurements on an idle host: ivfbq 76.5 s < bq 92.6 s < ivfpq 148.6 s;
at toy scale (sf0.1, 2k vectors) flat bq wins on constants — the
composed tiers earn their keep once cells are big enough that scanning
n_assign*n_probe/n_cells of the corpus beats scanning all of it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "ivfbq"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe"
    assert mode in ("bq", "ivfpq", "ivfbq"), mode

    from symat_hbase_tools_spark.operators import similarity as S
    from symat_hbase_tools_spark.session import get_spark

    spark = get_spark(f"ab-ann-{mode}", cpus=32, shuffle_partitions=32)
    n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    fn = {
        "bq": S.ann_bq_topk,
        "ivfpq": S.ann_ivfpq_topk,
        "ivfbq": S.ann_ivfbq_topk,
    }[mode]
    t0 = time.time()
    rows = fn(spark, sf_dir, k=5).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "wall_sec": round(wall, 1),
                "rows": rows,
                "n_vectors": n,
            }
        )
    )


if __name__ == "__main__":
    main()
