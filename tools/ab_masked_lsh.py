#!/usr/bin/env python
"""Same-day A/B of the 200k label-masked LSH wall: adaptive cogroup
sharding (round-9 fix, ~128 MB probe-byte targets) vs the pre-fix shape
(cogroup lands on the session's 32 shuffle partitions).

Round-9's numbers came from different host days (pre-fix 937 s round 8,
GC-pressured; post-fix 1422 s round 9, clean) — this tool removes the
host variable (round-9 verdict ask #4). The pre-fix form OOM'd outright
on the round-9 re-probe, so mode=prefix may die: that outcome IS a
result (sharding is mandatory, wall comparison moot).

Usage:
    python tools/ab_masked_lsh.py sharded   # current code
    python tools/ab_masked_lsh.py prefix    # forced 32-way cogroup

Prints one JSON line: {"mode", "wall_sec", "rows", "shards"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "sharded"
    probe = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_sf10/embeddings.parquet"

    import pyspark.sql.functions as F

    from symat_hbase_tools_spark.operators import similarity
    from symat_hbase_tools_spark.session import get_spark

    if mode == "prefix":
        # pre-fix shape: the cogroup exchange lands on the session's 32
        # shuffle partitions regardless of probe volume
        similarity._cogroup_shards = lambda *a, **k: 1  # floor wins: max(defaultParallelism, 1)
    elif mode.startswith("target="):
        # tune TARGET_COGROUP_PARTITION_BYTES (e.g. target=512 for 512 MB)
        similarity.TARGET_COGROUP_PARTITION_BYTES = int(mode.split("=")[1]) << 20

    spark = get_spark("ab-masked-lsh", cpus="32")
    base = spark.read.parquet(probe).select(
        "vec_id",
        similarity.as_double(F.col("embedding")).alias("emb"),
        F.col("label").cast("long").alias("label"),
    )
    n_rows = base.count()
    planes = similarity._adaptive_planes(n_rows)
    # target= overrides TARGET_COGROUP_PARTITION_BYTES above, so the
    # estimate must be recomputed under the override — only the 'prefix'
    # mode (the pre-sharding unsharded shape) pins the constant 32.
    shards = (
        32
        if mode == "prefix"
        else similarity._cogroup_shards(n_rows, 8, planes, True)
    )

    # exactly the embedding_hard_negatives_ann LSH-path call (the r8/r9
    # measurement shape: adaptive planes, 8 tables, kernel label mask)
    t0 = time.time()
    out = similarity.lsh_topk_df(
        base,
        k=5,
        num_planes=planes,
        num_tables=8,
        multiprobe=True,
        label_col="label",
        n_rows=n_rows,
    )
    rows = out.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "wall_sec": round(wall, 1),
                "rows": rows,
                "n_vectors": n_rows,
                "shards_estimate": int(shards),
            }
        )
    )


if __name__ == "__main__":
    main()
