#!/usr/bin/env python
"""A/B of the salted key layout (operators/kv.py::salt_cells) under the
hotspot it exists to remedy: INCREMENTAL INGEST OF A MONOTONE KEY PREFIX
into a table with FIXED region boundaries.

The standing table spans 30 days of time-prefixed keys; region boundaries
are computed from it once (pre-split regions, static until a split — the
HBase deployment reality; Spark's adaptive repartitionByRange would hide
the problem, real region layouts don't). The incremental batch is ONE new
day — every key shares the newest time prefix, so under the unsalted
layout the entire batch range-routes to the TAIL region: one reducer
sorts and writes everything while the other 15 idle. Salting first (the
deterministic md5 salt byte) spreads the same batch across all regions.

Usage:
    python tools/ab_salted_ingest.py unsalted        [batch_rows]
    python tools/ab_salted_ingest.py salted          [batch_rows]
    python tools/ab_salted_ingest.py salted-presplit [batch_rows]

salted-presplit uses kv.salt_split_points (one region per salt byte)
instead of sampled quantiles of the salted standing table — the
deployment-correct layout for a salted schema (balance ~1.0 by
construction).

Prints one JSON line:
    {"mode", "batch_rows", "n_regions", "wall_sec",
     "max_region_rows", "mean_region_rows", "balance"}
where balance = max/mean region rows (1.0 = perfectly flat; n_regions =
everything in one region).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REGIONS = 16
STANDING_ROWS = 1_000_000


def _keyed(df, day_expr):
    """(row binary) keys 'ev#<DD>#<seq 12>' — time-prefixed scan order."""
    import pyspark.sql.functions as F

    key = F.concat_ws(
        "#", F.lit("ev"), F.lpad(day_expr.cast("string"), 2, "0"),
        F.lpad(F.col("id").cast("string"), 12, "0"),
    )
    return df.select(
        F.encode(key, "UTF-8").cast("binary").alias("row"),
        F.col("id").alias("value"),
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "unsalted"
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    assert mode in ("unsalted", "salted", "salted-presplit"), mode

    import pyspark.sql.functions as F

    from symat_hbase_tools_spark.operators.kv import salt_cells, salt_split_points
    from symat_hbase_tools_spark.session import get_spark

    spark = get_spark("ab-salted-ingest", cpus="32")

    standing = _keyed(spark.range(STANDING_ROWS), F.col("id") % 30)
    batch = _keyed(spark.range(batch_rows), F.lit(31))
    if mode != "unsalted":
        standing, batch = salt_cells(standing), salt_cells(batch)

    if mode == "salted-presplit":
        # one region per salt byte — the deployment-correct salted layout
        bounds = salt_split_points(N_REGIONS)
    else:
        # fixed pre-split boundaries from the STANDING table: 15 interior
        # split keys -> 16 regions (sampled quantiles of actual keys, the
        # region_boundaries discipline, cheap exact version at this scale)
        keys = [
            bytes(r["row"])
            for r in standing.select("row")
            .filter(F.pmod(F.xxhash64(F.lit(42), F.col("row")), F.lit(250)) == 0)
            .collect()
        ]
        keys.sort()
        bounds = [keys[(i * len(keys)) // N_REGIONS] for i in range(1, N_REGIONS)]

    # region routing: static range lookup (WHEN chain over binary
    # literals — what a fixed region directory does)
    region = F.lit(N_REGIONS - 1)
    for i in range(N_REGIONS - 2, -1, -1):
        region = F.when(F.col("row") < F.lit(bounds[i]), i).otherwise(region)
    routed = batch.withColumn("region", region.cast("int"))

    out = tempfile.mkdtemp(prefix="ab_salt_")
    t0 = time.monotonic()
    (
        routed.repartition(N_REGIONS, "region")
        .sortWithinPartitions("row")
        .write.mode("overwrite")
        .partitionBy("region")
        .parquet(out)
    )
    wall = time.monotonic() - t0

    per_region = {
        r["region"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    mx = max(per_region.values())
    mean = batch_rows / N_REGIONS
    print(
        json.dumps(
            {
                "mode": mode,
                "batch_rows": batch_rows,
                "n_regions": N_REGIONS,
                "regions_hit": len(per_region),
                "wall_sec": round(wall, 2),
                "max_region_rows": mx,
                "mean_region_rows": int(mean),
                "balance": round(mx / mean, 2),
            }
        )
    )
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
