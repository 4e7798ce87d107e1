#!/usr/bin/env python
"""Decompose the cold bench total into its phases, per query (round-9
verdict ask #6: "cold <= 70 s at >= 67 shapes, or a decomposition showing
the floor is irreducible").

Phases per fresh plan, measured on the bench HEADLINE at $SPARK_GRAFT_SF_DIR:

  construct — the python queries() call: py4j Column-tree building (one
              JVM round-trip per expression node) + any operator-side
              fixture work.
  analyze   — first .schema access: Catalyst analysis (resolution) of the
              logical plan.
  plan      — queryExecution().executedPlan(): optimization + physical
              planning + (lazily) whole-stage-codegen source generation.
  execute   — the first real action (collect/count via the bench's
              timed_action), incl. codegen COMPILATION, stage scheduling,
              persist materialization, and actual first-run compute.

Prints one JSON line per query plus a totals line. Foreground only (the
recorded background-throttling gotcha applies).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def main() -> None:
    from bench import HEADLINE

    from symat_hbase_tools_spark import entry as entry_mod
    from symat_hbase_tools_spark.entry import QUERIES, prewarm_fixtures
    from symat_hbase_tools_spark.session import get_spark

    spark = get_spark("cold-decomp", cpus=CPUS)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _np_warm(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(
        _np_warm, schema="id long"
    ).count()
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    prewarm_fixtures(spark, SF_DIR)
    entry_mod._PLAN_CACHE.clear()
    spark.catalog.clearCache()

    totals = {"construct": 0.0, "analyze": 0.0, "plan": 0.0, "execute": 0.0}
    rows = []
    for name in HEADLINE:
        spark.catalog.clearCache()
        t0 = time.time()
        df = QUERIES[name](spark, SF_DIR)
        t1 = time.time()
        _ = df.schema
        t2 = time.time()
        _ = df._jdf.queryExecution().executedPlan()
        t3 = time.time()
        df.collect()
        t4 = time.time()
        r = {
            "query": name,
            "construct": round(t1 - t0, 3),
            "analyze": round(t2 - t1, 3),
            "plan": round(t3 - t2, 3),
            "execute": round(t4 - t3, 3),
        }
        rows.append(r)
        for k in totals:
            totals[k] += r[k]
        print(json.dumps(r), file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_queries": len(rows),
                "totals_sec": {k: round(v, 1) for k, v in totals.items()},
                "cold_total_sec": round(sum(totals.values()), 1),
                "top_execute": sorted(
                    rows, key=lambda r: -r["execute"]
                )[:8],
                "top_preexec": sorted(
                    rows,
                    key=lambda r: -(r["construct"] + r["analyze"] + r["plan"]),
                )[:8],
            }
        )
    )


if __name__ == "__main__":
    main()
