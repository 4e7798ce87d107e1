#!/usr/bin/env python
"""A/B of the keyless range join (operators/rangejoin.py) against the
naive inequality join Spark would otherwise plan.

The naive form — ``points JOIN intervals ON lo <= p AND p <= hi`` with no
equi key — physically becomes BroadcastNestedLoopJoin (or a cartesian):
every (point, interval) pair is evaluated, O(P x I). The grid-bucket form
replicates each interval into the buckets it covers and equi-joins on the
bucket key — O(P + I x span/g) join input and only co-bucketed pairs
evaluated.

Usage:
    python tools/ab_range_join.py bucketed [sf_dir]
    python tools/ab_range_join.py naive    [sf_dir]   # may DNF: that IS
                                                      # the result

Workload: events_session_window_hits' exact question (purchases x heavy
sessions, count per purchase) on sf_dir (default /tmp/sf1_probe). Both
modes print one JSON line {"mode", "wall_sec", "rows", "n_points",
"n_intervals"} and must produce the identical aggregate row set (the
naive mode cross-checks row count against the bucketed result when both
complete).
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "bucketed"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe"
    assert mode in ("bucketed", "naive"), mode

    import pyspark.sql.functions as F

    from symat_hbase_tools_spark.operators import rangejoin as rj
    from symat_hbase_tools_spark.session import get_spark
    from symat_hbase_tools_spark.sources.tables import load_table

    spark = get_spark("ab-range-join", cpus="32")
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_micros(F.col("ts")).alias("t_us")
    )
    ivals = rj.session_intervals(events, min_events=3).select(
        F.col("user_id").alias("s_user"), "session_seq", "start_us", "end_us"
    )
    n_points, n_intervals = purchases.count(), ivals.count()

    def agg_of(hits):
        return hits.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))

    t0 = time.monotonic()
    if mode == "bucketed":
        hits = rj.range_bucket_join(
            purchases, ivals, "t_us", "start_us", "end_us"
        )
    else:
        hits = purchases.join(
            ivals.hint("broadcast"),
            (F.col("start_us") <= F.col("t_us"))
            & (F.col("t_us") <= F.col("end_us")),
        )
    agg = agg_of(hits)
    rows = agg.count()
    wall = time.monotonic() - t0
    out = {
        "mode": mode,
        "wall_sec": round(wall, 2),
        "rows": rows,
        "n_points": n_points,
        "n_intervals": n_intervals,
    }
    if mode == "naive":
        # output-equality cross-check (untimed): the naive aggregate must
        # be row-for-row identical to the bucketed plan's
        bucketed = agg_of(
            rj.range_bucket_join(purchases, ivals, "t_us", "start_us", "end_us")
        )
        diff = agg.exceptAll(bucketed).count() + bucketed.exceptAll(agg).count()
        out["matches_bucketed"] = diff == 0
        assert diff == 0, f"{diff} aggregate rows differ between plans"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
