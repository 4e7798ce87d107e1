"""Distributed global ordering — exact rank / ntile / percent_rank without
a single-partition window.

``Window.orderBy`` with no partitionBy funnels the whole input through ONE
task — fine on 750 users at sf0.1, fatal on billions of keys at 100 TB. The
scale-correct shape (same machinery as packing.pack_sequences' distributed
prefix sum):

  1. range-repartition on the order columns (no explicit partition count,
     so AQE may coalesce near-empty ranges on small inputs — the plan is
     data-adaptive, never pinned to one task),
  2. row_number within each range partition (keyed on spark_partition_id),
  3. per-partition row counts -> driver (one row per partition) ->
     exclusive prefix offsets -> broadcast join back.

Driver state is O(partitions). Range boundaries come from Spark's
deterministic reservoir sampling (seeded by partition index), so the rank
assignment is reproducible run-over-run for a fixed input — the offsets
collected at plan-build time stay valid when persisted intermediates
re-materialize.

ntile/percent_rank/cume_dist are then pure expressions of (rank, n_rows),
bit-identical to the window functions when the order has a unique
tie-break (all call sites order by (value, primary_key)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_order_rank(
    df: DataFrame, order_cols: list[Column], rank_name: str = "rank"
) -> tuple[DataFrame, int]:
    """(df + 1-based bigint ``rank_name`` under the given total order,
    total row count). The order must be total (include a unique tie-break
    column) for the rank to be well-defined.

    Runs one job at plan-build time (per-partition counts); the returned
    plan re-derives ranks from the persisted ranged table + broadcast
    offsets.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_rn", F.row_number().over(w)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    totals = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    offsets, running = [], 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], running))
        running += r["_cnt"]
    if not offsets:
        return df.withColumn(rank_name, F.lit(None).cast("bigint")), 0
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_name, (F.col("_rn") + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_rn", "_offset")
    )
    return out, running


def ntile_from_rank(rank: Column, n_rows: int, k: int) -> Column:
    """Spark-semantics ntile(k) as a pure expression of a 1-based unique
    rank: the first n%k buckets take floor(n/k)+1 rows each, the rest
    floor(n/k)."""
    q, rem = divmod(int(n_rows), int(k))
    r0 = rank - 1
    threshold = rem * (q + 1)
    # integer division via floor of exact double is safe here: ranks are
    # bounded by n_rows which is far below 2^53
    first = F.floor(r0 / F.lit(q + 1)) + 1
    if q == 0:
        return first.cast("int")
    rest = F.lit(rem) + F.floor((r0 - threshold) / F.lit(q)) + 1
    return F.when(r0 < threshold, first).otherwise(rest).cast("int")


def percent_rank_from_rank(rank: Column, n_rows: int) -> Column:
    """percent_rank for a unique total order: (rank-1)/(n-1); 0.0 when n=1."""
    if n_rows <= 1:
        return F.lit(0.0)
    return (rank - 1).cast("double") / F.lit(float(n_rows - 1))


def cume_dist_from_rank(rank: Column, n_rows: int) -> Column:
    """cume_dist for a unique total order: rank/n."""
    return rank.cast("double") / F.lit(float(max(n_rows, 1)))
