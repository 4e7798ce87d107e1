"""Streaming materialized-view maintenance: foreachBatch state merge.

The streaming twin of ``timeseries.events_hourly_incremental``: each
micro-batch's mergeable hourly state (count + exact integer-micro money
sums) is merged into a persisted state table, so the rollup stays fresh
without ever re-reading history — the external-state half of the
incremental-rollup story (the batch half proves the merge lossless against
a full-recompute oracle).

Effectively-once under replays WITHOUT a transactional table format:
every batch writes the FULL merged state to a new generation directory
``gen=<batch_id>`` (named by Structured Streaming's monotonically
increasing batch id) and readers take the highest complete generation. A
replayed batch k rebuilds gen k from gen k-1 plus the same input —
byte-identical, so replay is idempotent; a crash mid-write leaves a
partial gen that is simply superseded (completeness marked by Spark's
``_SUCCESS``). On a lakehouse you would swap the generation dance for a
Delta/Iceberg MERGE INTO; the state schema and merge are unchanged.

State size is O(hours x types) — the merge job is driver-trivial at any
event volume because the heavy lifting (the partial aggregate) happened
map-side in the micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from symat_hbase_tools_spark.operators.timeseries import (
    hourly_partial_state,
    merge_hourly_states,
    render_hourly_state,
)

STATE_SCHEMA = "hour_epoch bigint, event_type string, n bigint, hi bigint, lo bigint"


def _gen_dirs(state_dir: str) -> list[tuple[int, str]]:
    try:
        entries = os.listdir(state_dir)
    except OSError:
        return []
    gens = []
    for e in entries:
        if e.startswith("gen="):
            path = os.path.join(state_dir, e)
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                gens.append((int(e[4:]), path))
    return sorted(gens)


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest complete state generation (empty state if none)."""
    gens = _gen_dirs(state_dir)
    if not gens:
        return spark.createDataFrame([], STATE_SCHEMA)
    return spark.read.schema(STATE_SCHEMA).parquet(gens[-1][1])


def merge_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, state_dir: str
) -> None:
    """foreachBatch body: merge one micro-batch into the state table."""
    prev = [p for g, p in _gen_dirs(state_dir) if g < batch_id]
    cur = (
        spark.read.schema(STATE_SCHEMA).parquet(prev[-1])
        if prev
        else spark.createDataFrame([], STATE_SCHEMA)
    )
    merged = merge_hourly_states(cur, hourly_partial_state(batch))
    out = os.path.join(state_dir, f"gen={batch_id}")
    # coalesce(1): the state is O(hours x types) rows — many part files
    # would only add listing overhead for every subsequent merge read
    merged.coalesce(1).write.mode("overwrite").parquet(out)


def maintain_rollup(
    stream: DataFrame, state_dir: str, checkpoint: str
) -> None:
    """Drain a bounded stream, maintaining the hourly rollup state."""
    spark = stream.sparkSession
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: merge_batch(spark, batch, bid, state_dir)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def rollup_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """The user-facing rollup rendered from the latest state."""
    return render_hourly_state(read_state(spark, state_dir))
