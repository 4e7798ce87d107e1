"""Continuous ingestion into the cell layer — the streaming write path of
the KV model.

HBase ingests by appending versions (memstore -> flushed files) and
resolves reads latest-version-wins; compaction reclaims later. The Spark
mapping keeps exactly that LSM shape:

  * each micro-batch APPENDS its cells (no read-modify-write in the hot
    path — appends are the only thing a 100 TB ingest can afford),
  * the read path is ``visible_cells`` (latest Put per coordinate wins),
  * ``major_compact`` is the periodic rewrite that bounds read amplification.

``event_cell_puts`` is one function usable on a batch OR streaming
DataFrame — the unified-API point: the batch twin (entry.events_kv_state)
and the streaming ingest share the cell construction verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: family for event-derived cells
EVENT_FAMILY = "ev"


def event_cell_puts(events: DataFrame) -> DataFrame:
    """events -> cells: one Put per event. Version = event time in MICROS
    (the stream's native precision after the nanos read), so concurrent
    events of one (user, type) keep distinct versions; value rendered
    '%.3f' so byte order == numeric-string order for deterministic ties."""
    return events.select(
        F.encode(F.format_string("user#%08d", F.col("user_id")), "UTF-8").alias("row"),
        F.lit(EVENT_FAMILY).alias("family"),
        F.encode(F.col("event_type"), "UTF-8").cast("binary").alias("qualifier"),
        F.unix_micros(F.col("ts")).alias("ts"),
        F.lit("Put").alias("type"),
        F.encode(F.format_string("%.3f", F.col("value")), "UTF-8").alias("value"),
    )


def ingest_events(stream: DataFrame, path: str, checkpoint: str) -> None:
    """Drain a bounded event stream into a cells directory, append-only.

    foreachBatch + append + the checkpoint dir gives effectively-once cell
    writes (a replayed batch re-appends, and identical (coordinate, ts)
    duplicates collapse under latest-version-wins reads — appends are
    idempotent at the READ layer, the LSM trick)."""
    q = (
        event_cell_puts(stream)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def ingest_embeddings_into_ivf(
    stream: DataFrame, index_dir: str, checkpoint: str, n_assign: int = 1
) -> None:
    """Drain a bounded (vec_id, embedding) stream into a PERSISTED IVF
    index — the nightly/continuous embedding-ingest path as a stream.

    Each micro-batch runs ``similarity.ivf_index_append``: frozen-codebook
    assignment (broadcast centroids, one Arrow argmin/argsort pass) and an
    append into the matching ``assignments/cell=N/`` directories. The
    checkpoint makes delivery effectively-once at the batch level; a
    replayed batch re-appends the same (vec_id, cell) rows, which
    downstream search dedups via its (query_id, neighbor_id)
    dropDuplicates — the same append-idempotent-at-the-read-layer trade
    as the cell LSM ingest above. Queries see streamed vectors as soon as
    their batch commits: search is directory pruning + re-rank, no
    monolithic structure rebuild (similarity.ivf_index_append's contract).

    ``n_assign`` should match the index build's (spill parity for base
    and streamed vectors).
    """
    from symat_hbase_tools_spark.operators.similarity import ivf_index_append

    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: ivf_index_append(
                batch.sparkSession, index_dir, batch, n_assign=n_assign
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
