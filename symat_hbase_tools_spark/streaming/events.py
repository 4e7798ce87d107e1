"""Structured Streaming surface over the events stream table.

The reference has no streaming (SURVEY.md §2.5); this is the engine's
extension surface for continuous ingestion: tumbling/sliding windows,
session windows, and watermark-based late-data handling.

Batch/stream parity is the correctness contract: every streaming aggregate
here has a batch twin in operators/relational.py, and tests assert the
streaming result on bounded input equals the batch result. For production
the file source swaps for Kafka; everything downstream is unchanged — that
is the point of the unified DataFrame API.

Scale notes: streaming aggregations shuffle on (window, key) exactly like
their batch twins; state store size is bounded by the watermark horizon.
``session_window`` state merges per key — the 100 TB-stream concern is key
cardinality (user_id), not event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from symat_hbase_tools_spark.session import apply_runtime_confs
from symat_hbase_tools_spark.sources.tables import normalize_events

# Fallback schema when the source parquet can't be footer-probed (e.g. a
# Kafka deployment would declare its own). The driver's generator has shipped
# both int64-nanos and timestamp[us] encodings for ``ts``; stream_events
# probes the actual footer so either works.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _staged_dir(sf_dir: str) -> str:
    """The file stream source requires a DIRECTORY to watch; the test data is
    a single parquet file. Stage a symlink dir (idempotent, read-only data
    untouched). Lands in the engine's process-scoped mkdtemp scratch —
    never a fixed shared /tmp path (concurrent-run race / multi-user squat,
    round-4 advisory)."""
    import hashlib
    import os

    from symat_hbase_tools_spark.entry import _scratch_path

    stage = _scratch_path(
        "stream_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return stage


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (file source; Kafka in production).

    The file stream source requires a declared schema; we footer-probe the
    actual parquet (one metadata-only batch read, no data scan) so the stream
    sees the same physical encoding the batch path does, then apply the same
    ``normalize_events`` contract (ts TimestampType UTC + exact ts_ns).
    """
    import os

    apply_runtime_confs(spark)
    try:
        phys = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    except Exception:
        phys = EVENTS_SCHEMA
    raw = spark.readStream.schema(phys).format("parquet").load(_staged_dir(sf_dir))
    return normalize_events(raw)


def tumbling_hourly(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1h tumbling window counts/sums; late data beyond the watermark dropped."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """6h windows sliding hourly — overlap handled by the engine's state store."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(stream: DataFrame, gap: str = "8 hours", watermark: str = "12 hours") -> DataFrame:
    """Per-user session windows (gap-based merge in the state store)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events", F.unix_timestamp("w.start").alias("session_start"))
    )


def purchase_attribution(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same user's
    clicks in the preceding hour.

    Both sides carry a watermark, and the join's time-range condition bounds
    the state store: a buffered click is evicted once the purchase-side
    watermark passes click_ts + 1 hour. Without the range condition the state
    grows without bound — THE stream-stream join scale rule. Batch twin:
    relational.purchase_attribution (hash-checked against DuckDB).
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


def segment_enriched_counts(stream: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with the (static)
    customer dimension and aggregate per segment/type.

    The static side is re-read per micro-batch and broadcast — no state
    store involvement at all (stream-static joins are stateless), which is
    why dimension enrichment is the cheapest join a stream can do. Batch
    twin: relational.events_by_segment (oracle-paired)."""
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        stream.join(F.broadcast(dim), "user_id", "left")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def conversion_full_outer(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream FULL OUTER interval join: the complete conversion
    ledger — matched click/purchase pairs, unconverted clicks (null
    purchase), and unattributed purchases (null click).

    Both outer sides are stateful: a row is null-padded only once the
    OPPOSITE side's watermark proves no partner can still arrive (click
    closes at click_ts + 1h < wm; purchase closes at purchase_ts < wm,
    since a matching click would need click_ts >= purchase_ts - 1h AND
    click_ts <= purchase_ts). Same bounded-state eviction rule as the
    inner/left variants. Batch twin: relational.click_conversion_full
    (oracle-paired).
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
            "fullOuter",
        )
        .select(
            "click_id",
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
            "purchase_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


def dedup_within_watermark(stream: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Time-bounded streaming dedup on event_id.

    ``dropDuplicatesWithinWatermark`` keeps a seen-set entry only until the
    watermark passes its event time + delay — the state store stays bounded
    by the duplicate-arrival horizon instead of growing with the whole
    stream (plain dropDuplicates state is unbounded: the 100 TB-stream
    rule). The seen-set lives in the checkpoint, so dedup holds ACROSS
    restarts — the checkpoint round-trip test pins exactly that.
    """
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


def run_bounded(stream_df: DataFrame, query_name: str, output_mode: str = "complete") -> DataFrame:
    """Drain a bounded stream into a memory sink and return the result table.

    For bounded parquet input availableNow + processAllAvailable drives the
    query to completion synchronously — deterministic, test-friendly.
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.table(query_name)


def click_conversion_outer(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream LEFT OUTER interval join: clicks emitted with their
    in-window purchases immediately, and with NULL purchase columns once the
    watermark proves no purchase can still arrive.

    The outer side is the stateful subtlety: a null-padded row may only be
    emitted when the purchase-side watermark passes click_ts + 1 hour —
    before that, the click sits in the state store as a candidate. State
    stays bounded by the same eviction rule as the inner join. Batch twin:
    relational.click_conversion (oracle-paired); on bounded input the
    streaming result equals the batch twin restricted to closeable clicks
    (parity test documents the trailing-watermark caveat).
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
            "leftOuter",
        )
        .select(
            "click_id",
            "user_id",
            "purchase_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
            F.col("click_ts"),
        )
    )
