"""Streaming surface tests: batch/stream parity on bounded input
(SURVEY.md §7 Phase 4 — deterministic availableNow drain into memory sink)."""

from __future__ import annotations

import pytest

from symat_hbase_tools_spark.operators import relational
from symat_hbase_tools_spark.streaming import events as streaming
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream(spark):
    return streaming.stream_events(spark, SF_DIR)


def test_tumbling_matches_batch(spark, stream):
    got = streaming.run_bounded(
        streaming.tumbling_hourly(stream), "t_tumbling"
    ).collect()
    want = relational.events_hourly(spark, SF_DIR).collect()
    to_set = lambda rows: {  # noqa: E731
        (r["hour_epoch"], r["event_type"], r["n_events"], r["sum_value"]) for r in rows
    }
    assert to_set(got) == to_set(want)


def test_sliding_window_overlap(spark, stream):
    got = streaming.run_bounded(
        streaming.sliding_counts(stream), "t_sliding"
    ).collect()
    # every event lands in exactly 6 sliding windows (6h window, 1h slide)
    total_batch = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n_events"] for r in got) == 6 * total_batch


def test_session_counts_match_batch(spark, stream):
    got = streaming.run_bounded(
        streaming.session_counts(stream), "t_sessions"
    ).collect()
    per_user_sessions: dict[int, int] = {}
    per_user_events: dict[int, int] = {}
    for r in got:
        per_user_sessions[r["user_id"]] = per_user_sessions.get(r["user_id"], 0) + 1
        per_user_events[r["user_id"]] = per_user_events.get(r["user_id"], 0) + r["n_events"]
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in relational.events_sessionize(spark, SF_DIR).collect()
    }
    got_pairs = {
        u: (per_user_sessions[u], per_user_events[u]) for u in per_user_sessions
    }
    assert got_pairs == want


def test_watermark_drops_nothing_on_ordered_bounded_input(spark, stream):
    """availableNow over one bounded file: watermark never truncates."""
    got = streaming.run_bounded(streaming.tumbling_hourly(stream), "t_wm")
    total = sum(r["n_events"] for r in got.collect())
    assert total == spark.read.parquet(f"{SF_DIR}/events.parquet").count()


def test_stream_dedup_matches_batch(spark, stream):
    """Streaming dropDuplicates (dedup in motion): duplicate the input by
    unioning the stream with itself, dedup on event_id, count must equal the
    batch distinct count."""
    from pyspark.sql import functions as F

    doubled = stream.union(stream)
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = streaming.run_bounded(deduped, "t_dedup").collect()
    want = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got[-1]["n"] == want


def test_foreach_batch_sink(spark, stream, tmp_path):
    """foreachBatch custom-sink path: per-micro-batch parquet append with
    the batch id recorded (the exactly-once bookkeeping hook)."""
    out = str(tmp_path / "fb")
    from pyspark.sql import functions as F

    def write_batch(df, epoch_id):
        df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

    q = (
        streaming.tumbling_hourly(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    want = relational.events_hourly(spark, SF_DIR).count()
    assert back.filter(F.col("epoch") == back.agg(F.max("epoch")).collect()[0][0]).count() == want


def test_stream_stream_join_matches_batch(spark, stream):
    """Purchase->click interval join: streaming result (append mode) must
    equal the batch twin row-for-row on bounded input."""
    got = streaming.run_bounded(
        streaming.purchase_attribution(stream), "t_ssjoin", output_mode="append"
    ).collect()
    want = relational.purchase_attribution(spark, SF_DIR).collect()
    to_set = lambda rows: {  # noqa: E731
        (r["purchase_id"], r["click_id"], r["user_id"], r["gap_us"]) for r in rows
    }
    assert to_set(got) == to_set(want)
    assert len(got) == len(want)  # no dup emission from state replay


def test_stream_static_enrichment_matches_batch(spark, stream):
    from symat_hbase_tools_spark.sources.tables import load_table

    customer = load_table(spark, SF_DIR, "customer")
    got = streaming.run_bounded(
        streaming.segment_enriched_counts(stream, customer), "t_enrich"
    ).collect()
    want = relational.events_by_segment(spark, SF_DIR).collect()
    to_set = lambda rows: {  # noqa: E731
        (r["c_mktsegment"], r["event_type"], r["n_events"], r["sum_value"])
        for r in rows
    }
    assert to_set(got) == to_set(want)


def test_streaming_kv_ingest_matches_batch(spark, stream, tmp_path):
    """LSM ingest: append-only micro-batch cell writes; visible_cells over
    the ingested directory equals the batch-twin KV state."""
    import __spark_entry__  # noqa: F401  (ensures entry import side effects)

    from symat_hbase_tools_spark.entry import events_kv_state
    from symat_hbase_tools_spark.operators.kv import visible_cells
    from symat_hbase_tools_spark.streaming.ingest import ingest_events

    path, ckpt = str(tmp_path / "cells"), str(tmp_path / "ckpt")
    ingest_events(stream, path, ckpt)
    got = {
        (bytes(r["row"]), bytes(r["qualifier"]), r["ts"], bytes(r["value"]))
        for r in visible_cells(spark.read.parquet(path)).collect()
    }
    want = {
        (r["row_key"].encode(), r["qualifier"].encode(), r["ts"], r["value"].encode())
        for r in events_kv_state(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_outer_interval_join_matches_batch_on_closeable_clicks(spark, stream):
    """LEFT OUTER stream-stream join parity: matched rows equal the batch
    twin's matched rows exactly; null-padded rows appear exactly for the
    unconverted clicks the final watermark could CLOSE (click_ts + 1h <
    final watermark). Trailing clicks stay in state — the documented outer
    join semantics, not data loss."""
    got = streaming.run_bounded(
        streaming.click_conversion_outer(stream), "t_outer_join", output_mode="append"
    ).collect()
    want = relational.click_conversion(spark, SF_DIR).collect()

    got_matched = {(r["click_id"], r["purchase_id"], r["gap_us"]) for r in got if r["purchase_id"] is not None}
    want_matched = {(r["click_id"], r["purchase_id"], r["gap_us"]) for r in want if r["purchase_id"] is not None}
    assert got_matched == want_matched

    # final watermark = max event time - 2h (the declared delay)
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.sources.tables import load_table

    events = load_table(spark, SF_DIR, "events")
    # the join's watermark is the MIN of the two sides' watermarks, each
    # computed from that side's max event time minus the declared delay
    side_max = {
        r["event_type"]: r["mx"]
        for r in events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max(F.unix_micros("ts")).alias("mx"))
        .collect()
    }
    wm_us = min(side_max["click"], side_max["purchase"]) - 2 * 3600 * 1_000_000
    closeable = {r["click_id"] for r in want if r["purchase_id"] is None}
    clicks_us = {
        r["click_id"]: r["us"]
        for r in events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.unix_micros("ts").alias("us"))
        .collect()
    }
    # boundary clicks (click_ts + 1h within a second of the watermark) may
    # legitimately land on either side of the ms-truncated eviction check
    margin = 1_000_000  # 1s in us
    must_emit = {c for c in closeable if clicks_us[c] + 3600 * 1_000_000 < wm_us - margin}
    may_emit = {c for c in closeable if clicks_us[c] + 3600 * 1_000_000 < wm_us + margin}
    got_nulls = {r["click_id"] for r in got if r["purchase_id"] is None}
    assert must_emit <= got_nulls <= may_emit, (
        len(must_emit), len(got_nulls), len(may_emit),
        sorted(must_emit - got_nulls)[:5], sorted(got_nulls - may_emit)[:5],
    )


def test_full_outer_interval_join_matches_batch_on_closeable_region(spark, stream):
    """FULL OUTER stream-stream join parity: matched rows equal the batch
    twin exactly; null-padded CLICK rows appear for clicks the watermark can
    close (click_ts + 1h < wm), null-padded PURCHASE rows for purchases it
    can close (purchase_ts < wm — a partner click would need click_ts >=
    purchase_ts - 1h and <= purchase_ts). Trailing rows on both sides stay
    in state on bounded input — documented semantics."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.sources.tables import load_table

    got = streaming.run_bounded(
        streaming.conversion_full_outer(stream), "t_full_outer", output_mode="append"
    ).collect()
    want = relational.click_conversion_full(spark, SF_DIR).collect()

    key = lambda r: (r["click_id"], r["purchase_id"], r["gap_us"])  # noqa: E731
    got_matched = {key(r) for r in got if r["purchase_id"] is not None and r["click_id"] is not None}
    want_matched = {key(r) for r in want if r["purchase_id"] is not None and r["click_id"] is not None}
    assert got_matched == want_matched

    events = load_table(spark, SF_DIR, "events")
    side_max = {
        r["event_type"]: r["mx"]
        for r in events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max(F.unix_micros("ts")).alias("mx"))
        .collect()
    }
    wm_us = min(side_max["click"], side_max["purchase"]) - 2 * 3600 * 1_000_000
    ts_us = {
        (r["event_type"], r["event_id"]): r["us"]
        for r in events.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    margin = 1_000_000  # 1s in us: ms-truncated eviction boundary tolerance
    HOUR = 3600 * 1_000_000

    unmatched_clicks = {r["click_id"] for r in want if r["purchase_id"] is None}
    must_c = {c for c in unmatched_clicks if ts_us[("click", c)] + HOUR < wm_us - margin}
    may_c = {c for c in unmatched_clicks if ts_us[("click", c)] + HOUR < wm_us + margin}
    got_null_p = {r["click_id"] for r in got if r["purchase_id"] is None}
    assert must_c <= got_null_p <= may_c

    unmatched_purch = {r["purchase_id"] for r in want if r["click_id"] is None}
    must_p = {p for p in unmatched_purch if ts_us[("purchase", p)] < wm_us - margin}
    may_p = {p for p in unmatched_purch if ts_us[("purchase", p)] < wm_us + margin}
    got_null_c = {r["purchase_id"] for r in got if r["click_id"] is None}
    assert must_p <= got_null_c <= may_p
    # every null-click row carries the purchase's user_id (coalesce side)
    assert all(r["user_id"] is not None for r in got)


def test_dedup_state_survives_restart(spark, tmp_path):
    """Checkpoint round-trip: dropDuplicatesWithinWatermark's seen-set must
    survive a query restart. Run 1 ingests chunk A; run 2 (same checkpoint)
    ingests chunk B containing duplicates of A's event_ids — the file sink
    must end up with each event_id exactly once."""
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    base_us = 1_700_000_000_000_000  # fixed epoch micros
    def chunk(ids, offset_s):
        rows = [
            (i, base_us + (offset_s + j) * 1_000_000, i % 7, "click", float(i))
            for j, i in enumerate(ids)
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long, event_type string, value double"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )

    def run_once(df_written):
        df_written.coalesce(1).write.mode("append").parquet(src)
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
        s = spark.readStream.schema(schema).parquet(src)
        deduped = streaming.dedup_within_watermark(s, delay="1 hour")
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    run_once(chunk([1, 2, 3, 4, 5], offset_s=0))
    time.sleep(0.1)
    # chunk B: 3,4,5 are cross-restart duplicates; 6,7 are new
    run_once(chunk([3, 4, 5, 6, 7], offset_s=10))

    out = spark.read.parquet(sink)
    ids = sorted(r["event_id"] for r in out.select("event_id").collect())
    assert ids == [1, 2, 3, 4, 5, 6, 7]  # exactly once each, across restarts


def test_exactly_once_streaming_matches_batch_twin(spark, events, tmp_path):
    """The exactly-once twins: streaming dropDuplicatesWithinWatermark over a
    redelivered (doubled) stream must converge to the batch twin's per-type
    aggregates (relational.events_exactly_once) — which themselves equal the
    clean stream's aggregates."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.operators import relational

    # stage the doubled input: every event redelivered 1 s later
    base = events.select("event_id", "ts", "event_type", "value")
    doubled = base.unionByName(
        base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 SECOND"))
    )
    stage = str(tmp_path / "doubled")
    doubled.write.parquet(stage)

    raw = (
        spark.readStream.schema(doubled.schema).format("parquet").load(stage)
    )
    deduped = raw.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = streaming.run_bounded(
        deduped.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            relational.money_sum(F.col("value"), "sum_value"),
        ),
        "t_exactly_once",
        output_mode="complete",
    )
    got = {
        r["event_type"]: (r["n_events"], round(r["sum_value"], 6))
        for r in out.collect()
    }
    want = {
        r["event_type"]: (r["n_events"], round(r["sum_value"], 6))
        for r in relational.events_exactly_once(spark, SF_DIR).collect()
    }
    assert got == want


def test_rollup_state_merge_matches_batch(spark, tmp_path):
    """Micro-batched foreachBatch state maintenance: split events into 4
    files, force one micro-batch per file, merge each into the generation
    state — the final rendered rollup must EQUAL the one-shot batch
    aggregate, and replaying the last batch (same batch id, same input)
    must be a no-op (idempotent generations)."""
    from symat_hbase_tools_spark.sources.tables import load_table
    from symat_hbase_tools_spark.streaming import rollup

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    rollup.maintain_rollup(stream, state_dir, ckpt)

    gens = rollup._gen_dirs(spark, state_dir)
    # older generations are pruned after each merge (storage O(state), not
    # O(batches)) — exactly KEEP_GENERATIONS complete ones remain
    assert len(gens) == rollup.KEEP_GENERATIONS, gens

    snap = lambda df: {  # noqa: E731
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in df.collect()
    }
    want = snap(relational.events_hourly(spark, SF_DIR))
    assert snap(rollup.rollup_view(spark, state_dir)) == want

    # idempotent replay: re-merge the engine's OWN last batch — id and
    # file list read from the checkpoint's file-source log, the exact
    # mapping Structured Streaming replays after a crash — the
    # regenerated state must render identically
    import json
    import os

    last_bid = max(int(f) for f in os.listdir(f"{ckpt}/sources/0")
                   if not f.startswith("."))
    with open(f"{ckpt}/sources/0/{last_bid}") as fh:
        last_files = [json.loads(line)["path"]
                      for line in fh if line.startswith("{")]
    rollup.merge_batch(spark, spark.read.parquet(*last_files), last_bid, state_dir)
    assert snap(rollup.rollup_view(spark, state_dir)) == want


def test_rollup_merge_sql_shape(spark, tmp_path):
    """The MERGE INTO form submits an honest statement; on this image's
    parquet catalog tables (no row-level-operation support) it must
    surface NotImplementedError, never fall back to a fake
    read-modify-overwrite."""
    import pytest

    from symat_hbase_tools_spark.sources.tables import load_table
    from symat_hbase_tools_spark.streaming import rollup

    events = load_table(spark, SF_DIR, "events").limit(100)
    spark.sql("DROP TABLE IF EXISTS rollup_state_sql")
    spark.createDataFrame([], rollup.STATE_SCHEMA).write.saveAsTable(
        "rollup_state_sql"
    )
    try:
        with pytest.raises(NotImplementedError, match="MERGE INTO"):
            rollup.merge_batch_sql(spark, events, 0, "rollup_state_sql")
    finally:
        spark.sql("DROP TABLE IF EXISTS rollup_state_sql")


def test_streaming_ivf_ingest_is_searchable(spark, tmp_path):
    """Streaming embedding ingest into a persisted IVF index: build on 90%
    of the corpus, drain the held-out 10% through the availableNow stream,
    then query with the streamed vectors — each must find its exact twin...
    itself is excluded, so assert every streamed vector appears in the
    index output and assignment matches the frozen-codebook argmin
    (batch-append parity: the streaming path IS ivf_index_append per
    micro-batch)."""
    import os

    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.operators.similarity import ann_ivf_query, build_ivf_index
    from symat_hbase_tools_spark.sources.tables import load_table
    from symat_hbase_tools_spark.streaming.ingest import ingest_embeddings_into_ivf

    emb = load_table(spark, SF_DIR, "embeddings")
    base_dir = str(tmp_path / "corpus90")
    os.makedirs(base_dir, exist_ok=True)
    emb.filter(F.col("vec_id") % 10 != 0).write.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    )
    idx = str(tmp_path / "ivf_stream")
    build_ivf_index(spark, base_dir, idx, n_cells=8)

    held = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    n_held = held.count()
    stream_src = str(tmp_path / "stream_src")
    held.repartition(3).write.parquet(stream_src)  # 3 files -> >=1 micro-batch each
    stream = (
        spark.readStream.schema(held.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
    )
    ingest_embeddings_into_ivf(stream, idx, str(tmp_path / "ckpt"))

    ingested = spark.read.parquet(f"{idx}/assignments").filter(
        F.col("vec_id") % 10 == 0
    )
    assert ingested.count() == n_held  # n_assign=1: one cell per vector
    # streamed vectors are immediately searchable: querying with a streamed
    # vector's ORIGINAL twin is not planted here, so query with the
    # streamed vectors themselves and check non-self neighbors come back
    got = ann_ivf_query(spark, idx, held.limit(20), k=3, n_probe=4)
    assert got.count() > 0
    assert got.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_events_rollup_exactly_once_across_injected_retry(spark, tmp_path):
    """The crash drill end-to-end: a post-commit failure at batch 1 (state
    generation committed, engine commit-log record lost), restart from the
    same checkpoint, replay absorbed — final rollup equals the one-shot
    batch aggregate, and the injected path demonstrably fired (the drill
    raises if the stream drains without reaching the target batch)."""
    from symat_hbase_tools_spark.sources.tables import load_table
    from symat_hbase_tools_spark.streaming import rollup

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    rollup.maintain_rollup_with_retry(stream, state_dir, ckpt, fail_once_at=1)

    snap = lambda df: {  # noqa: E731
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in df.collect()
    }
    assert snap(rollup.rollup_view(spark, state_dir)) == snap(
        relational.events_hourly(spark, SF_DIR)
    )
    # storage stayed bounded through the crash + replay
    assert len(rollup._gen_dirs(spark, state_dir)) <= rollup.KEEP_GENERATIONS


def test_rollup_retry_drill_at_last_batch(spark, tmp_path):
    """The crash drill at the FINAL batch: the restart replays it as the
    only remaining work and the rollup still converges to the batch
    aggregate — the boundary where a buggy drill could under-merge."""
    from symat_hbase_tools_spark.sources.tables import load_table
    from symat_hbase_tools_spark.streaming import rollup

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    rollup.maintain_rollup_with_retry(stream, state_dir, ckpt, fail_once_at=2)
    snap = lambda df: {  # noqa: E731
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in df.collect()
    }
    assert snap(rollup.rollup_view(spark, state_dir)) == snap(
        relational.events_hourly(spark, SF_DIR)
    )


def test_watermark_actually_drops_late_event_across_restart(spark, tmp_path):
    """The watermark proof the bounded-input tests can't give: batch A
    advances event time to T (watermark persists in the checkpoint at
    T - 1h); batch B redelivers one event 3 HOURS older than T (past the
    watermark -> must be DROPPED from the append-mode window aggregate)
    plus one fresh event at T + 2h (must appear, and must finalize A's
    windows). Asserts both the drop and the legitimate late-arrival
    handling in one drill."""
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base_us = 1_699_999_200 * 1_000_000  # hour-ALIGNED epoch (div by 3600)

    def write_chunk(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long, event_type string, value double"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        df.coalesce(1).write.mode("append").parquet(src)

    def drain():
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
        s = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming.tumbling_hourly(s, watermark="1 hour")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    hour = 3600 * 1_000_000
    # batch A: events in hours 0..4; max event time T = base + 4h
    write_chunk([
        (i, base_us + i * hour, 1, "click", 1.0) for i in range(5)
    ])
    drain()
    time.sleep(0.1)
    # batch B: one event 3h BEFORE T (hour 1 — watermark at T-1h=3h has
    # passed its window) and one fresh event at T+2h
    write_chunk([
        (100, base_us + 1 * hour + 60_000_000, 1, "click", 1.0),  # LATE
        (101, base_us + 6 * hour, 1, "click", 1.0),               # fresh
    ])
    drain()

    out = spark.read.parquet(sink)
    counts = {
        r["hour_epoch"]: r["n_events"]
        for r in out.filter(F.col("event_type") == "click").collect()
    }
    base_s = base_us // 1_000_000
    # the late event must NOT bump hour 1 (its window was finalized with
    # exactly the batch-A event); emitted windows are those the watermark
    # closed — hours 0..3 after batch A's watermark, hour 4 after batch B
    for h in (0, 1, 2, 3):
        assert counts.get(base_s + h * 3600) == 1, (h, counts)
    # hour 4 (batch A's last event) finalizes once batch B advances the
    # watermark to T+2h-1h = 5h; the fresh hour-6 event stays OPEN
    assert counts.get(base_s + 4 * 3600) == 1
    assert base_s + 6 * 3600 not in counts  # not yet closed by watermark
    assert sum(counts.values()) == 5  # late event contributed NOTHING
