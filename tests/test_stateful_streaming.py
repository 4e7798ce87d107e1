"""Custom stateful streaming operator test: applyInPandasWithState running
per-user profiles must converge to the batch ground truth on bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.streaming import events as se
from symat_hbase_tools_spark.streaming.stateful import user_profiles
from tests.conftest import SF_DIR


def test_user_profiles_match_batch(spark, events):
    stream = se.stream_events(spark, SF_DIR)
    out = se.run_bounded(user_profiles(stream), "t_profiles", output_mode="update")
    # update mode may emit a row per user per micro-batch; the LAST row per
    # user is the converged profile
    latest = {}
    for r in out.collect():
        latest[r["user_id"]] = (r["n_events"], r["sum_value"], r["last_seen_us"])
    want = {
        r["user_id"]: (r["n"], r["s"], r["last_us"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    }
    assert set(latest) == set(want)
    for u, (n, s, last) in want.items():
        gn, gs, glast = latest[u]
        assert gn == n and glast == last
        assert abs(gs - s) < 1e-6


def test_user_profiles_tws_matches_legacy_api(spark, events):
    """transformWithStateInPandas twin: parity-tested where the runtime
    supports it; in this image (no protobuf — the stateful-processor
    worker's RPC codec) the operator must refuse up front with a clear
    NotImplementedError instead of starting a query that crashes at
    PRE_INIT."""
    import pytest

    from symat_hbase_tools_spark.streaming.stateful import user_profiles_tws

    stream = se.stream_events(spark, SF_DIR)
    try:
        from google.protobuf import descriptor  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            user_profiles_tws(stream)
        return

    out = se.run_bounded(
        user_profiles_tws(stream), "t_profiles_tws", output_mode="update"
    )
    latest = {}
    for r in out.collect():
        latest[r["user_id"]] = (r["n_events"], r["sum_value"], r["last_seen_us"])
    want = {
        r["user_id"]: (r["n"], r["s"], r["last_us"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    }
    assert set(latest) == set(want)
    for u, (n, s, last) in want.items():
        gn, gs, glast = latest[u]
        assert gn == n and glast == last
        assert abs(gs - s) < 1e-6
