"""Keyless range join (grid buckets) + sweep-line concurrency tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators import rangejoin as rj
from tests.conftest import SF_DIR


def test_range_bucket_join_equals_naive(spark):
    """Grid bucketing must emit EXACTLY the naive inequality-join pairs —
    each matched pair exactly once (a point lives in one bucket), at any
    bucket width, including intervals far longer/shorter than the grid."""
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([5, 10, 99, 100, 101, 250, 999])],
        "pid long, p long",
    )
    intervals = spark.createDataFrame(
        [
            (0, 0, 1000),      # covers everything (many buckets)
            (1, 100, 100),     # zero-length, inclusive bounds
            (2, 90, 110),      # straddles a bucket boundary
            (3, 400, 500),     # empty of points
            (4, 999, 2000),    # tail
        ],
        "iid long, lo long, hi long",
    )
    for g in (7, 100, 1000, 10_000):
        got = {
            (r["pid"], r["iid"])
            for r in rj.range_bucket_join(
                points, intervals, "p", "lo", "hi", bucket_width=g
            ).collect()
        }
        want = {
            (r["pid"], r["iid"])
            for r in points.crossJoin(intervals)
            .filter((F.col("lo") <= F.col("p")) & (F.col("p") <= F.col("hi")))
            .collect()
        }
        assert got == want, f"bucket_width={g}"
    assert (3 in {i for _, i in want}) is False  # empty interval really empty
    # zero-length inclusive interval [100,100] contains point p=100 (pid 3)
    assert (3, 1) in want


def test_session_window_hits_match_naive_interval_join(spark):
    """The registry query's grid-bucket plan == the naive keyless join."""
    events = None
    from symat_hbase_tools_spark.sources.tables import load_table

    events = load_table(spark, SF_DIR, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_micros(F.col("ts")).alias("t_us")
    )
    ivals = rj.session_intervals(events, min_events=3)
    naive = (
        purchases.crossJoin(
            ivals.select("start_us", "end_us")
        )
        .filter(
            (F.col("start_us") <= F.col("t_us"))
            & (F.col("t_us") <= F.col("end_us"))
        )
        .groupBy("event_id", "t_us")
        .agg(F.count(F.lit(1)).alias("n_active_sessions"))
    )
    snap = lambda df: {  # noqa: E731
        (r["event_id"], r["n_active_sessions"]) for r in df.collect()
    }
    assert snap(rj.events_session_window_hits(spark, SF_DIR)) == snap(naive)


def test_concurrency_sweep_invariants(spark):
    """Sweep-line invariants: n_active >= 0 everywhere (starts sort before
    ends at equal t), final prefix sum is 0 (every +1 has its -1), and the
    peak equals the naive pointwise maximum."""
    out = rj.events_concurrency(spark, SF_DIR).collect()
    assert all(r["n_active"] >= 0 for r in out)
    total = sum(r["delta"] for r in out)
    assert total == 0
    # pointwise check at every start boundary via the naive count
    from symat_hbase_tools_spark.sources.tables import load_table

    ivals = rj.session_intervals(
        load_table(spark, SF_DIR, "events"), min_events=2
    ).collect()
    spans = [(r["start_us"], r["end_us"]) for r in ivals]
    peak_naive = max(
        sum(1 for lo, hi in spans if lo <= t <= hi) for t, _ in spans
    )
    assert max(r["n_active"] for r in out) == peak_naive


def test_knn_label_vote_census_is_total(spark):
    """The census covers every labeled vector exactly once. The fixture's
    labels are (by construction) nearly orthogonal to embedding geometry —
    max within-label cosine < 0.8, see embedding_near_dup_lsh_check — so
    accuracy correctly reads NEAR CHANCE here; the probe's job is to
    measure that, not to flatter it."""
    from symat_hbase_tools_spark.operators.similarity import knn_label_vote
    from symat_hbase_tools_spark.sources.tables import load_table

    rows = knn_label_vote(spark, SF_DIR).collect()
    n_labeled = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("label").isNotNull())
        .count()
    )
    assert sum(r["n_queries"] for r in rows) == n_labeled
    assert all(0.0 <= r["accuracy"] <= 1.0 for r in rows)
    assert all(r["n_correct"] <= r["n_queries"] for r in rows)


def test_knn_label_vote_recovers_planted_clusters(spark, tmp_path):
    """On a genuinely label-clustered corpus the probe must read ~1.0:
    three tight Gaussian clusters, one per label — every vector's
    neighbors share its label, so the majority vote is unanimous."""
    import numpy as np

    from symat_hbase_tools_spark.operators.similarity import knn_label_vote

    rng = np.random.default_rng(7)
    rows = []
    for lbl in range(3):
        center = np.zeros(8)
        center[lbl] = 10.0
        for i in range(20):
            v = center + rng.normal(0, 0.05, 8)
            rows.append((lbl * 100 + i, [float(x) for x in v], lbl))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = knn_label_vote(spark, str(tmp_path)).collect()
    assert sum(r["n_queries"] for r in out) == 60
    assert all(r["accuracy"] == 1.0 for r in out), out


def test_hybrid_rrf_fuses_both_lists(spark):
    """RRF output: every doc carries at least one rank; a doc present in
    both lists outranks a same-rank single-list doc; scores descend."""
    from symat_hbase_tools_spark.operators.pipeline import hybrid_search_rrf

    rows = hybrid_search_rrf(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    assert all(
        r["lex_rank"] is not None or r["sem_rank"] is not None for r in rows
    )
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    both = [r for r in rows if r["lex_rank"] and r["sem_rank"]]
    single = [r for r in rows if (r["lex_rank"] is None) ^ (r["sem_rank"] is None)]
    if both and single:
        assert max(b["rrf_score"] for b in both) > min(
            s["rrf_score"] for s in single
        )


def test_autotune_floor_caps_whale_interval_replication(spark):
    """A long-tail whale interval in a short-median corpus must not
    explode: the autotuned width is floored at
    max_span/MAX_BUCKETS_PER_INTERVAL, and the join still returns the
    exact pair set."""
    short = [(i, i * 1000, i * 1000 + 30) for i in range(500)]  # span 30
    whale = [(999, 0, 3_000_000_000)]  # span 3e9 -> 1e8 buckets unfloored
    ivals = spark.createDataFrame(
        short + whale, "iid long, lo long, hi long"
    )
    g = rj.autotune_bucket_width(ivals, "lo", "hi")
    assert g >= 3_000_000_000 // rj.MAX_BUCKETS_PER_INTERVAL
    points = spark.createDataFrame(
        [(1, 15), (2, 250_000), (3, 2_999_999_999)], "pid long, p long"
    )
    got = {
        (r["pid"], r["iid"])
        for r in rj.range_bucket_join(
            points, ivals, "p", "lo", "hi", bucket_width=None
        ).collect()
    }
    # every point is inside the whale; point 1 also inside interval 0
    # ([0, 30]) and point 2 inside interval 250 ([250000, 250030])
    assert got == {(1, 999), (2, 999), (3, 999), (1, 0), (2, 250)}


def test_range_bucket_join_negative_axis(spark):
    """Pre-1970 epochs (negative values): trunc-toward-zero bucketing is
    MONOTONE, so b(lo) <= b(p) <= b(hi) still holds and the equi-join
    stays exhaustive — pinned here so a future floor-division 'fix' on
    one side only cannot silently break the pairing."""
    points = spark.createDataFrame(
        [(1, -15), (2, -5), (3, 0), (4, 7)], "pid long, p long"
    )
    intervals = spark.createDataFrame(
        [(0, -20, -10), (1, -7, 3), (2, -100, 100)],
        "iid long, lo long, hi long",
    )
    for g in (3, 10, 1000):
        got = {
            (r["pid"], r["iid"])
            for r in rj.range_bucket_join(
                points, intervals, "p", "lo", "hi", bucket_width=g
            ).collect()
        }
        want = {
            (r["pid"], r["iid"])
            for r in points.crossJoin(intervals)
            .filter((F.col("lo") <= F.col("p")) & (F.col("p") <= F.col("hi")))
            .collect()
        }
        assert got == want, f"g={g}: {got ^ want}"
