"""Event-time analytics: semantics + plan-shape (funnel / gap-fill /
anomaly / band join / OHLC). Cross-engine value parity is covered by
tests/test_oracle.py — these tests pin the SEMANTIC invariants and the
physical plans the operators are designed to produce."""

from __future__ import annotations

import pytest

from symat_hbase_tools_spark.operators import timeseries
from symat_hbase_tools_spark.plans.explain import plan_string
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _no_cached_plans(spark):
    spark.catalog.clearCache()
    yield


def test_funnel_counts_monotonically_shrink(spark):
    rows = {r["stage"]: r for r in timeseries.events_funnel(spark, SF_DIR).collect()}
    assert list(rows) == [1, 2, 3]
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["avg_hop_seconds"] is None
    for stage in (2, 3):
        if rows[stage]["n_users"]:
            assert rows[stage]["avg_hop_seconds"] > 0


def test_funnel_is_aggregate_only(spark):
    """First-touch funnel must not sort events: no Window, no global Sort —
    per-user minima are partial-aggregated before any join."""
    plan = plan_string(timeseries.events_funnel(spark, SF_DIR))
    assert "Window" not in plan
    assert "partial_min" in plan or "min(us)" in plan


def test_gap_fill_spine_is_dense_and_filled(spark):
    pdf = timeseries.events_gap_fill(spark, SF_DIR).toPandas()
    hours = sorted(pdf["hour_epoch"].unique())
    # dense: every hour between min and max present, per type
    assert hours == list(range(hours[0], hours[-1] + 3600, 3600))
    n_types = pdf["event_type"].nunique()
    assert len(pdf) == len(hours) * n_types
    assert (pdf["n_events"] >= 0).all()
    # forward fill: after each type's first observed hour, no null closes
    for _, g in pdf.groupby("event_type"):
        g = g.sort_values("hour_epoch")
        first = g["filled_close"].first_valid_index()
        assert g.loc[first:, "filled_close"].notna().all()


def test_anomaly_rows_all_exceed_threshold(spark):
    pdf = timeseries.events_anomaly_hours(spark, SF_DIR).toPandas()
    assert (pdf["z"].abs() > timeseries.ANOMALY_Z).all()
    # sanity: the detector is selective, not a pass-through
    hourly_rows = (
        timeseries.events_gap_fill(spark, SF_DIR)
        .filter("n_events > 0")
        .count()
    )
    assert 0 < len(pdf) < hourly_rows / 4


def test_value_bands_is_broadcast_nested_loop(spark):
    """The tiny irregular band dim must broadcast: the events side streams
    with NO shuffle before the join (the 100 TB-safe plan for an
    inequality join against an O(1)-row dimension)."""
    df = timeseries.events_value_bands(spark, SF_DIR)
    plan = plan_string(df)
    assert "BroadcastNestedLoopJoin" in plan
    pdf = df.toPandas()
    assert set(pdf["band"]) <= {b for b, _, _ in timeseries.VALUE_BANDS}
    # bands partition the value domain: totals add up to the full table
    total = sum(pdf["n_events"])
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total == n_events


def test_ohlc_single_exchange_and_invariants(spark):
    df = timeseries.events_ohlc_daily(spark, SF_DIR)
    assert plan_string(df, mode="simple").count("Exchange") == 1
    pdf = df.toPandas()
    assert (pdf["low"] <= pdf["open"]).all() and (pdf["open"] <= pdf["high"]).all()
    assert (pdf["low"] <= pdf["close"]).all() and (pdf["close"] <= pdf["high"]).all()
    assert (pdf["n_events"] > 0).all()


def test_active_users_windows_nest(spark):
    """For any day: DAU <= WAU <= MAU, and every count <= total users."""
    pdf = timeseries.events_active_users(spark, SF_DIR).toPandas()
    total_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id").distinct().count()
    )
    by_day = pdf.pivot(index="day", columns="window_days", values="n_active")
    nested = by_day.dropna()  # early days lack full trailing windows
    assert (nested[1] <= nested[7]).all() and (nested[7] <= nested[30]).all()
    assert (pdf["n_active"] <= total_users).all()
    assert set(pdf["window_days"]) == set(timeseries.ACTIVE_WINDOWS)


def test_mean_shift_flags_injected_changepoint(spark, tmp_path):
    """Inject a synthetic 10x level shift into a copy of events: the
    detector must flag hours at the jump and mean_next/mean_prev must
    reflect the two levels."""
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # amplify the second half of the stream for one type by replicating
    mid = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    cut = mid["lo"] + (mid["hi"] - mid["lo"]) / 2
    boosted = events.filter(
        (F.col("event_type") == "click") & (F.col("ts") >= F.lit(cut))
    )
    spiked = events.unionByName(boosted).unionByName(boosted)  # 3x after cut
    sf_dir = str(tmp_path / "sfdir")
    spiked.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    out = timeseries.events_mean_shift(spark, sf_dir).toPandas()
    clicks = out[out["event_type"] == "click"]
    assert len(clicks) > 0
    assert (clicks["mean_next"] > clicks["mean_prev"]).any()


def test_interarrival_histogram_accounts_every_gap(spark):
    pdf = timeseries.events_interarrival_histogram(spark, SF_DIR).toPandas()
    import pandas as pd

    events = pd.read_parquet(f"{SF_DIR}/events.parquet")
    per = events.groupby(["user_id", "event_type"]).size()
    expected_gaps = int((per - 1).clip(lower=0).sum())
    assert pdf["n_gaps"].sum() == expected_gaps
    assert (pdf["sum_gap_s"] >= 0).all()


def test_rfm_quintiles_are_balanced_partition(spark):
    pdf = timeseries.users_rfm_segments(spark, SF_DIR).toPandas()
    n = len(pdf)
    for col in ("r_quintile", "f_quintile", "m_quintile"):
        counts = pdf[col].value_counts()
        assert set(counts.index) == {1, 2, 3, 4, 5}
        # ntile balance: sizes differ by at most 1
        assert counts.max() - counts.min() <= 1
        assert counts.sum() == n
    # high-frequency users sit in better (lower) f quintiles
    top = pdf.nlargest(10, "frequency")["f_quintile"]
    bottom = pdf.nsmallest(10, "frequency")["f_quintile"]
    assert top.mean() < bottom.mean()


def test_type_correlation_bounds_and_symmetric_coverage(spark):
    pdf = timeseries.events_type_correlation(spark, SF_DIR).toPandas()
    types = set(pdf["type_a"]) | set(pdf["type_b"])
    k = len(types)
    assert len(pdf) == k * (k - 1) // 2  # every unordered pair once
    assert ((pdf["pearson_r"] >= -1.000001) & (pdf["pearson_r"] <= 1.000001)).all()
    # a series correlates perfectly with itself: sanity via variance > 0
    assert pdf["n"].nunique() == 1  # same dense spine length for all pairs


def test_dn_retention_bounds(spark):
    pdf = timeseries.users_dn_retention(spark, SF_DIR).toPandas()
    assert (pdf["n_signups"] > 0).all()
    for k in timeseries.RETENTION_DAYS:
        assert (pdf[f"d{k}_active"] <= pdf["n_signups"]).all()
        assert ((pdf[f"d{k}_rate"] >= 0) & (pdf[f"d{k}_rate"] <= 1)).all()
    # a cohort's signups sum to the distinct signup-user count
    n_signup_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter("event_type = 'signup'")
        .select("user_id").distinct().count()
    )
    assert pdf["n_signups"].sum() == n_signup_users


def test_skew_report_flags_injected_hot_key(spark, tmp_path):
    """A synthetic hot key must move every skew signal the right way."""
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    base = timeseries.events_skew_report(spark, SF_DIR).first()
    hot = events.limit(500).withColumn("user_id", F.lit(99999))
    sf_dir = str(tmp_path / "sfdir")
    events.unionByName(hot).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet"
    )
    skewed = timeseries.events_skew_report(spark, sf_dir).first()
    assert skewed["top1_share"] > base["top1_share"]
    assert skewed["gini"] > base["gini"]
    assert skewed["max_key_events"] >= 500
    assert 0 <= base["gini"] <= 1 and 0 <= skewed["gini"] <= 1


def test_active_users_approx_sketch_within_tolerance(spark):
    pdf = timeseries.events_active_users_approx(spark, SF_DIR).toPandas()
    assert pdf["sketch_ok"].all()
    # exact WAU here must match the window_days=7 slice of the exact op
    exact = timeseries.events_active_users(spark, SF_DIR).toPandas()
    w7 = exact[exact["window_days"] == 7].set_index("day")["n_active"]
    got = pdf.set_index("day")["wau_exact"]
    assert got.sort_index().equals(w7.sort_index())


def test_session_paths_top_n_and_structure(spark):
    pdf = timeseries.events_session_paths(spark, SF_DIR).toPandas()
    assert len(pdf) == timeseries.TOP_PATHS
    assert pdf["rank"].tolist() == list(range(1, timeseries.TOP_PATHS + 1))
    # counts non-increasing in rank
    assert (pdf.sort_values("rank")["n_sessions"].diff().dropna() <= 0).all()
    # paths are '>'-joined event types
    types = {"view", "click", "purchase", "signup", "error"}
    for p in pdf["path"]:
        assert set(p.split(">")) <= types


def test_markov_transitions_rows_are_distributions(spark):
    pdf = timeseries.events_markov_transitions(spark, SF_DIR).toPandas()
    sums = pdf.groupby("from_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-9).all()
    n_pairs = pdf["n"].sum()
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    expected = (events.groupby("user_id").size() - 1).clip(lower=0).sum()
    assert n_pairs == expected


def test_rfm_single_pass_bit_matches_threepass(spark):
    """The round-9 melted single-rank form must reproduce the three
    chained ranking passes bit-for-bit — every metric block is contiguous
    under the (metric, order_value, user_id) total order, so rank within
    metric = global rank - metric_index x n_users exactly."""
    new = {
        tuple(sorted(r.asDict().items()))
        for r in timeseries.users_rfm_segments(spark, SF_DIR).collect()
    }
    old = {
        tuple(sorted(r.asDict().items()))
        for r in timeseries.users_rfm_segments_threepass(spark, SF_DIR).collect()
    }
    assert new == old


def test_events_ewma_matches_python_and_converges(spark):
    """Exact-dyadic EWMA vs a python recomputation on one event type;
    invariants: a constant series smooths to itself (weights normalize),
    and the smoothed series has strictly smaller hour-to-hour variation
    than the raw one."""
    from symat_hbase_tools_spark.operators.timeseries import (
        EWMA_LAGS,
        events_ewma,
    )

    rows = [
        r
        for r in events_ewma(spark, SF_DIR).collect()
        if r["event_type"] == "view"
    ]
    rows.sort(key=lambda r: r["hour_epoch"])
    assert len(rows) > EWMA_LAGS
    v = [r["v_micros"] for r in rows]
    for t in (0, 1, EWMA_LAGS - 1, EWMA_LAGS, len(rows) - 1):
        num = den = 0
        for j in range(min(t + 1, EWMA_LAGS)):
            w = 1 << (EWMA_LAGS - 1 - j)
            num += v[t - j] * w
            den += w
        assert rows[t]["ewma"] == num / den / 1e6, t
    # smoothing reduces mean absolute hour-to-hour delta
    raw = [x / 1e6 for x in v]
    smooth = [r["ewma"] for r in rows]
    d_raw = sum(abs(a - b) for a, b in zip(raw, raw[1:])) / (len(raw) - 1)
    d_sm = sum(abs(a - b) for a, b in zip(smooth, smooth[1:])) / (len(smooth) - 1)
    assert d_sm < d_raw
    # constant series fixpoint
    const = [(i, 5.0) for i in range(40)]
    df = spark.createDataFrame(const, "i int, x double")
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.orderBy("i")
    num = None
    den = None
    for j in range(EWMA_LAGS):
        lv = F.lag("x", j).over(w) if j else F.col("x")
        wt = 1 << (EWMA_LAGS - 1 - j)
        tn = F.coalesce(lv * F.lit(wt), F.lit(0.0))
        td = F.when(lv.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = tn if num is None else num + tn
        den = td if den is None else den + td
    out = df.select((num / den).alias("e")).collect()
    assert all(abs(r["e"] - 5.0) < 1e-12 for r in out)


def test_cohort_matrix_matches_python_and_dn_consistency(spark, events):
    """Cohort triangle vs a python recomputation; week_no=0 cells cover
    every signup cohort (a signup event IS activity in its own week)."""
    from symat_hbase_tools_spark.operators.timeseries import users_cohort_matrix

    got = {
        (r["cohort_week"], r["week_no"]): (r["n_cohort"], r["n_active"], r["retention_rate"])
        for r in users_cohort_matrix(spark, SF_DIR).collect()
    }
    import datetime as dt

    def monday(ts):
        d = ts.date() - dt.timedelta(days=ts.weekday())
        return d

    sign: dict = {}
    act: dict = {}
    for r in events.collect():
        w = monday(r["ts"])
        act.setdefault(r["user_id"], set()).add(w)
        if r["event_type"] == "signup":
            u = r["user_id"]
            sign[u] = min(sign.get(u, w), w)
    cohorts: dict = {}
    for u, cw in sign.items():
        cohorts.setdefault(cw, set()).add(u)
    want = {}
    for cw, users in cohorts.items():
        for u in users:
            for w in act[u]:
                if w >= cw:
                    k = (cw.isoformat(), (w - cw).days // 7)
                    want.setdefault(k, set()).add(u)
    want = {
        k: (len(cohorts[dt.date.fromisoformat(k[0])]), len(us),
            len(us) / len(cohorts[dt.date.fromisoformat(k[0])]))
        for k, us in want.items()
    }
    assert got == want
    # every cohort has a week-0 row with full retention of its signups
    for cw, users in cohorts.items():
        n_c, n_a, rate = got[(cw.isoformat(), 0)]
        assert n_c == len(users) and n_a == len(users) and rate == 1.0


def test_heavy_hitters_exact_vs_plain_groupby(spark):
    """The MG candidate stage must not change the answer: output ==
    plain groupBy count thresholded, on the real fixture (phi=128)."""
    import pyspark.sql.functions as F

    from symat_hbase_tools_spark.operators.timeseries import events_heavy_hitters
    from symat_hbase_tools_spark.sources.tables import load_table

    got = {
        (r["user_id"], r["n_events"])
        for r in events_heavy_hitters(spark, SF_DIR).collect()
    }
    events = load_table(spark, SF_DIR, "events")
    n = events.count()
    want = {
        (r["user_id"], r["cnt"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 128 > n)
        .collect()
    }
    assert got == want


def test_heavy_hitters_mg_guarantee_under_tiny_capacity(spark, tmp_path):
    """Planted skew: one user owns ~30% of events among 500 distinct
    light users. Even with capacity=8 (far fewer slots than distinct
    keys, many decrement rounds) the MG candidates must retain the heavy
    user — the n/(capacity+1) guarantee — and the exact recount returns
    exactly that user at phi=4."""
    import pyspark.sql.functions as F

    from symat_hbase_tools_spark.operators.timeseries import events_heavy_hitters

    rows = [(i, 999, "click", 0.0, "{}") for i in range(600)]
    rows += [(600 + i, i % 500, "click", 0.0, "{}") for i in range(1400)]
    df = spark.createDataFrame(
        [(eid, u, t, v, p) for eid, u, t, v, p in rows],
        "event_id long, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    df.select("event_id", "ts", "user_id", "event_type", "value", "props").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = events_heavy_hitters(spark, str(tmp_path), phi=4, capacity=8).collect()
    assert [(r["user_id"], r["n_events"]) for r in got] == [(999, 600)]


def test_heavy_hitters_phi_over_capacity_refused(spark):
    import pytest

    from symat_hbase_tools_spark.operators.timeseries import events_heavy_hitters

    with pytest.raises(ValueError, match="phi"):
        events_heavy_hitters(spark, SF_DIR, phi=512, capacity=256)


def test_heavy_hitters_randomized_exactness(spark, tmp_path):
    """Seeded randomized check: for random zipf-ish user distributions and
    random (phi, capacity) with phi <= capacity, the MG-candidates +
    exact-recount output must equal the plain thresholded groupBy — the
    sketch may never change the answer, only bound the state."""
    import random

    import pyspark.sql.functions as F

    for seed in (3, 31, 99):
        rng = random.Random(seed)
        n_users = rng.randint(20, 300)
        weights = [1.0 / (i + 1) ** rng.uniform(0.5, 1.5) for i in range(n_users)]
        users = rng.choices(range(n_users), weights=weights, k=4000)
        rows = [(i, u, "click", 0.0, "{}") for i, u in enumerate(users)]
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
        df.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

        capacity = rng.randint(8, 64)
        phi = rng.randint(4, capacity)
        from symat_hbase_tools_spark.operators.timeseries import (
            events_heavy_hitters,
        )

        got = {
            (r["user_id"], r["n_events"])
            for r in events_heavy_hitters(
                spark, str(tmp_path), phi=phi, capacity=capacity
            ).collect()
        }
        from collections import Counter

        cnt = Counter(users)
        want = {(u, c) for u, c in cnt.items() if c * phi > len(users)}
        assert got == want, (seed, phi, capacity, got ^ want)
