"""Event-time analytics + streaming (sessionization, windows,
rollups, attribution, sketches).

Registration fragment: QUERIES (Spark callables) + ORACLE_SQL (DuckDB)
assembled by registry/__init__.py; split out of entry.py in round 13.
"""

from __future__ import annotations

from symat_hbase_tools_spark.registry.wrappers import (
    events_kv_state,
    events_rollup_exactly_once,
    events_salted_agg,
    events_session_window,
    events_stateful_profiles,
    events_value_drift,
    rangejoin,
    relational,
    timeseries,
)
from symat_hbase_tools_spark.registry.sqlcommon import (
    _money,
)

QUERIES = {
    "events_json_extract": relational.events_json_extract,
    # event-time surface (the round-1 NTZ failure class — all six)
    "events_kv_state": events_kv_state,
    "asof_purchase_signup": relational.asof_purchase_signup,
    "events_sessionize": relational.events_sessionize,
    # round-12: keyless range join (grid buckets) + sweep-line concurrency
    "events_session_window_hits": rangejoin.events_session_window_hits,
    "events_concurrency": rangejoin.events_concurrency,
    "events_session_window": events_session_window,
    "events_stateful_profiles": events_stateful_profiles,
    "purchase_attribution": relational.purchase_attribution,
    "click_conversion_full": relational.click_conversion_full,
    # event-time analytics (round 3)
    "events_funnel": timeseries.events_funnel,
    "events_gap_fill": timeseries.events_gap_fill,
    "events_hourly_incremental": timeseries.events_hourly_incremental,
    # round-10: exact-dyadic EWMA smoothing (alpha = 1/2, 16-hour kernel)
    "events_ewma": timeseries.events_ewma,
    # round-11: diurnal seasonal profile + the seasonal-naive forecast
    # baseline every real predictor must beat
    "events_seasonal_hourly": timeseries.events_seasonal_hourly,
    "events_seasonal_naive_backtest": timeseries.events_seasonal_naive_backtest,
    "events_burst_users": lambda spark, sf: timeseries.events_burst_users(spark, sf),
    # round-14: exact heavy hitters at bounded state (Misra-Gries
    # candidates + exact recount)
    "events_heavy_hitters": lambda spark, sf: timeseries.events_heavy_hitters(
        spark, sf
    ),
    # round-10: full weekly cohort-retention triangle
    "users_cohort_matrix": timeseries.users_cohort_matrix,
    "events_value_drift": events_value_drift,
    "events_hourly": relational.events_hourly,
    "events_sliding_6h": relational.events_sliding_6h,
    "events_by_segment": relational.events_by_segment,
    "sketch_event_stats": relational.sketch_event_stats,
    # round-2 operators
    "events_salted_agg": events_salted_agg,
    "events_exactly_once": relational.events_exactly_once,
    # round-12: the REAL-stream exactly-once drill (injected post-commit
    # crash + checkpoint replay through the generation sink)
    "events_rollup_exactly_once": events_rollup_exactly_once,
    # round-3 operators: event-time analytics siblings (funnel/gap-fill/
    # incremental sit in-window)
    "events_anomaly_hours": timeseries.events_anomaly_hours,
    "events_value_bands": timeseries.events_value_bands,
    "events_ohlc_daily": timeseries.events_ohlc_daily,
    "events_attribution_decay": timeseries.events_attribution_decay,
    # round-3: engagement metrics + changepoint detection
    "events_active_users": timeseries.events_active_users,
    "events_mean_shift": timeseries.events_mean_shift,
    # round-3: latency histogram, RFM segmentation, series correlation
    "events_interarrival_histogram": timeseries.events_interarrival_histogram,
    "users_rfm_segments": timeseries.users_rfm_segments,
    "events_type_correlation": timeseries.events_type_correlation,
    # round-3: cohort retention + skew diagnostics
    "users_dn_retention": timeseries.users_dn_retention,
    "events_skew_report": timeseries.events_skew_report,
    # round-3: HLL scale path of active-users + Zipf corpus diagnostic
    "events_active_users_approx": timeseries.events_active_users_approx,
    # round-12: mergeable quantile sketch next to the exact percentile
    # (the HLL gate's sibling for the sketch family)
    "events_percentile_sketch_check": timeseries.events_percentile_sketch_check,
    # round-3: journey analytics (session paths + Markov transitions)
    "events_session_paths": timeseries.events_session_paths,
    "events_markov_transitions": timeseries.events_markov_transitions,
}

ORACLE_SQL = {
    "events_kv_state": """
        WITH cells AS (
            SELECT printf('user#%08d', user_id) AS row_key,
                   event_type AS qualifier,
                   epoch_us(ts) AS ts,
                   printf('%.3f', value) AS value
            FROM events
        ), ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY row_key, qualifier
                       ORDER BY ts DESC, value DESC) AS rn
            FROM cells
        )
        SELECT row_key, qualifier, ts, value FROM ranked WHERE rn = 1
    """,
    "events_json_extract": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "events_hourly": f"""
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               event_type, COUNT(*) AS n_events,
               {_money('value')} AS sum_value
        FROM events GROUP BY 1, 2
    """,
    # round-12: the streaming crash-drill rollup must converge to the
    # SAME one-shot hourly aggregate — exactly-once means the injected
    # replay is invisible in the final state
    "events_rollup_exactly_once": f"""
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               event_type, COUNT(*) AS n_events,
               {_money('value')} AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sliding_6h": """
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - i * 3600 AS window_start,
               event_type, COUNT(*) AS n_events
        FROM events, range(0, 6) r(i)
        GROUP BY 1, 2
    """,
    # sketch_event_stats: tolerance oracle — exact distinct/median plus
    # booleans asserting the HLL / KLL estimates are within documented
    # bounds (5% / 2%). ann_ivf_topk stays rows-only (k-means cells are
    # engine-specific; recall-tested vs brute force locally).
    "sketch_event_stats": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               CAST(quantile_cont(value, 0.5) AS DOUBLE) AS exact_p50_value,
               TRUE AS hll_within_bound,
               TRUE AS kll_within_bound
        FROM events GROUP BY event_type
    """,
    # round-12: keyless point-in-interval join — the oracle runs the naive
    # inequality join (DuckDB IEJoin handles test scales); the engine runs
    # the grid-bucket equi-join, never a nested loop
    "events_session_window_hits": """
        WITH b AS (
            SELECT user_id, epoch_us(ts) AS t_us, event_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 0
                        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > 28800000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sid AS (
            SELECT user_id, t_us,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id
                        ORDER BY t_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_seq
            FROM b
        ),
        s AS (
            SELECT user_id, session_seq,
                   MIN(t_us) AS start_us, MAX(t_us) AS end_us,
                   COUNT(*) AS n
            FROM sid GROUP BY 1, 2 HAVING COUNT(*) >= 3
        ),
        p AS (SELECT event_id, epoch_us(ts) AS t_us FROM events
              WHERE event_type = 'purchase')
        SELECT p.event_id, p.t_us,
               CAST(COUNT(*) AS BIGINT) AS n_active_sessions
        FROM p JOIN s ON s.start_us <= p.t_us AND p.t_us <= s.end_us
        GROUP BY 1, 2
    """,
    # round-12: sweep-line concurrency — one window cumsum over the total
    # sweep order mirrors the engine's distributed prefix sum exactly
    "events_concurrency": """
        WITH b AS (
            SELECT user_id, epoch_us(ts) AS t_us, event_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 0
                        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > 28800000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sid AS (
            SELECT user_id, t_us,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id
                        ORDER BY t_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_seq
            FROM b
        ),
        s AS (
            SELECT user_id, session_seq,
                   MIN(t_us) AS start_us, MAX(t_us) AS end_us
            FROM sid GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        d AS (
            SELECT start_us AS t_us, 1 AS delta, user_id, session_seq FROM s
            UNION ALL
            SELECT end_us, -1, user_id, session_seq FROM s
        )
        SELECT t_us, user_id, session_seq, CAST(delta AS INT) AS delta,
               CAST(SUM(delta) OVER (
                   ORDER BY t_us, delta DESC, user_id, session_seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_active
        FROM d
    """,
    "events_sessionize": """
        WITH g AS (
            SELECT user_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 0
                        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000 THEN 1
                        ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        )
        SELECT user_id, CAST(SUM(is_new) + 1 AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM g GROUP BY user_id
    """,
    # events_stateful_profiles: converged per-user running profile of the
    # REAL stateful stream (integer-micros accumulation is micro-batch-
    # order independent — see MicroProfileProcessor)
    "events_stateful_profiles": """
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
                   AS value_micros,
               MAX(epoch_us(ts)) AS last_seen_us
        FROM events GROUP BY user_id
    """,
    "events_session_window": """
        WITH o AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 28800000000 THEN 1
                        ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), s AS (
            SELECT user_id, us,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(MIN(us) // 1000000 AS BIGINT) AS session_start
        FROM s GROUP BY user_id, sid
    """,
    "purchase_attribution": """
        SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND epoch_us(c.ts) <= epoch_us(p.ts)
         AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    "click_conversion_full": """
        SELECT c.event_id AS click_id,
               COALESCE(c.user_id, p.user_id) AS user_id,
               p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND epoch_us(p.ts) >= epoch_us(c.ts)
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
    """,
    "asof_purchase_signup": """
        WITH w AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
                   max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS last_signup_us
            FROM events)
        SELECT event_id, user_id, us AS purchase_us, last_signup_us,
               us - last_signup_us AS us_since_signup
        FROM w WHERE event_type = 'purchase'
    """,
    "events_session_paths": """
        WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
                   FROM events),
        lagged AS (SELECT *, lag(us) OVER (PARTITION BY user_id
                                           ORDER BY us, event_id) AS prev
                   FROM e),
        s AS (SELECT *, SUM(CASE WHEN prev IS NULL THEN 0
                                 WHEN us - prev > 28800000000 THEN 1
                                 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY us, event_id)
                            AS session_no
              FROM lagged),
        p AS (SELECT user_id, session_no,
                     string_agg(event_type, '>' ORDER BY us, event_id) AS path
              FROM s GROUP BY 1, 2),
        c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
              FROM p GROUP BY 1),
        r AS (SELECT *, CAST(row_number() OVER (ORDER BY n_sessions DESC,
                                                path ASC) AS INTEGER) AS rank
              FROM c)
        SELECT rank, path, n_sessions FROM r WHERE rank <= 20
    """,
    "events_markov_transitions": """
        WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
                   FROM events),
        pr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY us, event_id)
                          AS from_type,
                      event_type AS to_type
               FROM e),
        c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM pr WHERE from_type IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
              FROM c GROUP BY 1)
        SELECT from_type, to_type, n, CAST(n AS DOUBLE) / n_from AS p
        FROM c JOIN t USING (from_type)
    """,
    "events_by_segment": f"""
        SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
               {_money('value')} AS sum_value
        FROM events LEFT JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2
    """,
    # salted agg: the oracle is the PLAIN group-by — equality proves the
    # two-phase salted rewrite is semantics-preserving
    "events_salted_agg": f"""
        SELECT event_type, COUNT(*) AS n_events, {_money("value")} AS sum_value
        FROM events GROUP BY event_type
    """,
    "events_exactly_once": f"""
        WITH base AS (SELECT event_id, ts, event_type, value FROM events),
        re AS (SELECT * FROM base
               UNION ALL
               SELECT event_id, ts + INTERVAL 1 SECOND, event_type, value FROM base),
        d AS (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rk
              FROM re)
        SELECT event_type, COUNT(*) AS n_events, {_money("value")} AS sum_value
        FROM d WHERE rk = 1 GROUP BY event_type
    """,
    # ------------------------------------------------------------------
    # round-3: event-time analytics
    # ------------------------------------------------------------------
    "events_funnel": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, MIN(us) AS prev_us FROM e
               WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, MIN(us) AS prev_us FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND us > s1.prev_us GROUP BY 1),
        s3 AS (SELECT e.user_id, MIN(us) AS prev_us FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND us > s2.prev_us GROUP BY 1)
        SELECT CAST(1 AS INTEGER) AS stage, 'view' AS event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(NULL AS DOUBLE) AS avg_hop_seconds FROM s1
        UNION ALL
        SELECT 2, 'click', CAST(COUNT(*) AS BIGINT),
               CAST(CAST(SUM(s2.prev_us - s1.prev_us) AS BIGINT) AS DOUBLE)
                   / COUNT(*) / 1e6
        FROM s2 JOIN s1 USING (user_id)
        UNION ALL
        SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT),
               CAST(CAST(SUM(s3.prev_us - s2.prev_us) AS BIGINT) AS DOUBLE)
                   / COUNT(*) / 1e6
        FROM s3 JOIN s2 USING (user_id)
    """,
    # exact-dyadic EWMA: identical 16-lag power-of-two kernel; num/den
    # are exact bigint sums, ewma divides identical bigints
    "events_ewma": """
        WITH hourly AS (
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS v
            FROM events GROUP BY 1, 2),
        bounds AS (SELECT MIN(hour_epoch) AS lo, MAX(hour_epoch) AS hi FROM hourly),
        spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_epoch
                  FROM bounds),
        grid AS (SELECT s.hour_epoch, t.event_type,
                        COALESCE(h.n, 0) AS n, COALESCE(h.v, 0) AS v
                 FROM spine s
                 CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
                 LEFT JOIN hourly h
                   ON h.hour_epoch = s.hour_epoch
                  AND h.event_type = t.event_type)
        SELECT hour_epoch, event_type, n AS n_events, v AS v_micros,
               CAST((COALESCE(v * 32768, 0) + COALESCE(lag(v, 1) OVER w * 16384, 0) + COALESCE(lag(v, 2) OVER w * 8192, 0) + COALESCE(lag(v, 3) OVER w * 4096, 0) + COALESCE(lag(v, 4) OVER w * 2048, 0) + COALESCE(lag(v, 5) OVER w * 1024, 0) + COALESCE(lag(v, 6) OVER w * 512, 0) + COALESCE(lag(v, 7) OVER w * 256, 0) + COALESCE(lag(v, 8) OVER w * 128, 0) + COALESCE(lag(v, 9) OVER w * 64, 0) + COALESCE(lag(v, 10) OVER w * 32, 0) + COALESCE(lag(v, 11) OVER w * 16, 0) + COALESCE(lag(v, 12) OVER w * 8, 0) + COALESCE(lag(v, 13) OVER w * 4, 0) + COALESCE(lag(v, 14) OVER w * 2, 0) + COALESCE(lag(v, 15) OVER w * 1, 0)) AS DOUBLE)
                   / (CASE WHEN v IS NOT NULL THEN 32768 ELSE 0 END + CASE WHEN lag(v, 1) OVER w IS NOT NULL THEN 16384 ELSE 0 END + CASE WHEN lag(v, 2) OVER w IS NOT NULL THEN 8192 ELSE 0 END + CASE WHEN lag(v, 3) OVER w IS NOT NULL THEN 4096 ELSE 0 END + CASE WHEN lag(v, 4) OVER w IS NOT NULL THEN 2048 ELSE 0 END + CASE WHEN lag(v, 5) OVER w IS NOT NULL THEN 1024 ELSE 0 END + CASE WHEN lag(v, 6) OVER w IS NOT NULL THEN 512 ELSE 0 END + CASE WHEN lag(v, 7) OVER w IS NOT NULL THEN 256 ELSE 0 END + CASE WHEN lag(v, 8) OVER w IS NOT NULL THEN 128 ELSE 0 END + CASE WHEN lag(v, 9) OVER w IS NOT NULL THEN 64 ELSE 0 END + CASE WHEN lag(v, 10) OVER w IS NOT NULL THEN 32 ELSE 0 END + CASE WHEN lag(v, 11) OVER w IS NOT NULL THEN 16 ELSE 0 END + CASE WHEN lag(v, 12) OVER w IS NOT NULL THEN 8 ELSE 0 END + CASE WHEN lag(v, 13) OVER w IS NOT NULL THEN 4 ELSE 0 END + CASE WHEN lag(v, 14) OVER w IS NOT NULL THEN 2 ELSE 0 END + CASE WHEN lag(v, 15) OVER w IS NOT NULL THEN 1 ELSE 0 END) / 1e6 AS ewma
        FROM grid
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch)
    """,
    # cohort triangle: Monday epochs from date_trunc('week') in BOTH
    # engines (ISO weeks), offsets are exact integer divisions; rates
    # divide exact count-distincts
    "users_cohort_matrix": """
        WITH s AS (SELECT user_id,
                          CAST(MIN(epoch(date_trunc('week', ts))) AS BIGINT)
                              AS cohort_wk
                   FROM events WHERE event_type = 'signup'
                   GROUP BY user_id),
        cs AS (SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_cohort
               FROM s GROUP BY 1),
        a AS (SELECT DISTINCT user_id,
                     CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS act_wk
              FROM events),
        cells AS (SELECT cohort_wk,
                         CAST((act_wk - cohort_wk) / 604800 AS BIGINT)
                             AS week_no,
                         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
                  FROM s JOIN a USING (user_id)
                  WHERE act_wk >= cohort_wk
                  GROUP BY 1, 2)
        SELECT strftime(to_timestamp(cohort_wk), '%Y-%m-%d') AS cohort_week,
               week_no, n_cohort, n_active,
               CAST(n_active AS DOUBLE) / n_cohort AS retention_rate
        FROM cells JOIN cs USING (cohort_wk)
    """,
    "events_gap_fill": """
        WITH hourly AS (
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   arg_max(value, printf('%018d%010d', epoch_us(ts), event_id))
                       AS close
            FROM events GROUP BY 1, 2),
        bounds AS (SELECT MIN(hour_epoch) AS lo, MAX(hour_epoch) AS hi FROM hourly),
        spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_epoch
                  FROM bounds),
        grid AS (SELECT hour_epoch, event_type
                 FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM hourly))
        SELECT g.hour_epoch, g.event_type,
               COALESCE(h.n, 0) AS n_events,
               last_value(h.close IGNORE NULLS)
                   OVER (PARTITION BY g.event_type ORDER BY g.hour_epoch)
                   AS filled_close
        FROM grid g LEFT JOIN hourly h USING (hour_epoch, event_type)
    """,
    "events_anomaly_hours": """
        WITH hourly AS (
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        stats AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS h,
                   CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS q
            FROM hourly GROUP BY 1),
        scored AS (
            SELECT event_type, hour_epoch, n AS n_events,
                   (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / h)
                       / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / h)
                              / (h - 1)) AS z
            FROM hourly JOIN stats USING (event_type))
        SELECT * FROM scored WHERE abs(z) > 2.5
    """,
    "events_value_bands": f"""
        WITH bands(band, lo, hi) AS (VALUES
            ('micro', CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)),
            ('small', 1, 5), ('mid', 5, 20), ('large', 20, 100),
            ('whale', 100, CAST('infinity' AS DOUBLE)))
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_events,
               {_money('value')} AS sum_value,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY band
    """,
    "events_ohlc_daily": f"""
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               arg_min(value, printf('%018d%010d', epoch_us(ts), event_id)) AS open,
               MAX(value) AS high, MIN(value) AS low,
               arg_max(value, printf('%018d%010d', epoch_us(ts), event_id)) AS close,
               {_money('value')} AS volume,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "events_value_drift": """
        WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v, ts FROM events),
        base AS (SELECT * FROM ev WHERE ts < TIMESTAMP '2024-01-16'),
        cur  AS (SELECT * FROM ev WHERE ts >= TIMESTAMP '2024-01-16'),
        cuts AS (SELECT event_type,
                        quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs
                 FROM base GROUP BY event_type),
        bb AS (SELECT b.event_type,
                      CAST((v > cs[1]) AS INT) + CAST((v > cs[2]) AS INT) +
                      CAST((v > cs[3]) AS INT) + CAST((v > cs[4]) AS INT) +
                      CAST((v > cs[5]) AS INT) + CAST((v > cs[6]) AS INT) +
                      CAST((v > cs[7]) AS INT) + CAST((v > cs[8]) AS INT) +
                      CAST((v > cs[9]) AS INT) AS bucket
               FROM base b JOIN cuts USING (event_type)),
        cb AS (SELECT c.event_type,
                      CAST((v > cs[1]) AS INT) + CAST((v > cs[2]) AS INT) +
                      CAST((v > cs[3]) AS INT) + CAST((v > cs[4]) AS INT) +
                      CAST((v > cs[5]) AS INT) + CAST((v > cs[6]) AS INT) +
                      CAST((v > cs[7]) AS INT) + CAST((v > cs[8]) AS INT) +
                      CAST((v > cs[9]) AS INT) AS bucket
               FROM cur c JOIN cuts USING (event_type)),
        bn AS (SELECT event_type, bucket, COUNT(*) AS n_base FROM bb GROUP BY 1, 2),
        cn AS (SELECT event_type, bucket, COUNT(*) AS n_cur FROM cb GROUP BY 1, 2),
        per AS (SELECT COALESCE(bn.event_type, cn.event_type) AS event_type,
                       COALESCE(bn.bucket, cn.bucket) AS bucket,
                       COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
                FROM bn FULL OUTER JOIN cn
                  ON bn.event_type = cn.event_type AND bn.bucket = cn.bucket),
        tot AS (SELECT event_type, SUM(n_base) AS tb, SUM(n_cur) AS tc
                FROM per GROUP BY event_type),
        p AS (SELECT per.event_type, bucket,
                     (n_base + 0.5) / (tb + 0.5 * 10) AS pb,
                     (n_cur + 0.5) / (tc + 0.5 * 10) AS pc
              FROM per JOIN tot USING (event_type))
        SELECT event_type,
               ROUND(SUM((pc - pb) * ln(pc / pb)), 5) AS psi,
               COUNT(*) AS n_buckets_used
        FROM p GROUP BY event_type
    """,
    "events_attribution_decay": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        c AS (SELECT user_id, us AS click_us FROM e WHERE event_type = 'click'),
        p AS (SELECT user_id, us AS purchase_us FROM e
              WHERE event_type = 'purchase'),
        pairs AS (SELECT c.user_id, click_us, purchase_us
                  FROM c JOIN p USING (user_id)
                  WHERE click_us < purchase_us
                    AND purchase_us - click_us <= 604800000000)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_touch_pairs,
               round(SUM(exp(-(purchase_us - click_us) / 86400000000.0)), 6)
                   AS total_credit
        FROM pairs GROUP BY 1
    """,
    # full recompute over ALL events — equality proves the base+delta merge
    # of the mergeable (count, integer-micros hi/lo) states is lossless
    "events_hourly_incremental": f"""
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               event_type, COUNT(*) AS n_events,
               {_money('value')} AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_active_users": """
        WITH pairs AS (SELECT DISTINCT
                           CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                               AS day_no,
                           user_id
                       FROM events),
        hi AS (SELECT MAX(day_no) AS hi FROM pairs),
        fan AS (
            SELECT user_id, CAST(1 AS INTEGER) AS window_days,
                   day_no AS report_day FROM pairs
            UNION ALL
            SELECT user_id, 7, day_no + x.i FROM pairs, range(0, 7) x(i)
            UNION ALL
            SELECT user_id, 30, day_no + x.i FROM pairs, range(0, 30) x(i))
        SELECT strftime(make_timestamp(report_day * 86400 * 1000000),
                        '%Y-%m-%d') AS day,
               window_days,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM fan CROSS JOIN hi
        WHERE report_day <= hi
        GROUP BY 1, 2
    """,
    "events_mean_shift": """
        WITH hourly AS (
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        bounds AS (SELECT MIN(hour_epoch) AS lo, MAX(hour_epoch) AS hi FROM hourly),
        spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_epoch
                  FROM bounds),
        grid AS (SELECT hour_epoch, event_type
                 FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM hourly)),
        filled AS (SELECT g.hour_epoch, g.event_type,
                          COALESCE(h.n, 0) AS n_events
                   FROM grid g LEFT JOIN hourly h USING (hour_epoch, event_type)),
        scored AS (
            SELECT event_type, hour_epoch,
                   SUM(n_events) OVER w_prev AS s_prev,
                   COUNT(*) OVER w_prev AS c_prev,
                   SUM(n_events) OVER w_next AS s_next,
                   COUNT(*) OVER w_next AS c_next
            FROM filled
            WINDOW w_prev AS (PARTITION BY event_type ORDER BY hour_epoch
                              ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
                   w_next AS (PARTITION BY event_type ORDER BY hour_epoch
                              ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING)),
        means AS (
            SELECT event_type, hour_epoch,
                   CAST(s_prev AS DOUBLE) / c_prev AS mean_prev,
                   CAST(s_next AS DOUBLE) / c_next AS mean_next,
                   CAST(s_next AS DOUBLE) / c_next
                       - CAST(s_prev AS DOUBLE) / c_prev AS shift
            FROM scored WHERE c_prev = 24 AND c_next = 24)
        SELECT * FROM means WHERE abs(shift) > 0.75 * mean_prev
    """,
    "events_interarrival_histogram": """
        WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
                   FROM events),
        g AS (SELECT event_type,
                     (us - lag(us) OVER (PARTITION BY user_id, event_type
                                         ORDER BY us, event_id)) // 1000000
                         AS gap_s
              FROM e),
        f AS (SELECT event_type, gap_s,
                     CASE WHEN gap_s < 60 THEN '<60s'
                          WHEN gap_s < 600 THEN '<600s'
                          WHEN gap_s < 3600 THEN '<3600s'
                          WHEN gap_s < 21600 THEN '<21600s'
                          WHEN gap_s < 86400 THEN '<86400s'
                          ELSE '>86400s' END AS bucket
              FROM g WHERE gap_s IS NOT NULL)
        SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s
        FROM f GROUP BY 1, 2
    """,
    "users_rfm_segments": f"""
        WITH per_user AS (
            SELECT user_id, CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   {_money('value')} AS monetary
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
        scored AS (
            SELECT user_id, frequency, monetary,
                   CAST(ntile(5) OVER (ORDER BY last_us DESC, user_id)
                        AS INTEGER) AS r_quintile,
                   CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
                        AS INTEGER) AS f_quintile,
                   CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id)
                        AS INTEGER) AS m_quintile
            FROM per_user)
        SELECT *, printf('R%dF%dM%d', r_quintile, f_quintile, m_quintile)
                   AS segment
        FROM scored
    """,
    "events_type_correlation": """
        WITH hourly AS (
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        bounds AS (SELECT MIN(hour_epoch) AS lo, MAX(hour_epoch) AS hi FROM hourly),
        spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_epoch
                  FROM bounds),
        grid AS (SELECT hour_epoch, event_type
                 FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM hourly)),
        filled AS (SELECT g.hour_epoch, g.event_type,
                          COALESCE(h.n, 0) AS n_events
                   FROM grid g LEFT JOIN hourly h USING (hour_epoch, event_type)),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     a.n_events AS x, b.n_events AS y
              FROM filled a JOIN filled b USING (hour_epoch)
              WHERE a.event_type < b.event_type),
        mom AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                       CAST(SUM(x * y) AS BIGINT) AS sxy,
                       CAST(SUM(x * x) AS BIGINT) AS sxx,
                       CAST(SUM(y * y) AS BIGINT) AS syy
                FROM p GROUP BY 1, 2)
        SELECT type_a, type_b, n,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   AS pearson_r
        FROM mom
    """,
    "users_dn_retention": """
        WITH d AS (SELECT user_id, event_type,
                          CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                              AS day_no
                   FROM events),
        signups AS (SELECT user_id, MIN(day_no) AS cohort_day
                    FROM d WHERE event_type = 'signup' GROUP BY 1),
        activity AS (SELECT DISTINCT user_id, day_no AS act_day FROM d),
        j AS (SELECT s.user_id, s.cohort_day, a.act_day
              FROM signups s JOIN activity a USING (user_id)),
        agg AS (
            SELECT cohort_day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_signups,
                   CAST(COUNT(DISTINCT CASE WHEN act_day - cohort_day = 1
                        THEN user_id END) AS BIGINT) AS d1_active,
                   CAST(COUNT(DISTINCT CASE WHEN act_day - cohort_day = 7
                        THEN user_id END) AS BIGINT) AS d7_active,
                   CAST(COUNT(DISTINCT CASE WHEN act_day - cohort_day = 30
                        THEN user_id END) AS BIGINT) AS d30_active
            FROM j GROUP BY 1)
        SELECT strftime(make_timestamp(cohort_day * 86400 * 1000000),
                        '%Y-%m-%d') AS cohort,
               n_signups, d1_active, d7_active, d30_active,
               CAST(d1_active AS DOUBLE) / n_signups AS d1_rate,
               CAST(d7_active AS DOUBLE) / n_signups AS d7_rate,
               CAST(d30_active AS DOUBLE) / n_signups AS d30_rate
        FROM agg
    """,
    "events_skew_report": """
        WITH counts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
                        FROM events GROUP BY 1),
        ranked AS (SELECT c,
                          row_number() OVER (ORDER BY c ASC, user_id ASC) AS i,
                          row_number() OVER (ORDER BY c DESC, user_id ASC)
                              AS r_desc
                   FROM counts),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                     CAST(SUM(c) AS BIGINT) AS total,
                     CAST(MAX(c) AS BIGINT) AS max_c,
                     CAST(SUM(i * c) AS BIGINT) AS ic,
                     CAST(SUM(CASE WHEN r_desc <= 10 THEN c ELSE 0 END)
                          AS BIGINT) AS top10
              FROM ranked)
        SELECT n_keys, total AS total_events, max_c AS max_key_events,
               CAST(max_c AS DOUBLE) / total AS top1_share,
               CAST(top10 AS DOUBLE) / total AS top10_share,
               (2.0 * ic - CAST(n_keys + 1 AS DOUBLE) * total)
                   / (CAST(n_keys AS DOUBLE) * total) AS gini
        FROM m
    """,
    # tolerance oracle: exact WAU hash-compared; the HLL sketch result is
    # asserted within 5% as a boolean the oracle states as TRUE
    # round-12: exact percentiles (interpolated, round-6 — DuckDB
    # quantile_cont mirrors Spark's percentile) + TRUE for the sketch gate
    "events_percentile_sketch_check": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50_exact,
               round(quantile_cont(value, 0.95), 6) AS p95_exact,
               TRUE AS sketch_ok
        FROM events GROUP BY event_type
    """,
    "events_active_users_approx": """
        WITH pairs AS (SELECT DISTINCT
                           CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                               AS day_no,
                           user_id
                       FROM events),
        hi AS (SELECT MAX(day_no) AS hi FROM pairs),
        fan AS (SELECT user_id, day_no + x.i AS report_day
                FROM pairs, range(0, 7) x(i))
        SELECT strftime(make_timestamp(report_day * 86400 * 1000000),
                        '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_exact,
               TRUE AS sketch_ok
        FROM fan CROSS JOIN hi
        WHERE report_day <= hi
        GROUP BY 1
    """,
    # round-11: rate-limit audit — tumbling-minute counts, exact integers
    # events_heavy_hitters: the sketch is only the candidate generator —
    # the OUTPUT is exact, so plain SQL states it directly (threshold as
    # an integer product, share as a division of identical bigints)
    "events_heavy_hitters": """
        WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               round(CAST(COUNT(*) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
        FROM events CROSS JOIN tot
        GROUP BY user_id, n
        HAVING COUNT(*) * 128 > n
    """,
    "events_burst_users": """
        WITH pm AS (
            SELECT user_id, (epoch_us(ts) // 60000000) * 60 AS m,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2)
        SELECT user_id,
               CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_burst_minutes,
               CAST(MAX(c) AS BIGINT) AS max_per_minute,
               CAST(SUM(c) AS BIGINT) AS total_events,
               CAST(MIN(CASE WHEN c >= 2 THEN m END) AS BIGINT)
                   AS first_burst_minute
        FROM pm GROUP BY 1
        HAVING SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) >= 1
    """,
    # round-11: diurnal profile — hour-of-day from pure integer epoch
    # arithmetic (no session timezone on either engine); exact counts and
    # micro-quantized value sums; the two divisions mirrored verbatim
    "events_seasonal_hourly": """
        WITH cell AS (
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sm
            FROM events GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS tot
                FROM cell GROUP BY 1)
        SELECT event_type, CAST(hour_of_day AS BIGINT) AS hour_of_day, n_events,
               CAST(n_events AS DOUBLE) / tot AS share,
               round(CAST(sm AS DOUBLE) / n_events / 1000000.0, 6) AS avg_value
        FROM cell JOIN tot USING (event_type)
    """,
    # round-11: seasonal-naive backtest — full outer on the reduced hourly
    # table against itself shifted 24h; missing sides are 0; scored range
    # [min_hour + 24h, max_hour]; exact integer error sums
    "events_seasonal_naive_backtest": """
        WITH hourly AS (
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) * 3600 AS h,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        bounds AS (SELECT MIN(h) AS h_min, MAX(h) AS h_max FROM hourly),
        fc AS (SELECT event_type, h + 86400 AS h, n AS n_fc FROM hourly),
        scored AS (
            SELECT COALESCE(a.event_type, f.event_type) AS event_type,
                   COALESCE(a.h, f.h) AS h,
                   COALESCE(a.n, 0) AS n_act,
                   COALESCE(f.n_fc, 0) AS n_fc
            FROM hourly a FULL JOIN fc f
              ON a.event_type = f.event_type AND a.h = f.h),
        rng AS (SELECT * FROM scored CROSS JOIN bounds
                WHERE h >= h_min + 86400 AND h <= h_max)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(SUM(abs(n_act - n_fc)) AS BIGINT) AS total_abs_err,
               round(CAST(SUM(abs(n_act - n_fc)) AS DOUBLE) / COUNT(*), 6) AS mae,
               round(CAST(SUM(n_act - n_fc) AS DOUBLE) / COUNT(*), 6) AS bias
        FROM rng GROUP BY 1
    """,
}
