"""Driver-contract query inventory: Spark callables + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 appears here twice: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` and an equivalent ANSI-SQL string
DuckDB runs on the same parquet. Column names AND types are aligned pairwise
(the driver hash-compares after sorting columns by name).

DuckDB/Spark parity gotchas handled here:
  * DuckDB ``SUM(integer)`` returns HUGEINT — every integer sum is wrapped in
    ``CAST(... AS BIGINT)`` to match Spark's LongType.
  * money sums accumulate exact integer micros (hi/lo-split longs) on both
    sides — order-independent exact addition on the codegen fast path —
    then assemble the double once per group; see operators/relational.py.
  * timestamps are rendered as 'yyyy-MM-dd' strings or epoch-second BIGINTs.
  * DuckDB reads events.ts at nanosecond precision while Spark truncates to
    micros; only epoch_us/epoch-second/hour-truncated derivations are
    compared, which agree under floor division.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from symat_hbase_tools_spark.operators import relational
from symat_hbase_tools_spark.registry import ORACLE_SQL, QUERIES

# ---------------------------------------------------------------------------
# round-13 split: the 238 inline wrappers, fixture machinery, and per-domain
# QUERIES/ORACLE_SQL registrations live in symat_hbase_tools_spark/registry/
# ({kv,relational,events,docs,embeddings}.py over wrappers.py + sqlcommon.py).
# entry.py remains the assembler — driver-window ordering, the prepared-plan
# cache, and the rows-only twin map — and re-exports every wrapper name so
# `from symat_hbase_tools_spark.entry import <anything>` keeps working.
# ---------------------------------------------------------------------------
from symat_hbase_tools_spark.registry.wrappers import *  # noqa: F401,F403
from symat_hbase_tools_spark.registry.wrappers import (  # noqa: F401
    _FIXTURE_CACHE,
    _FIXTURE_ROOT,
    _REGIONSTORE_CACHE,
    _fanout,
    _materialized_fixture,
    _pretty_cells,
    _scratch_path,
    _unpivot_sql,
)
from symat_hbase_tools_spark.registry.sqlcommon import (  # noqa: F401
    _JACCARD_SQL,
    _NTOK,
    _PROFILE_RENDER_SQL,
    _SHINGLE_CTE,
    _TOKENS,
    _fk_oracle_sql,
    _money,
    _profile_oracle_sql,
    _simhash_portable_sql,
)

QUERIES = dict(QUERIES)  # local copy: window ordering + plan cache below



# ---------------------------------------------------------------------------
# driver verification window (round-14 rotation)
#
# The driver hash-verifies the FIRST 50 entries in dict order against the
# DuckDB oracles at sf0.01. Round-14 policy (r13 verdict ask #2): keep the
# kv core trio + the exactly-once streaming rep, seat every round-14
# oracle-paired birth (the span family's k=8 / within-doc / per-partner
# forms, the IVF-BQ recall check, the subword-sampling check — the
# rows-only ann_ivfbq_topk / text_unigram_sampled are represented by
# their twins per the check-twin policy), and fill the remaining 40
# seats with the STALEST oracle-paired entries computed from
# CORRECTNESS_r*.json (this cohort: 14 whose last driver row was r3 +
# 24 from r4; events_heavy_hitters and doc_dup_spans_indexed, born
# after the first rotation, took the last fill seats). Everything rotated out is double-green-or-better and
# stays covered by tests/test_oracle.py and the sf0.01/sf0.1 sweeps.
# Historical rotation notes live in git history (rounds 5-13 comments).

_DRIVER_WINDOW = [
    "kv_point_get",
    "kv_audit_report",
    "kv_copy_row_bump",
    "events_rollup_exactly_once",
    "doc_max_dup_spans_k8",
    "doc_trim_dup_spans_k8",
    "doc_max_dup_spans_withindoc",
    "doc_dup_span_partners",
    "ann_ivfbq_recall_check",
    "unigram_sample_check",
    "events_heavy_hitters",
    "doc_dup_spans_indexed",
    "click_conversion_full",
    "customer_running_totals",
    "doc_unimax_resample",
    "events_kv_state",
    "kv_audit_counters",
    "kv_column_projection",
    "kv_keyonly_scan",
    "nation_setops",
    "pipeline_curated_search",
    "purchase_attribution",
    "text_cleaning",
    "text_repetition_signals",
    "text_tfidf_topk",
    "text_unigram_logprob",
    "ann_ivf_recall_check",
    "asof_purchase_signup",
    "bpe_pair_stats",
    "customer_balance_distribution",
    "dedup_ngram_jaccard",
    "dedup_simhash_portable",
    "doc_dedup_clusters",
    "doc_dedup_keep_best",
    "doc_dup_spans",
    "doc_mixture_weights",
    "doc_quality_classifier",
    "doc_sample_weighted",
    "embedding_near_dup",
    "events_funnel",
    "events_gap_fill",
    "events_hourly_incremental",
    "events_json_extract",
    "events_ohlc_daily",
    "events_session_paths",
    "events_skew_report",
    "kv_scd2_history",
    "market_share",
    "min_cost_supplier",
    "orders_equidepth_histogram",
]

assert len(_DRIVER_WINDOW) == 50 and len(set(_DRIVER_WINDOW)) == 50
assert all(k in QUERIES for k in _DRIVER_WINDOW), [
    k for k in _DRIVER_WINDOW if k not in QUERIES
]
QUERIES = {
    **{k: QUERIES[k] for k in _DRIVER_WINDOW},
    **{k: v for k, v in QUERIES.items() if k not in _DRIVER_WINDOW},
}


# ---------------------------------------------------------------------------
# prepared-plan cache
#
# Every QUERIES entry is a PURE plan constructor: (spark, sf_dir) -> lazy
# DataFrame, no side effects, deterministic plan. Rebuilding one costs
# 0.3-0.9 s of driver-side latency (py4j Column-tree construction + Catalyst
# analysis) — pure overhead when the same (session, query, sf_dir) is asked
# for again, which is exactly what a long-lived query service or a
# min-of-N bench loop does. This is Spark's analog of a prepared-statement /
# plan cache: the DataFrame is immutable, so handing the same object out is
# semantically identical to rebuilding it. Execution is NOT cached — every
# action on the returned plan recomputes from the source files.

_PLAN_CACHE: dict[tuple, DataFrame] = {}

#: entries evicted wholesale past this size — the cache exists to amortize
#: plan construction across repeats of the same working set, not to grow
#: unboundedly across many sessions/sf_dirs in one process
_PLAN_CACHE_MAX = 1024


def _sf_dir_stamp(sf_dir: str) -> float | None:
    """Newest mtime across the sf_dir's table files — the same invalidation
    signal the scan cache uses per-file, folded to one number so a plan
    built before testdata regeneration can never be served after it (stale
    file indexes / stale persisted intermediates)."""
    try:
        mtimes = [
            os.path.getmtime(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet") or f.endswith(".jsonl")
        ]
        return max(mtimes) if mtimes else None
    except OSError:
        return None


def _prepared(name: str, fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (id(spark), name, sf_dir, _sf_dir_stamp(sf_dir))
        hit = _PLAN_CACHE.get(key)
        # the session object is stored alongside the plan so a garbage-
        # collected session can never alias a live one's id() — and the
        # identity check makes the guard explicit
        if hit is not None and hit[0] is spark:
            return hit[1]
        df = fn(spark, sf_dir)
        if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.clear()
        _PLAN_CACHE[key] = (spark, df)
        return df

    run.__name__ = getattr(fn, "__name__", name)
    run.__doc__ = fn.__doc__
    run.__wrapped__ = fn
    return run


QUERIES = {name: _prepared(name, fn) for name, fn in QUERIES.items()}

# shared SQL fragments for the LLM-op oracles


#: Every rows-only registry entry (no ORACLE_SQL twin — not SQL-expressible)
#: mapped to the ORACLE-PAIRED check query that hash-verifies its invariants.
#: tests/test_oracle.py asserts this map is total over QUERIES - ORACLE_SQL
#: and that every twin is itself oracle-paired, so a rename can never
#: silently orphan a rows-only op (round-10 verdict #7).
ROWS_ONLY_CHECK_TWINS: dict[str, str] = {
    "doc_probe_ridge": "doc_probe_ridge_check",
    "embedding_near_dup_lsh": "embedding_near_dup_lsh_check",
    "embedding_semantic_dedup": "embedding_semantic_dedup_check",
    "bpe_learn_merges": "bpe_learn_check",
    "bpe_tokenize_census": "bpe_tokenize_check",
    "unigram_learn_vocab": "unigram_learn_check",
    "text_unigram_fertility": "unigram_tokenize_check",
    "text_unigram_sampled": "unigram_sample_check",
    "dedup_simhash": "dedup_simhash_portable",
    "ann_lsh_topk": "ann_lsh_recall_check",
    "ann_ivf_topk": "ann_ivf_recall_check",
    "embedding_pca_project": "embedding_pca_check",
    "embedding_pq_fit": "embedding_pq_check",
    "ann_pq_topk": "ann_pq_recall_check",
    "ann_bq_topk": "ann_bq_recall_check",
    "ann_ivfpq_topk": "ann_ivfpq_recall_check",
    "ann_ivfbq_topk": "ann_ivfbq_recall_check",
    "embedding_kmeans_fit": "embedding_kmeans_check",
    "multimodal_near_dup": "multimodal_near_dup_check",
    "embedding_kcenter_select": "embedding_kcenter_check",
}


def flagship(spark: SparkSession) -> DataFrame:
    """The driver's smoke query: Q1 pricing summary at sf0.001."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")
