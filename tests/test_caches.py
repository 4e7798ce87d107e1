"""Prepared-plan and scan cache invalidation: regenerated testdata (new file
mtimes) must never be served a stale plan, and both caches stay bounded."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from symat_hbase_tools_spark import entry
from tests.conftest import SF_DIR


def _copy_sf(tmp_path):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SF_DIR, f), os.path.join(d, f))
    return d


def test_plan_cache_invalidates_on_regenerated_testdata(spark, tmp_path):
    d = _copy_sf(tmp_path)
    q = entry.QUERIES["q1_pricing_summary"]
    df1 = q(spark, d)
    assert q(spark, d) is df1, "same (session, query, sf_dir, mtime) must hit"
    # regenerate one table: halve lineitem
    li_path = os.path.join(d, "lineitem.parquet")
    half = spark.read.parquet(li_path).filter(F.col("l_orderkey") % 2 == 0)
    tmp_out = str(tmp_path / "li_new")
    half.coalesce(1).write.parquet(tmp_out)
    part = [f for f in os.listdir(tmp_out) if f.endswith(".parquet")][0]
    shutil.rmtree(li_path) if os.path.isdir(li_path) else os.remove(li_path)
    shutil.copy(os.path.join(tmp_out, part), li_path)
    os.utime(li_path)  # ensure a fresh mtime even on coarse filesystems
    df2 = q(spark, d)
    assert df2 is not df1, "regenerated testdata must miss the plan cache"
    assert df2.count() > 0  # the fresh plan executes against the new file


def test_plan_cache_bounded(spark, tmp_path):
    entry._PLAN_CACHE.clear()
    entry._PLAN_CACHE.update(
        {("fake", i): None for i in range(entry._PLAN_CACHE_MAX)}
    )
    q = entry.QUERIES["q1_pricing_summary"]
    q(spark, SF_DIR)
    assert len(entry._PLAN_CACHE) <= entry._PLAN_CACHE_MAX
    entry._PLAN_CACHE.clear()


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE name must be a registered query (a typo here
    would fail the per-round bench artifact, not CI, without this guard) and
    oracle-paired (the embedded DuckDB control times the same names)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from symat_hbase_tools_spark.entry import ORACLE_SQL, QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert missing == [], missing
    unpaired = [n for n in bench.HEADLINE if n not in ORACLE_SQL]
    assert unpaired == [], unpaired
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)


def test_dedup_pin_hygiene_bounded(spark):
    """Serve-many hygiene (round 16): repeated dedup-operator calls keep at
    most ONE outstanding pinned table per pin site — previous calls' pins
    are released at the site before the new pin (plans/serve_cache.py)."""
    from symat_hbase_tools_spark.operators import dedup

    for _ in range(3):
        dedup.ngram_jaccard_pairs(spark, SF_DIR).collect()
        dedup.containment_pairs(spark, SF_DIR).collect()
    assert dedup._DEDUP_CACHES, "expected pinned slots to be registered"
    for slot, caches in dedup._DEDUP_CACHES.items():
        assert len(caches) <= 1, (
            f"slot {slot!r} accumulated {len(caches)} pins — release-"
            "before-pin hygiene broken"
        )


def test_shared_plan_pin_release_keeps_pushdown_barrier(spark):
    """Round-16 regression (caught by the HOF plan gate): several operators
    pin the SAME shared subplan (_doc_shingles serves the contamination
    family AND incremental_dedup), and Spark's CacheManager matches entries
    by analyzed plan — so releasing another operator's pin removed the
    InMemoryRelation pushdown barrier and Catalyst re-inlined the
    interpreted shingle HOF into a Filter (double-eval class). The pin-site
    release-then-repin discipline must keep the barrier intact for a plan
    built before the other operator ran."""
    from symat_hbase_tools_spark.operators import contamination, dedup
    from symat_hbase_tools_spark.plans.explain import assert_no_hof_in_filters

    df = contamination.contamination_overlap_census(spark, SF_DIR)
    # a different operator re-pinning the same shingle subplan must not
    # strip df's barrier (the old entry-point release did exactly that)
    dedup.incremental_dedup(spark, SF_DIR).collect()
    assert_no_hof_in_filters(df)
    assert df.count() > 0
