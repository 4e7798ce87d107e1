"""Benchmark-contamination detection — n-gram overlap between a training
corpus and an evaluation/benchmark set.

Before training on a crawled corpus you must find documents that leak the
eval benchmarks (the classic train/test contamination sweep). Operator:
count distinct word-n-gram shingles each training document shares with ANY
benchmark document; above a threshold the document is flagged.

Scale shape: benchmark suites are tiny (MBs) next to a 100 TB corpus, so
the benchmark shingle set is DISTINCTed and broadcast — the train side
never shuffles for the join; only the per-doc overlap count aggregates
(partial map-side combine, one narrow shuffle on doc_id). Same xxhash64
shingle keys as the dedup family (fixed-width long joins; collision math in
dedup.py applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.functions.text import shingle_hashes
from symat_hbase_tools_spark.operators.dedup import _doc_shingles


def benchmark_contamination(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    min_overlap: int = 5,
    benchmark_mod: int = 50,
) -> DataFrame:
    """Training docs sharing >= min_overlap distinct n-gram shingles with the
    benchmark subset (doc_id % benchmark_mod == 0 models the eval set).

    Output: doc_id, n_overlap.
    """
    sh = _doc_shingles(spark, sf_dir, n).select(
        "doc_id", F.explode(shingle_hashes(F.col("sh"))).alias("s")
    )
    is_bench = F.col("doc_id") % benchmark_mod == 0
    bench = sh.filter(is_bench).select("s").distinct()
    train = sh.filter(~is_bench)
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
