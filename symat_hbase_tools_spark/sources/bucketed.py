"""Bucketed (co-located) table layout — the shuffle-elimination path.

HBase co-locates by region: a row's cells live on one RegionServer, so the
reference's probe (CorruptRowsMR.java:130-136) and copy (CopyRow.java:118-142)
never move data between nodes. The Spark equivalent is a bucketed table:
``bucketBy(n, key)`` fixes each key's partition at WRITE time, so every
downstream join/aggregation on that key — the diff full-outer join, the
repair anti-join, latest-version aggregation — reads both sides already
co-partitioned and plans ZERO exchanges (plan test enforces this).

At 100 TB this is the difference between re-shuffling the lake on every
maintenance pass and never shuffling it at all: pay one layout cost at
ingest, then every (row)-keyed operation is exchange-free. ``sortBy`` within
buckets additionally removes the sort under sort-merge joins.

Bucket-count sizing: both sides of a join must use the SAME count (Spark
joins bucket i with bucket i); pick n so one bucket of the biggest table
fits an executor's task comfortably (~128-512 MB compressed).

Key-set rule: bucket on the FULL join/aggregation key set. Spark (4.x
defaults, ``spark.sql.requireAllClusterKeysForCoPartition=true``) only
treats two scans as co-partitioned when the bucket columns equal the join
keys exactly — bucketing a cells table by ``row`` alone is disabled by the
planner for a (row, family, qualifier) join; bucket by all three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table. The lead bucket
    column gets a row-group bloom filter (sources/bloom.py): every bucket
    holds an interleaved 1/n hash-subset of the key space, so a point get
    on the lead column alone (no bucket pruning — Spark requires ALL
    bucket columns for that) passes every file's min/max footer stats;
    the bloom rejects the n-1 buckets that cannot contain the key."""
    from symat_hbase_tools_spark.sources.bloom import with_row_bloom

    (
        with_row_bloom(df.write.format("parquet").mode(mode), bucket_cols[0])
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the scan reports its hash partitioning to
    Catalyst, which is what lets downstream operators skip the exchange."""
    return spark.table(table)
