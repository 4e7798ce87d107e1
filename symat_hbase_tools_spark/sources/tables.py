"""Relational table loaders for the driver's parquet test data.

All tables load as plain parquet scans so Catalyst gets predicate pushdown,
column pruning and partition-sized splits for free. The one normalization:
``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader rejects — we
read it as raw long nanos (``spark.sql.legacy.parquet.nanosAsLong``) and
convert to a microsecond TimestampType column, keeping the exact nanos in
``ts_ns`` for consumers that need full precision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts nanos -> TimestampType."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts arrives as epoch nanos; keep exact nanos, expose a usable
        # microsecond timestamp (floor division — matches DuckDB's epoch_us).
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
