"""Real-HBase connector path (documented stub — SURVEY.md §7 Phase 5).

The test/bench environment is parquet-backed; against a live cluster the
cells DataFrame comes from the Apache ``hbase-spark`` connector
(``org.apache.hadoop.hbase.spark``), whose jars are not in this image. The
functions here define the production wiring so the rest of the engine is
connector-agnostic: every operator consumes the canonical cells schema
regardless of source.

Scale design for the connector path (not executable here):
  * one Spark partition per HBase region (the connector's default) — the
    Spark analogue of TableInputFormat's per-region splits
    (/root/reference/src/main/java/org/apache/symat/CorruptRowsMR.java:68);
  * key-range predicates (`row >= start AND row < stop`) push down to HBase
    scan ranges via the connector's DataSourceV2 pushdown — the one place a
    custom relation would be justified (SURVEY.md §4.1);
  * hot row-key prefixes: salt with a leading hash byte and strip on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

HBASE_SPARK_FORMAT = "org.apache.hadoop.hbase.spark"


def hbase_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.hadoop.hbase.spark.DefaultSource"
        )
        return True
    except Exception:
        return False


def read_cells(spark: SparkSession, table: str, columns: list[str] | None = None) -> DataFrame:
    """Read an HBase table (``ns:table`` naming, CopyRow.java:50-51) as cells.

    Raises NotImplementedError when the connector jars are absent (this
    image); the parquet-backed sources in sources/cells.py are the test path.
    """
    if not hbase_available(spark):
        raise NotImplementedError(
            "hbase-spark connector jars not on the classpath; use the "
            "parquet-backed cell sources (sources/cells.py) in this environment"
        )
    reader = spark.read.format(HBASE_SPARK_FORMAT).option("hbase.table", table)
    if columns:
        reader = reader.option("hbase.columns", " ".join(columns))
    return reader.load()
