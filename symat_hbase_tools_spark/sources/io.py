"""Bulk import/export of cells tables across storage formats.

The reference's I/O surface is HBase RPC + HDFS TSV (README.md:69-81); the
engine generalizes it: a cells DataFrame round-trips through any of Spark's
columnar/row formats. Binary columns need care in text formats — CSV/JSON
get the HBase-shell escaped rendering (functions/bytes_binary), so exported
files are also human-readable the way HBase shell prints keys.

Format guidance at scale (docstrings are the contract, tests enforce
round-trips):
  * parquet — the default: columnar, predicate pushdown, column pruning.
  * orc     — same class; use when the lakehouse standard is ORC.
  * json/csv — interchange only: no pushdown, full scans, escaped binary.
Writers accept partition columns — e.g. partition exported cells by family
for family-pruned reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.functions.bytes_binary import (
    to_bytes_binary_col,
    to_string_binary_col,
)

_BINARY_COLS = ("row", "qualifier", "value")


def _escape_binary(cells: DataFrame) -> DataFrame:
    out = cells
    for c in _BINARY_COLS:
        out = out.withColumn(c, to_string_binary_col(F.col(c)))
    return out


def _unescape_binary(df: DataFrame) -> DataFrame:
    out = df
    for c in _BINARY_COLS:
        out = out.withColumn(c, to_bytes_binary_col(F.col(c)))
    return out.select("row", "family", "qualifier", "ts", "type", "value")


def write_cells(
    cells: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None
) -> None:
    writer = cells.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt in ("parquet", "orc"):
        writer.format(fmt).save(path)
    elif fmt == "json":
        _escape_binary(cells).write.mode("overwrite").json(path)
    elif fmt == "csv":
        _escape_binary(cells).write.mode("overwrite").option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def read_cells(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt in ("parquet", "orc"):
        return spark.read.format(fmt).load(path)
    schema = "row string, family string, qualifier string, ts long, type string, value string"
    if fmt == "json":
        return _unescape_binary(spark.read.schema(schema).json(path))
    if fmt == "csv":
        return _unescape_binary(
            spark.read.schema(schema).option("header", True).csv(path)
        )
    raise ValueError(f"unsupported format: {fmt}")
