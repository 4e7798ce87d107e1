"""Secondary index for the cell layer — the HBase index-table pattern.

HBase has no native secondary indexes; querying by VALUE means a full scan
(exactly what the reference's audit does for every row,
CorruptRowsMR.java:68-91). The standard production pattern is a separate
INDEX TABLE whose row key is the indexed value with the primary key as a
suffix: a by-value query becomes a short range scan on the index followed
by point gets on the data table.

Spark mapping:
  * build_value_index — derive the index cells table (one narrow pass over
    the visible view; maintain incrementally by indexing each ingest batch's
    changeset the same way).
  * index_lookup — range scan ``[value \\x00, value \\x01)`` on the index
    (pushes to the scan exactly like kv.range_scan; on a real cluster it's
    a few-region HBase scan).
  * indexed_get — semi-join the data table on the looked-up primary keys;
    the matched key set is small by construction, so it broadcasts and the
    data table is probed without a shuffle.

The \\x00 separator is safe because it sorts below every other byte — index
entries for one value form one contiguous key range regardless of what the
primary keys contain (same trick HBase composite keys use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.kv import range_scan, visible_cells

INDEX_FAMILY = "idx"
SEP = b"\x00"


def build_value_index(cells: DataFrame, qualifier: str) -> DataFrame:
    """Index cells table for one qualifier of a data cells table.

    Index row key = value || 0x00 || primary row key (unique per entry);
    the cell value carries the primary key for direct retrieval.
    """
    entries = visible_cells(cells).filter(
        F.decode(F.col("qualifier"), "UTF-8") == qualifier
    )
    return entries.select(
        F.concat(F.col("value"), F.lit(SEP), F.col("row")).alias("row"),
        F.lit(INDEX_FAMILY).alias("family"),
        F.encode(F.lit("pk"), "UTF-8").cast("binary").alias("qualifier"),
        F.col("ts"),
        F.lit("Put").alias("type"),
        F.col("row").alias("value"),
    )


def index_lookup(index: DataFrame, value: bytes) -> DataFrame:
    """Primary keys whose indexed qualifier equals ``value`` — one pushed-down
    range scan on the index table. Output: row (primary key, binary)."""
    start = value + SEP
    stop = value + b"\x01"
    return range_scan(index, start, stop).select(F.col("value").alias("row"))


def indexed_get(cells: DataFrame, keys: DataFrame) -> DataFrame:
    """All cells of the rows named by ``keys`` (broadcast semi-join probe —
    the Spark shape of 'point gets on the data table')."""
    return cells.join(F.broadcast(keys), "row", "left_semi")
