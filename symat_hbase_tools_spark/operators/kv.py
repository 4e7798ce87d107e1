"""KV-layer operators: the reference's scan/get surface on cells DataFrames.

Mappings (SURVEY.md §2.1):
  * point_get        — S1, /root/reference/.../CopyRow.java:107-113
  * keyonly_scan     — S2, CorruptRowsMR.java:68-91 (FirstKeyOnly+KeyOnly filters)
  * column_projection— S3, CorruptRowsMR.java:80-86 + MRUtil.java:54
  * list_families    — S4, CorruptRowsMR.java:230-238
  * latest_cells     — latest-version-wins read (HBase default GET semantics)

Scale notes: point_get is a pushed-down binary-equality filter (parquet
row-group stats prune; on the HBase connector it becomes a real GET).
keyonly_scan prunes to the `row` column before the distinct — Catalyst's
column pruning is the KeyOnlyFilter equivalent, and the single hash-distinct
benefits from partial aggregation. latest_cells uses max_by aggregation
(map-side combine) rather than a window sort — at 100 TB that halves the
shuffle and avoids per-partition sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_get(cells: DataFrame, row_key: bytes) -> DataFrame:
    """Fetch all cells of one row by exact key (S1)."""
    return cells.filter(F.col("row") == F.lit(row_key))


def keyonly_scan(cells: DataFrame) -> DataFrame:
    """All distinct row keys; values never read (S2).

    Catalyst prunes every column but `row` out of the scan (KeyOnlyFilter
    equivalent); dropDuplicates is the FirstKeyOnlyFilter equivalent.
    """
    return cells.select("row").dropDuplicates(["row"])


def column_projection(cells: DataFrame, qualifiers: list[str]) -> DataFrame:
    """Restrict a scan to a set of qualifiers (S3 — COLUMN_LIST)."""
    return cells.filter(F.decode(F.col("qualifier"), "UTF-8").isin(list(qualifiers)))


def list_families(cells: DataFrame) -> list[str]:
    """All column families (S4 — table-descriptor read)."""
    return [r["family"] for r in cells.select("family").distinct().collect()]


def latest_cells(cells: DataFrame) -> DataFrame:
    """Latest-version-wins view over a versioned cells table.

    One hash aggregation with max_by(struct(ts,type,value), ts): partial
    aggregation applies map-side, so the shuffle carries one pre-reduced row
    per (row,family,qualifier) per map task — strictly better at scale than
    Window.partitionBy(...).orderBy(desc ts) + row_number()==1, which must
    shuffle every version then sort each partition.
    """
    packed = F.max_by(F.struct("ts", "type", "value"), F.col("ts")).alias("c")
    return (
        cells.groupBy("row", "family", "qualifier")
        .agg(packed)
        .select(
            "row",
            "family",
            "qualifier",
            F.col("c.ts").alias("ts"),
            F.col("c.type").alias("type"),
            F.col("c.value").alias("value"),
        )
    )
