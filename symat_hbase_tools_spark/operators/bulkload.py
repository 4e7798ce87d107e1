"""Bulk load: sorted, range-partitioned cell files — the HBase bulk-load analog.

HBase ingests at scale via pre-sorted HFiles, one per region, handed to
region servers wholesale (the path `hbase-spark`'s bulkLoad wraps). The
Spark-native equivalent: range-partition cells by row key into N "regions",
sort within each partition by full cell coordinates, and write one file per
region. Output files then have pairwise-disjoint key ranges in HBase scan
order (BinaryType range partitioning is unsigned-lexicographic), which is
exactly the contract HFile ingestion and any range-pruned reader need.

Scale notes: repartitionByRange samples the key distribution, so region
boundaries auto-balance even with skewed keys; sortWithinPartitions is a
per-partition external sort (spills, never OOMs); the write is one file per
task with no further shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL_SORT = ["row", "family", "qualifier", "ts"]


def bulk_load_cells(cells: DataFrame, path: str, num_regions: int = 16) -> None:
    """Write cells as num_regions sorted, range-disjoint parquet files."""
    (
        cells.repartitionByRange(num_regions, "row")
        .sortWithinPartitions(*CELL_SORT)
        .write.mode("overwrite")
        .parquet(path)
    )


def region_boundaries(cells: DataFrame, num_regions: int = 16) -> list[bytes]:
    """Pre-split points (the HBase create-table SPLITS argument): row-key
    quantiles computed with a single approx-quantile pass over key hashes is
    wrong for binary keys — sample actual keys instead."""
    n = max(num_regions * 100, 1000)
    sample = (
        cells.select("row").orderBy(F.rand(seed=42)).limit(n).orderBy("row").collect()
    )
    if not sample:
        return []
    step = max(len(sample) // num_regions, 1)
    return [bytes(r["row"]) for r in sample[step::step]][: num_regions - 1]
