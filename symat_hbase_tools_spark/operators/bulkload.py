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
    """Write cells as num_regions sorted, range-disjoint parquet files.

    Each file carries a row-key bloom filter (the HFile bloom analog, see
    sources/bloom.py): range layout makes FILE pruning free via footer
    stats, the bloom adds ROW-GROUP pruning for point gets inside the one
    surviving file."""
    from symat_hbase_tools_spark.sources.bloom import with_row_bloom

    (
        with_row_bloom(
            cells.repartitionByRange(num_regions, "row")
            .sortWithinPartitions(*CELL_SORT)
            .write.mode("overwrite")
        ).parquet(path)
    )


def region_boundaries(cells: DataFrame, num_regions: int = 16) -> list[bytes]:
    """Pre-split points (the HBase create-table SPLITS argument): row-key
    quantiles computed with a single approx-quantile pass over key hashes is
    wrong for binary keys — sample actual keys instead.

    The sample is selected by a deterministic per-row hash predicate — a
    narrow map-side filter, NO global exchange (the previous
    ``orderBy(rand()).limit(n)`` formulation full-sorted every row key to
    pick ~1,600 of them). The filter's survivors (a few thousand rows) are
    sorted driver-side. The sampling fraction self-sizes from a count so
    the expected sample stays ~4x the target regardless of table size.
    """
    n = max(num_regions * 100, 1000)
    total = cells.count()
    if total == 0:
        return []
    # hash-bucket membership: keep ~4n rows, deterministic across runs and
    # partition layouts (same discipline as operators/sampling.py)
    buckets = max(total // (4 * n), 1)
    sample = sorted(
        bytes(r["row"])
        for r in cells.select("row")
        .filter(F.pmod(F.xxhash64(F.lit(42), F.col("row")), F.lit(buckets)) == 0)
        .collect()
    )
    if not sample:
        return []
    step = max(len(sample) // num_regions, 1)
    return sample[step::step][: num_regions - 1]
