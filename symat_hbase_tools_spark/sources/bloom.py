"""Parquet bloom filters for the kv point-lookup path.

The reference's whole reason to exist is point probes — CopyRow fetches one
row key (CopyRow.java:107-113) and CorruptRowsMR re-gets each scanned key
(CorruptRowsMR.java:135). HBase serves those from per-HFile bloom filters;
the parquet-native equivalent is a column-level split-block bloom filter in
each row group's footer metadata. With it, a `row = X` point get prunes at
ROW-GROUP granularity even in layouts where min/max footer stats cannot
prune at all (hash-bucketed files, salted ingests, time-ordered arrivals —
every row group spans ~the full key range). Measured on a 200k-cell
unsorted single file with 256 KB row groups: the vectorized scan emits
10,484 rows (one surviving row group) with the bloom vs 200,000 without —
a 19x row-group IO cut (tests/test_bloom.py re-measures this; BASELINE.md
round-14 note records it).

Spark's reader uses them automatically: filter pushdown hands parquet-mr an
EqualTo predicate and its row-group filter consults dictionary/stats/bloom
per block — nothing to configure on the read side.

Sizing: parquet-mr sizes the filter from the expected DISTINCT count per
row group at the requested false-positive rate (~1.2 MB for 1M ndv at 1%).
The default here assumes the default 128 MB row group of short keys; pass a
smaller ndv for small-row-group layouts or the filter bytes dominate the
file (the probe above measured 5x file-size bloat from a 200k-ndv filter
on 10k-row groups).

Dictionary interaction (measured, tests/test_bloom.py): parquet-mr SKIPS
the bloom for a chunk that stayed fully dictionary-encoded — correct, the
reader's dictionary filter already prunes those row groups exactly. The
bloom takes over precisely at dictionary fallback (chunk cardinality past
the 1 MB dictionary page), i.e. the high-cardinality regime where a 100 TB
cells table actually lives. So arming the writer costs nothing at toy
scale and buys row-group point-get pruning exactly where stats and
dictionaries stop working.
"""

from __future__ import annotations

from pyspark.sql.readwriter import DataFrameWriter

#: expected distinct row keys per ROW GROUP (not per file) — the default
#: 128 MB row group holds ~1M short-keyed cells
ROW_BLOOM_NDV = 1 << 20

#: split-block bloom false-positive rate: 1% costs ~10 bits/key
ROW_BLOOM_FPP = 0.01

#: rough on-disk bytes per cells-table row (short key + family/qualifier +
#: value); only used to derive an expected-ndv from a byte budget
EST_CELL_ROW_BYTES = 128


def ndv_for_bytes(row_group_bytes: int) -> int:
    """Expected distinct row keys for a row group of ``row_group_bytes``:
    budget / EST_CELL_ROW_BYTES, clamped to [1024, ROW_BLOOM_NDV]. Callers
    that write small row groups (compaction with a small target, test
    fixtures) should size the filter from their byte budget instead of the
    1M default — the module docstring's measured 5x file bloat is exactly
    the default-ndv-on-10k-row-groups case. The estimate is deliberately
    coarse: an overestimate wastes filter bytes, an underestimate raises
    FPP; both degrade gracefully."""
    return max(1024, min(ROW_BLOOM_NDV, int(row_group_bytes) // EST_CELL_ROW_BYTES))


def with_row_bloom(
    writer: DataFrameWriter,
    column: str = "row",
    ndv: int = ROW_BLOOM_NDV,
    fpp: float = ROW_BLOOM_FPP,
) -> DataFrameWriter:
    """Arm ``writer`` with a bloom filter on ``column`` (hadoop options are
    per-column-path, so this composes for several key columns)."""
    return (
        writer.option(f"parquet.bloom.filter.enabled#{column}", "true")
        .option(f"parquet.bloom.filter.expected.ndv#{column}", str(int(ndv)))
        .option(f"parquet.bloom.filter.fpp#{column}", str(float(fpp)))
    )
