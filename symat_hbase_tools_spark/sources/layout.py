"""Multi-dimensional data layout: Z-order (Morton) clustering for writes.

A table sorted on one column prunes scans on that column only; a 100 TB
fact table queried by BOTH user and time (or row-key and timestamp on the
cell layer) needs file-skipping on either predicate. Z-ordering interleaves
the bits of the clustering columns so each written file covers a small
hyper-rectangle of the key space — parquet min/max footer stats then prune
files for predicates on ANY clustered column, not just a leading sort key.

Everything is built-in expressions: the Morton key is shift/mask arithmetic
(codegen'd, no UDF), the write is repartitionByRange + sortWithinPartitions
on that key — one range shuffle, the same cost as any sorted write.

The same machinery generalizes to the cell layer (z-order on
(xxhash64(row), ts) gives time-travel reads file-pruning on both the key
and the snapshot bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the Morton key; 16 bits x up to 4 dims fits a long
DEFAULT_BITS = 16


def normalize_to_bits(col: Column, vmin: float, vmax: float, bits: int = DEFAULT_BITS) -> Column:
    """Scale a numeric column into the [0, 2^bits) integer grid."""
    span = float(vmax) - float(vmin)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - float(vmin)) * (((1 << bits) - 1) / span)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0).cast("long")),
        F.lit((1 << bits) - 1).cast("long"),
    )


def morton_key(grid_cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the bits of pre-normalized grid coordinates.

    bit j of dim d lands at position j * ndims + d — the classic Morton
    curve. Pure shift/mask arithmetic: stays inside whole-stage codegen.
    """
    ndims = len(grid_cols)
    assert 1 <= ndims * bits <= 63, "morton key must fit a signed long"
    z = F.lit(0).cast("long")
    for d, c in enumerate(grid_cols):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, j * ndims + d)
    return z


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One tiny aggregate for the min/max of each clustering column."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (float(row[f"_min_{c}"]), float(row[f"_max_{c}"])) for c in cols}


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """The Morton clustering key for ``cols`` (numeric / timestamp-like).

    ``ranges`` may be passed when the caller already knows the domains
    (saves the one-row stats aggregate — at 100 TB use table-level stats).
    """
    ranges = ranges or column_ranges(df, cols)
    grid = [
        normalize_to_bits(F.col(c).cast("double"), *ranges[c], bits=bits) for c in cols
    ]
    return morton_key(grid, bits=bits)


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` clustered on the Z-curve of ``cols``.

    repartitionByRange on the Morton key makes each output file a contiguous
    z-range = a small hyper-rectangle in (cols) space; sortWithinPartitions
    tightens row-group stats inside each file. Cost: exactly one range
    shuffle (with its sampling pass), identical to any globally-sorted
    write. n_files at 100 TB = table_size / target_file_size (~1 GB).
    """
    keyed = df.withColumn("_z", zorder_key(df, cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
