"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
file/row-group pruning.

A parquet lake prunes on per-file min/max statistics. Sorting by ONE column
makes that column's ranges narrow per file but leaves every other column's
range full-width — a predicate on a second dimension reads everything.
Interleaving the bits of two (or more) dimension keys into a single Z-value
and range-sorting the write by it gives every file a small HYPER-RECTANGLE
of the key space: min/max on EACH dimension is narrow, so 2-D (and range)
predicates prune files without any index. This is the standard lakehouse
`OPTIMIZE ... ZORDER BY` technique (Delta/Iceberg), built here from plain
expressions + repartitionByRange.

Everything is codegen-able integer bit math — no UDFs; the Z-value is
reproducible cross-engine (the census query's DuckDB oracle computes the
same interleave).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits interleaved per dimension (16 bits x 2 dims = 32-bit Z-value)
DEFAULT_BITS = 16


def zvalue(dims: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of pre-bucketed integer dimensions.

    Each dim must already be an integer in [0, 2^bits); bit b of dim i
    lands at output bit b*len(dims) + i. Built as a sum of shifted
    bit-extractions — one whole-stage-codegen expression, no UDF.
    """
    n = len(dims)
    terms = []
    for i, d in enumerate(dims):
        x = d.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def grid_bucket(col: Column, lo: Column, hi: Column, bits: int = DEFAULT_BITS) -> Column:
    """Scale a numeric column into the [0, 2^bits) integer grid given its
    (lo, hi) bounds — the quantizer in front of ``zvalue``. Values at hi
    clamp to the top cell."""
    cells = (1 << bits) - 1
    span = (hi - lo).cast("double")
    scaled = F.when(
        span > 0, F.floor((col - lo).cast("double") / span * cells)
    ).otherwise(F.lit(0))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)).cast("long")


def zorder_write(
    df: DataFrame,
    dim_cols: list[str],
    path: str,
    bits: int = DEFAULT_BITS,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``dim_cols``.

    One 1-row bounds aggregate (min/max per dim — broadcast), the Z-value
    expression, then repartitionByRange + sortWithinPartitions on it: each
    output file covers a compact hyper-rectangle of the dim space, so
    min/max stats prune multi-dimensional predicates. The Z column is
    dropped from the written data (it is derivable; layouts should not
    leak helper columns)."""
    spark = df.sparkSession
    aggs = []
    for c in dim_cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(bounds))
    dims = [
        grid_bucket(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
        for c in dim_cols
    ]
    zed = j.withColumn("_zv", zvalue(dims, bits)).drop(
        *[f"_lo_{c}" for c in dim_cols], *[f"_hi_{c}" for c in dim_cols]
    )
    ranged = (
        zed.repartitionByRange(n_files, "_zv")
        if n_files
        else zed.repartitionByRange("_zv")
    )
    ranged.sortWithinPartitions("_zv").drop("_zv").write.mode(
        "overwrite"
    ).parquet(path)


def file_dim_coverage(path: str, dim_cols: list[str]) -> list[dict]:
    """Per-file (min, max) of each dim from the parquet FOOTERS — the
    statistics the scan planner prunes with. Returns one dict per data
    file; used by tests/benchmarks to quantify how much of each dim's
    global range an average file spans (z-ordered layouts: small on every
    dim; single-sorted: small on one, ~full on the rest)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rec: dict = {"file": name}
        for c in dim_cols:
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                los.append(st.min)
                his.append(st.max)
            if los:
                rec[c] = (min(los), max(his))
        out.append(rec)
    return out
