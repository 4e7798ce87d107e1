"""copy_row — the CopyRow.java equivalent (SURVEY.md §3.1).

Point-read one row's cells, optionally rewrite every cell's timestamp (the
"version bump", /root/reference/src/main/java/org/apache/symat/CopyRow.java:120-137),
and upsert them into a destination cells table (dest may equal source —
README.md:12-17).

Spark shape: filter (pushed-down binary equality) -> withColumn(ts) ->
cell-granularity upsert (anti-join + union). All built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: cell identity for upsert — an HBase Put overwrites an existing cell with
#: the same coordinates (row, family, qualifier, ts)
CELL_KEY = ["row", "family", "qualifier", "ts"]


def copy_row_cells(
    cells: DataFrame,
    row_key: bytes,
    override_ts: int | None = None,
    latest_only: bool = True,
) -> DataFrame:
    """The cells that CopyRow would write: one row's cells, ts optionally
    rewritten (T1). Empty result == the reference's empty-row guard case
    (CopyRow.java:114-117) — the caller checks ``.limit(1).count()``.

    ``latest_only=True`` matches the reference exactly: its ``Get`` uses the
    default max-versions=1, so only the newest visible version of each
    qualifier is read and copied (CopyRow.java:107-113). Pass False to copy
    every stored version (a full-history replica repair).
    """
    row = cells.filter(F.col("row") == F.lit(row_key))
    if latest_only:
        from symat_hbase_tools_spark.operators.kv import visible_cells

        row = visible_cells(row)
    if override_ts is not None:
        row = row.withColumn("ts", F.lit(int(override_ts)).cast("long"))
    return row


def upsert_cells(dest: DataFrame, puts: DataFrame) -> DataFrame:
    """Apply Puts to a destination cells table (K1).

    HBase Put semantics: same-coordinate cells are overwritten, new
    coordinates are added. anti-join keeps unaffected dest cells; union adds
    the puts. At scale the anti-join broadcasts `puts` (a single row's cells).
    """
    keep = dest.join(F.broadcast(puts.select(*CELL_KEY)), CELL_KEY, "left_anti")
    return keep.unionByName(puts)


def copy_row(
    source: DataFrame,
    dest: DataFrame,
    row_key: bytes,
    override_ts: int | None = None,
    latest_only: bool = True,
) -> tuple[DataFrame, int]:
    """Full CopyRow flow. Returns (new_dest_cells, n_cells_copied).

    n_cells_copied == 0 reproduces the empty-row guard: dest is returned
    unchanged and nothing is written (CopyRow.java:114-117).
    """
    puts = copy_row_cells(source, row_key, override_ts, latest_only)
    n = puts.count()
    if n == 0:
        return dest, 0
    return upsert_cells(dest, puts), n
