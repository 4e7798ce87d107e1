"""CDC / slowly-changing-dimension surface over the cell layer.

The versioned cells table IS a change-data-capture log (every Put/Delete is
an event with a timestamp); this module derives the two standard views:

  * apply_changeset — MERGE INTO emulation (no Delta in this image): apply a
    batch of upserts/deletes to a snapshot. Upserts overwrite at identical
    coordinates (anti-join + union, same shape as copy_row's K1); deletes
    are delete-marker cells so history is preserved — `visible_cells` gives
    the post-merge table.
  * scd2_history — type-2 dimension view: one row per version with
    [valid_from, valid_to) windows; valid_to of the current version is NULL.
    One window (lead over ts per coordinate) — a single shuffle on the
    natural key, which is how SCD2 is built at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.copy_row import CELL_KEY


def apply_changeset(snapshot: DataFrame, changes: DataFrame) -> DataFrame:
    """MERGE: upsert/delete cells onto a snapshot (both in cells schema).

    Identical-coordinate cells are replaced by the change; new coordinates
    (including Delete markers at fresh timestamps) are appended.
    """
    kept = snapshot.join(changes.select(*CELL_KEY), CELL_KEY, "left_anti")
    return kept.unionByName(changes)


def scd2_history(cells: DataFrame) -> DataFrame:
    """Type-2 history: validity window per version of each cell coordinate.

    Output: row, family, qualifier, value, type, valid_from, valid_to
    (valid_to NULL = current). Delete markers close the previous version and
    open a (typed) tombstone interval, preserving audit history.
    """
    w = Window.partitionBy("row", "family", "qualifier").orderBy("ts")
    return cells.select(
        "row",
        "family",
        "qualifier",
        "value",
        "type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
