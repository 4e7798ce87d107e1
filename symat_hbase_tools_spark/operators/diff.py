"""Snapshot diff — the CopyRow replica-repair use case generalized.

The reference's CopyRow exists to patch individual rows that differ between a
replica and prod (/root/reference/README.md:16-17). At scale you first need to
*find* those rows: a distributed table diff. Implemented as one full-outer
join on cell coordinates comparing values — Catalyst plans a single shuffle
on the join key; with both sides bucketed by row the shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cells_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """Rows added/removed/changed between two cell snapshots.

    Output: key cols (escaped strings for binary cols), change STRING
    ('added'|'removed'|'changed'), old_value STRING, new_value STRING.
    Version dimension is compared by value at identical coordinates; run
    ``latest_cells`` first to diff logical table content.
    """
    key_cols = key_cols or ["row", "family", "qualifier"]
    o = old.select(*key_cols, F.col("value").alias("_old"))
    n = new.select(*key_cols, F.col("value").alias("_new"))
    joined = o.join(n, key_cols, "full_outer")
    out_keys = [
        F.decode(F.col(k), "UTF-8").alias(k) if k in ("row", "qualifier") else F.col(k)
        for k in key_cols
    ]
    return (
        joined.withColumn(
            "change",
            F.when(F.col("_old").isNull(), F.lit("added"))
            .when(F.col("_new").isNull(), F.lit("removed"))
            .when(F.col("_old") != F.col("_new"), F.lit("changed")),
        )
        .filter(F.col("change").isNotNull())
        .select(
            *out_keys,
            "change",
            F.decode(F.col("_old"), "UTF-8").alias("old_value"),
            F.decode(F.col("_new"), "UTF-8").alias("new_value"),
        )
    )
