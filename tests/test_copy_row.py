"""copy_row tests — timestamp-override cell equality (T1), empty-row guard
(T6), same-table and cross-table upsert (K1) — CopyRow.java semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.copy_row import copy_row, copy_row_cells
from symat_hbase_tools_spark.operators.diff import cells_diff
from symat_hbase_tools_spark.sources.cells import (
    CELL_TS,
    CUSTOMER_QUALIFIERS,
    customer_cells,
)

KEY = b"cust#00000042"
NEW_TS = 1_786_000_000_000


def test_ts_override_preserves_everything_else(spark, customer):
    cells = customer_cells(customer)
    before = {
        (bytes(r["qualifier"]), bytes(r["value"]), r["type"], r["family"])
        for r in cells.filter(F.col("row") == F.lit(KEY)).collect()
    }
    bumped = copy_row_cells(cells, KEY, override_ts=NEW_TS).collect()
    assert len(bumped) == len(CUSTOMER_QUALIFIERS)
    assert all(r["ts"] == NEW_TS for r in bumped)
    after = {
        (bytes(r["qualifier"]), bytes(r["value"]), r["type"], r["family"]) for r in bumped
    }
    assert after == before


def test_no_override_keeps_ts(spark, customer):
    cells = customer_cells(customer)
    got = copy_row_cells(cells, KEY).collect()
    assert all(r["ts"] == CELL_TS for r in got)


def test_empty_row_guard(spark, customer):
    cells = customer_cells(customer)
    new_dest, n = copy_row(cells, cells, b"missing#row", override_ts=NEW_TS)
    assert n == 0
    assert new_dest is cells  # dest returned unchanged, nothing written


def test_same_table_version_bump(spark, customer):
    """--override on the same table adds new-ts cells alongside the old ones
    (different ts == different cell coordinates == both versions kept)."""
    cells = customer_cells(customer)
    new_dest, n = copy_row(cells, cells, KEY, override_ts=NEW_TS)
    assert n == len(CUSTOMER_QUALIFIERS)
    row_cells = new_dest.filter(F.col("row") == F.lit(KEY))
    assert row_cells.count() == 2 * len(CUSTOMER_QUALIFIERS)
    assert {r["ts"] for r in row_cells.collect()} == {CELL_TS, NEW_TS}


def test_same_coordinates_upsert_is_idempotent(spark, customer):
    cells = customer_cells(customer)
    new_dest, n = copy_row(cells, cells, KEY, override_ts=None)
    assert n == len(CUSTOMER_QUALIFIERS)
    assert new_dest.count() == cells.count()  # overwrite, not duplicate


def test_cross_table_copy_and_diff(spark, customer):
    src = customer_cells(customer)
    dst = src.filter(F.col("row") != F.lit(KEY))  # replica missing one row
    new_dst, n = copy_row(src, dst, KEY)
    assert n == len(CUSTOMER_QUALIFIERS)
    assert cells_diff(src, new_dst).count() == 0  # replica repaired
    d = cells_diff(dst, new_dst).collect()
    assert {r["change"] for r in d} == {"added"}
    assert {r["row"] for r in d} == {KEY.decode()}
