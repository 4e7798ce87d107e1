"""Delete-marker semantics tests (HBase cell type carried through the model,
CopyRow.java:135; delete-marker-wins read semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators import kv
from symat_hbase_tools_spark.sources.cells import (
    DELETE_MOD,
    DELETE_REMAINDER,
    customer_cells_with_deletes,
)


def test_visible_cells_hides_deleted_qualifier(spark, customer):
    cells = customer_cells_with_deletes(customer)
    visible = kv.visible_cells(cells)
    n_deleted = customer.filter(
        F.col("c_custkey") % DELETE_MOD == DELETE_REMAINDER
    ).count()
    assert n_deleted > 0
    assert visible.count() == customer.count() * 4 - n_deleted
    # the masked qualifier is gone for marked rows, present for others
    acct = visible.filter(F.decode("qualifier", "UTF-8") == "c_acctbal")
    assert acct.count() == customer.count() - n_deleted


def test_latest_cells_surfaces_the_marker(spark, customer):
    """latest_cells (raw version view) keeps the Delete marker itself —
    visible_cells is the read view that applies it."""
    cells = customer_cells_with_deletes(customer)
    latest = kv.latest_cells(cells)
    markers = latest.filter(F.col("type") == "Delete")
    n_deleted = customer.filter(
        F.col("c_custkey") % DELETE_MOD == DELETE_REMAINDER
    ).count()
    assert markers.count() == n_deleted


def test_put_after_delete_resurrects(spark, customer):
    from symat_hbase_tools_spark.sources.cells import CELL_TS

    cells = customer_cells_with_deletes(customer)
    key = b"cust#00000003"  # custkey 3 -> 3 % 25 == 3: deleted row
    assert (
        kv.visible_cells(cells)
        .filter((F.col("row") == F.lit(key)) & (F.decode("qualifier", "UTF-8") == "c_acctbal"))
        .count()
        == 0
    )
    new_put = spark.createDataFrame(
        [(key, "cf", b"c_acctbal", CELL_TS + 5000, "Put", b"123.45")],
        "row binary, family string, qualifier binary, ts long, type string, value binary",
    )
    resurrected = kv.visible_cells(cells.unionByName(new_put))
    got = resurrected.filter(
        (F.col("row") == F.lit(key)) & (F.decode("qualifier", "UTF-8") == "c_acctbal")
    ).collect()
    assert len(got) == 1 and bytes(got[0]["value"]) == b"123.45"
