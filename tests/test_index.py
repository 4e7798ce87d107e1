"""Secondary-index (index-table pattern) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.index import (
    build_value_index,
    index_lookup,
    indexed_get,
)
from symat_hbase_tools_spark.sources.cells import customer_cells


def test_index_lookup_equals_value_scan(spark, customer):
    cells = customer_cells(customer)
    idx = build_value_index(cells, "c_mktsegment")
    keys = index_lookup(idx, b"MACHINERY")
    got = {bytes(r["row"]) for r in keys.collect()}
    want = {
        ("cust#%08d" % r["c_custkey"]).encode()
        for r in customer.filter(F.col("c_mktsegment") == "MACHINERY").collect()
    }
    assert got == want and got


def test_index_range_is_contiguous_even_with_prefix_values(spark):
    """'FOO' must not match entries indexed under 'FOOBAR' — the 0x00
    separator keeps each value's entries in a disjoint key range."""
    rows = [
        (b"r1", "cf", b"q", 1, "Put", b"FOO"),
        (b"r2", "cf", b"q", 1, "Put", b"FOOBAR"),
    ]
    cells = spark.createDataFrame(
        rows, "row binary, family string, qualifier binary, ts long, type string, value binary"
    )
    idx = build_value_index(cells, "q")
    assert {bytes(r["row"]) for r in index_lookup(idx, b"FOO").collect()} == {b"r1"}
    assert {bytes(r["row"]) for r in index_lookup(idx, b"FOOBAR").collect()} == {b"r2"}


def test_indexed_get_probe_is_broadcast(spark, customer):
    cells = customer_cells(customer)
    idx = build_value_index(cells, "c_mktsegment")
    out = indexed_get(cells, index_lookup(idx, b"BUILDING"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
