"""Region-store relation: per-region partitions + key-range pushdown.

Covers SURVEY.md §4.1 (the one justified custom relation): region pruning
from pushed row-key predicates, exact read-side application of consumed
filters, residual pass-back of non-key predicates, and scan-order parity
with the plain cells DataFrame.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
)

from symat_hbase_tools_spark.sources import regionstore as rs
from symat_hbase_tools_spark.sources.cells import customer_cells

N_REGIONS = 8


@pytest.fixture(scope="module")
def store(spark, customer):
    d = tempfile.mkdtemp(prefix="regionstore-")
    cells = customer_cells(customer)
    meta = rs.write_region_store(cells, d, n_regions=N_REGIONS)
    yield d, meta, cells
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(
        (bytes(r["row"]), r["family"], bytes(r["qualifier"]), r["ts"], r["type"],
         bytes(r["value"]))
        for r in df.collect()
    )


def test_store_metadata_covers_keyspace(store):
    _, meta, _ = store
    assert len(meta) == N_REGIONS
    assert meta[0]["start"] is None and meta[-1]["stop"] is None
    for prev, nxt in zip(meta, meta[1:]):
        assert prev["stop"] == nxt["start"]  # contiguous, no gaps


def test_full_scan_roundtrip(spark, store):
    d, _, cells = store
    assert _rows(rs.read_region_store(spark, d)) == _rows(cells)


def test_range_scan_matches_dataframe_filter(spark, store):
    d, _, cells = store
    start, stop = b"cust#00000030", b"cust#00000090"
    pred = (F.col("row") >= start) & (F.col("row") < stop)
    got = rs.read_region_store(spark, d).filter(pred)
    assert _rows(got) == _rows(cells.filter(pred))


def test_range_pushdown_prunes_regions(store):
    d, meta, _ = store
    r = rs.RegionStoreReader({"path": d})
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("row",), b"cust#00000030"),
                LessThan(("row",), b"cust#00000090"),
            ]
        )
    )
    assert residual == []  # key-range filters fully consumed
    parts = r.partitions()
    assert 0 < len(parts) < len(meta)


def test_point_get_touches_one_region(spark, store):
    d, _, cells = store
    key = b"cust#00000042"
    r = rs.RegionStoreReader({"path": d})
    assert list(r.pushFilters([EqualTo(("row",), key)])) == []
    assert len(r.partitions()) == 1
    got = rs.read_region_store(spark, d).filter(F.col("row") == key)
    assert _rows(got) == _rows(cells.filter(F.col("row") == key))


def test_multi_get_in_filter(spark, store):
    d, _, cells = store
    keys = [b"cust#00000001", b"cust#00000080", b"cust#00000150"]
    r = rs.RegionStoreReader({"path": d})
    assert list(r.pushFilters([In(("row",), tuple(keys))])) == []
    # 3 keys spread across the keyspace: touches <= 3 regions, not all 8
    assert len(r.partitions()) <= 3
    got = rs.read_region_store(spark, d).filter(F.col("row").isin(keys))
    assert _rows(got) == _rows(cells.filter(F.col("row").isin(keys)))


def test_greater_than_excludes_boundary(spark, store):
    """row > k must exclude k itself (successor = k + 0x00 in unsigned lex)."""
    d, _, cells = store
    k = b"cust#00000100"
    got = rs.read_region_store(spark, d).filter(F.col("row") > k)
    assert _rows(got) == _rows(cells.filter(F.col("row") > k))
    assert all(row[0] > k for row in _rows(got))


def test_less_than_or_equal_includes_boundary(spark, store):
    d, _, cells = store
    k = b"cust#00000010"
    got = rs.read_region_store(spark, d).filter(F.col("row") <= k)
    assert _rows(got) == _rows(cells.filter(F.col("row") <= k))


def test_empty_range_reads_nothing(store):
    d, _, _ = store
    r = rs.RegionStoreReader({"path": d})
    list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("row",), b"cust#00000090"),
                LessThan(("row",), b"cust#00000030"),
            ]
        )
    )
    assert r.partitions() == []


def test_non_key_filters_are_residual(spark, store):
    """ts / qualifier predicates come back unsupported and Spark still
    applies them — mixed query returns exactly the right rows."""
    d, _, cells = store
    r = rs.RegionStoreReader({"path": d})
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("row",), b"cust#00000030"),
                EqualTo(("ts",), 123),
            ]
        )
    )
    assert [type(f) for f in residual] == [EqualTo]
    pred = (F.col("row") >= b"cust#00000030") & (
        F.decode("qualifier", "UTF-8") == "c_name"
    )
    got = rs.read_region_store(spark, d).filter(pred)
    assert _rows(got) == _rows(cells.filter(pred))


def test_scan_order_is_hbase_order(spark, store):
    """orderBy(row) over the store reproduces unsigned-lex HBase scan order."""
    d, _, _ = store
    got = [
        bytes(r["row"])
        for r in rs.read_region_store(spark, d).orderBy("row").select("row").collect()
    ]
    assert got == sorted(got)


def test_bloom_no_false_negatives(store):
    """Every present key must pass its region's bloom (bloom guarantee)."""
    d, meta, cells = store
    keys = [bytes(r["row"]) for r in cells.select("row").distinct().collect()]
    for key in keys:
        r = rs.RegionStoreReader({"path": d})
        list(r.pushFilters([EqualTo(("row",), key)]))
        assert len(r.partitions()) >= 1, key  # never bloom-pruned to zero


def test_bloom_prunes_absent_key_get(spark, store):
    """A GET for an in-range but absent key should (almost always) open no
    region at all — the ghost-read short-circuit. With ~1% fp rate per
    region, 50 absent keys pruning to zero partitions in >= 45 cases is a
    conservative bound; correctness holds either way (result is empty)."""
    d, _, _ = store
    pruned = 0
    for i in range(50):
        ghost = b"cust#00000042x%02d" % i  # in-range, never written
        r = rs.RegionStoreReader({"path": d})
        list(r.pushFilters([EqualTo(("row",), ghost)]))
        if len(r.partitions()) == 0:
            pruned += 1
    assert pruned >= 45
    got = rs.read_region_store(spark, d).filter(
        F.col("row") == b"cust#00000042x00"
    )
    assert got.count() == 0


def test_bloom_metadata_written(store):
    _, meta, _ = store
    for r in meta:
        assert r["n_keys"] > 0
        assert len(r["bloom"]) >= 16  # hex-encoded, non-trivial
