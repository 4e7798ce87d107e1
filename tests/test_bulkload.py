"""Bulk-load tests: output files must be internally sorted and pairwise
range-disjoint in HBase key order — the HFile-ingestion contract."""

from __future__ import annotations

import glob

import duckdb

from symat_hbase_tools_spark.operators.bulkload import bulk_load_cells, region_boundaries
from symat_hbase_tools_spark.sources.cells import customer_cells


def test_bulk_load_sorted_disjoint_regions(spark, customer, tmp_path):
    cells = customer_cells(customer)
    path = str(tmp_path / "regions")
    bulk_load_cells(cells, path, num_regions=8)
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert 1 < len(files) <= 8
    ranges = []
    total = 0
    con = duckdb.connect()
    for f in files:
        rows = con.execute(
            f"SELECT row FROM read_parquet('{f}')"
        ).fetchall()
        keys = [bytes(r[0]) for r in rows]
        total += len(keys)
        assert keys == sorted(keys), f"{f} not sorted"
        if keys:
            ranges.append((keys[0], keys[-1]))
    assert total == cells.count()
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping regions: {hi1!r} > {lo2!r}"


def test_bulk_load_roundtrip(spark, customer, tmp_path):
    cells = customer_cells(customer)
    path = str(tmp_path / "rt")
    bulk_load_cells(cells, path, num_regions=4)
    back = spark.read.parquet(path)
    assert back.count() == cells.count()
    assert set(back.columns) == set(cells.columns)


def test_region_boundaries(spark, customer):
    cells = customer_cells(customer)
    splits = region_boundaries(cells, num_regions=4)
    assert len(splits) <= 3
    assert splits == sorted(splits)
    assert all(isinstance(s, bytes) for s in splits)
