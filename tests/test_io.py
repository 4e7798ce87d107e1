"""Cells import/export round-trips across formats, incl. binary-safe text
encodings with non-printable key bytes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from symat_hbase_tools_spark.sources import io as cio
from symat_hbase_tools_spark.sources.cells import CELL_TS, customer_cells


def cells_set(df):
    return {
        (
            bytes(r["row"]),
            r["family"],
            bytes(r["qualifier"]),
            r["ts"],
            r["type"],
            bytes(r["value"]) if r["value"] is not None else None,
        )
        for r in df.collect()
    }


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, customer, tmp_path, fmt):
    cells = customer_cells(customer.limit(30))
    path = str(tmp_path / fmt)
    cio.write_cells(cells, path, fmt=fmt)
    back = cio.read_cells(spark, path, fmt=fmt)
    assert cells_set(back) == cells_set(cells)


def test_roundtrip_binary_keys(spark, tmp_path):
    """Non-printable bytes survive the escaped text formats."""
    rows = [
        (b"\x00key", "cf", b"q\n1", CELL_TS, "Put", b"\xff\xfe"),
        (b"tab\tkey", "cf", b"q2", CELL_TS, "Put", b"plain"),
        (b"back\\slash", "cf", b"q3", CELL_TS, "Put", b"\x00"),
    ]
    cells = spark.createDataFrame(
        rows, "row binary, family string, qualifier binary, ts long, type string, value binary"
    )
    for fmt in ("json", "csv"):
        path = str(tmp_path / ("bin_" + fmt))
        cio.write_cells(cells, path, fmt=fmt)
        back = cio.read_cells(spark, path, fmt=fmt)
        assert cells_set(back) == cells_set(cells), fmt


def test_partitioned_export_prunes(spark, customer, tmp_path):
    cells = customer_cells(customer)
    path = str(tmp_path / "by_family")
    cio.write_cells(cells, path, fmt="parquet", partition_by=["family"])
    back = cio.read_cells(spark, path).filter(F.col("family") == "cf")
    from symat_hbase_tools_spark.plans.explain import plan_string

    assert "PartitionFilters: [isnotnull(family" in plan_string(back)
    assert back.count() == cells.count()


def test_unsupported_format(spark, customer):
    with pytest.raises(ValueError):
        cio.write_cells(customer_cells(customer), "/tmp/x", fmt="avro_nope")
