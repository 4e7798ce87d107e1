"""Z-order layout: the written files must give NARROW per-file min/max
statistics on EVERY clustered dimension — that is the entire point (2-D
predicates prune files), and it is measurable from the parquet footers."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from symat_hbase_tools_spark.operators.layout import (
    file_dim_coverage,
    grid_bucket,
    zorder_write,
    zvalue,
)
from symat_hbase_tools_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_zvalue_interleave_bits(spark):
    # bit b of dim i lands at b*ndims + i
    df = spark.createDataFrame([(0b1010, 0b0110)], "x long, y long")
    got = df.select(
        zvalue([F.col("x"), F.col("y")], bits=4).alias("z")
    ).collect()[0]["z"]
    want = 0
    for b in range(4):
        want |= ((0b1010 >> b) & 1) << (2 * b)
        want |= ((0b0110 >> b) & 1) << (2 * b + 1)
    assert got == want


def test_grid_bucket_bounds(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    got = [
        r["b"]
        for r in df.select(
            grid_bucket(F.col("v"), F.lit(0.0), F.lit(100.0), bits=8).alias("b")
        ).collect()
    ]
    assert got[0] == 0 and got[2] == 255 and 120 <= got[1] <= 135


def _avg_span(cov, col, lo, hi):
    spans = [
        (rec[col][1] - rec[col][0]) / (hi - lo)
        for rec in cov
        if col in rec and hi > lo
    ]
    return sum(spans) / len(spans)


def test_zorder_layout_narrows_both_dims(spark, tmp_path):
    """Z-ordered write: every file covers a small rectangle of
    (custkey, orderdate); a single-column sort leaves the second dim's
    per-file range ~full-width. Quantified straight from the parquet
    footers that the scan planner prunes with."""
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", F.unix_timestamp("o_orderdate").alias("ts")
    )
    lo_c, hi_c, lo_t, hi_t = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("ts"), F.max("ts")
    ).collect()[0]

    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    zorder_write(orders, ["o_custkey", "ts"], zpath, n_files=16)
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    zcov = file_dim_coverage(zpath, ["o_custkey", "ts"])
    scov = file_dim_coverage(spath, ["o_custkey", "ts"])
    assert len(zcov) >= 8 and len(scov) >= 8

    z_ck = _avg_span(zcov, "o_custkey", lo_c, hi_c)
    z_ts = _avg_span(zcov, "ts", lo_t, hi_t)
    s_ck = _avg_span(scov, "o_custkey", lo_c, hi_c)
    s_ts = _avg_span(scov, "ts", lo_t, hi_t)

    # single-sort: first dim tight, second dim ~full width — a predicate
    # on ts alone prunes NOTHING in this layout
    assert s_ck < 0.25 and s_ts > 0.8, (s_ck, s_ts)
    # z-order: BOTH dims well under full width. (The span PRODUCT is the
    # same for both layouts in theory — 16 files tile the same total area;
    # z-order's win is the worst-dimension bound: any single-dim or 2-D
    # predicate prunes, instead of only the lead-column ones.)
    assert z_ck < 0.5 and z_ts < 0.5, (z_ck, z_ts)
    assert max(z_ck, z_ts) < 0.6 < max(s_ck, s_ts), (z_ck, z_ts, s_ck, s_ts)


def test_zorder_write_roundtrip_content(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", F.unix_timestamp("o_orderdate").alias("ts")
    )
    path = str(tmp_path / "z2")
    zorder_write(orders, ["o_custkey", "ts"], path, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == {"o_orderkey", "o_custkey", "ts"}
    assert back.select(F.sum("o_orderkey")).collect() == orders.select(
        F.sum("o_orderkey")
    ).collect()
