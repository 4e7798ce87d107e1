"""Parquet row-key bloom filters (sources/bloom.py): the kv writers must
emit them and the Spark read path must PRUNE row groups with them — the
HFile-bloom analog for the reference's point-probe workloads
(CopyRow.java:107-113, CorruptRowsMR.java:135)."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from symat_hbase_tools_spark.operators.bulkload import bulk_load_cells
from symat_hbase_tools_spark.sources.bloom import with_row_bloom
from symat_hbase_tools_spark.sources.cells import customer_cells
from symat_hbase_tools_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _bloom_offsets(spark, pattern: str, column: str = "row") -> list[int]:
    """Per-(file, row-group) bloom offset of ``column`` straight from the
    parquet footers (-1 = absent), via parquet-mr — pyarrow does not
    expose bloom metadata."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = []
    for f in sorted(glob.glob(pattern)):
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            for b in range(reader.getFooter().getBlocks().size()):
                blk = reader.getFooter().getBlocks().get(b)
                for c in range(blk.getColumns().size()):
                    cc = blk.getColumns().get(c)
                    if cc.getPath().toDotString() == column:
                        out.append(cc.getBloomFilterOffset())
        finally:
            reader.close()
    return out


def _point_get_prunable(spark, pattern: str, column: str = "row") -> list[str]:
    """Per-(file, row-group) point-get prunability of ``column``: 'bloom'
    (split-block bloom present) or 'dict' (chunk fully dictionary-encoded
    — parquet-mr deliberately SKIPS the bloom there because the reader's
    dictionary filter already prunes exactly; the bloom takes over at
    dictionary fallback, i.e. high-cardinality chunks) or 'none'."""
    import pyarrow.parquet as pq

    offsets = _bloom_offsets(spark, pattern, column)
    kinds, i = [], 0
    for f in sorted(glob.glob(pattern)):
        md = pq.ParquetFile(f).metadata
        for b in range(md.num_row_groups):
            rg = md.row_group(b)
            for c in range(rg.num_columns):
                cc = rg.column(c)
                if cc.path_in_schema == column:
                    if offsets[i] >= 0:
                        kinds.append("bloom")
                    elif any("DICTIONARY" in e for e in cc.encodings) and not (
                        "PLAIN" in cc.encodings
                    ):
                        kinds.append("dict")
                    else:
                        kinds.append("none")
                    i += 1
    return kinds


def _scan_output_rows(df) -> int:
    """numOutputRows of the scan node after execution — the vectorized
    parquet reader filters at ROW-GROUP granularity, so this counts rows
    of surviving row groups (the Filter above re-filters them)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    rows = []

    def walk(node):
        if "FileSourceScan" in node.getClass().getName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    rows.append(kv._2().value())
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    assert rows, "no scan node found"
    return sum(rows)


def test_bulk_load_is_point_get_prunable(spark, tmp_path):
    """Every row group of every bulk-loaded region file must be point-get
    prunable without decoding: a bloom filter, or (at fixture scale) a
    complete dictionary — parquet-mr skips the bloom for fully-dict
    chunks because the dictionary filter prunes exactly; high-cardinality
    chunks (the 100 TB case) fall back to plain and MUST carry the bloom,
    which test_point_get_prunes_row_groups_via_bloom certifies."""
    cells = customer_cells(load_table(spark, SF_DIR, "customer"))
    path = str(tmp_path / "regions")
    bulk_load_cells(cells, path, num_regions=4)
    kinds = _point_get_prunable(spark, f"{path}/*.parquet")
    assert kinds and all(k in ("bloom", "dict") for k in kinds), kinds
    # and the armed writer really does emit the bloom once the chunk
    # leaves the dictionary regime: 60k distinct keys in one file
    big = spark.range(60_000).select(
        F.encode(F.format_string("cust#%08d", F.col("id")), "UTF-8").alias("row"),
        F.lit("f").alias("family"),
        F.encode(F.lit("q"), "UTF-8").alias("qualifier"),
        F.lit(1).alias("ts"),
        F.lit("Put").alias("type"),
        F.encode(F.lit("v"), "UTF-8").alias("value"),
    )
    bpath = str(tmp_path / "big")
    bulk_load_cells(big, bpath, num_regions=2)
    kinds = _point_get_prunable(spark, f"{bpath}/*.parquet")
    assert "bloom" in kinds and "none" not in kinds, kinds


def test_point_get_prunes_row_groups_via_bloom(spark, tmp_path):
    """The measured IO cut, on the layout footer stats CANNOT prune: keys
    written in hash-scattered order so every row group spans ~the full
    key range. A point get over the bloom-armed file must emit roughly
    one row group's rows; the unarmed twin emits the whole table."""
    n = 60_000
    df = spark.range(0, n).select(
        F.encode(
            F.format_string(
                "cust#%08d", F.pmod(F.col("id") * 48271 + 11, F.lit(n))
            ),
            "UTF-8",
        ).alias("row"),
        (F.col("id") % 7).alias("v"),
    )
    on, off = str(tmp_path / "on"), str(tmp_path / "off")
    small_groups = {"parquet.block.size": str(128 * 1024)}
    w = df.repartition(1).write.mode("overwrite").options(**small_groups)
    with_row_bloom(w, ndv=8192).parquet(on)
    df.repartition(1).write.mode("overwrite").options(**small_groups).parquet(off)

    key = F.encode(F.lit("cust#00012345"), "UTF-8")
    got_on = spark.read.parquet(on).filter(F.col("row") == key)
    got_off = spark.read.parquet(off).filter(F.col("row") == key)
    assert got_on.count() == 1 and got_off.count() == 1  # same answer
    rows_on = _scan_output_rows(got_on)
    rows_off = _scan_output_rows(got_off)
    # unarmed: min/max can't prune the scattered layout — full scan
    assert rows_off == n, rows_off
    # armed: bloom rejects all but ~the one matching row group (allow a
    # false-positive group of slack)
    n_groups = len(_bloom_offsets(spark, f"{on}/*.parquet"))
    assert n_groups >= 8, n_groups  # the layout really is multi-row-group
    assert rows_on <= 3 * (n // n_groups) + 1, (rows_on, n_groups)


def test_in_place_overwrite_and_fixture_writes_carry_bloom(spark, tmp_path):
    """The CLI's in-place destination rewrite (sources/catalog.py) arms
    cells outputs with the row bloom; non-cells frames are untouched."""
    from symat_hbase_tools_spark.sources.catalog import overwrite_table_in_place

    cells = customer_cells(load_table(spark, SF_DIR, "customer")).limit(200)
    dest = str(tmp_path / "dest")
    cells.write.mode("overwrite").parquet(dest)
    overwrite_table_in_place(spark.read.parquet(dest), dest)
    kinds = _point_get_prunable(spark, f"{dest}/*.parquet")
    assert kinds and all(k in ("bloom", "dict") for k in kinds), kinds
    # a row-less frame goes through the plain writer (no bloom options)
    plain = str(tmp_path / "plain")
    spark.range(5).write.mode("overwrite").parquet(plain)
    overwrite_table_in_place(spark.read.parquet(plain), plain)
    assert spark.read.parquet(plain).count() == 5


def test_bucketed_table_write_carries_row_bloom(spark):
    """The one distinct writer mechanism: per-column bloom options must
    survive the bucketBy().saveAsTable() path too (verified at a
    cardinality past the dictionary regime so the blooms actually
    materialize)."""
    from symat_hbase_tools_spark.sources.bucketed import write_bucketed

    df = spark.range(0, 150_000).select(
        F.encode(F.format_string("cust#%08d", F.col("id")), "UTF-8").alias("row"),
        F.lit("f").alias("family"),
        F.encode(F.lit("q"), "UTF-8").alias("qualifier"),
        (F.col("id") % 5).alias("ts"),
    )
    spark.sql("DROP TABLE IF EXISTS bloom_bucketed_tbl")
    try:
        write_bucketed(
            df, "bloom_bucketed_tbl", ["row", "family", "qualifier"], n_buckets=4
        )
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED bloom_bucketed_tbl")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).replace("file:", "")
        offsets = _bloom_offsets(spark, f"{loc}/*.parquet")
        assert offsets and all(o >= 0 for o in offsets), offsets
    finally:
        spark.sql("DROP TABLE IF EXISTS bloom_bucketed_tbl")


def test_absent_key_point_get_scans_nothing_with_bloom(spark, tmp_path):
    """The canonical bloom win is the NEGATIVE lookup: probing a key that
    exists nowhere must emit zero scan rows from the armed file (every
    row group rejected), while the unarmed twin full-scans — the shape
    of CorruptRowsMR's per-row re-get against a missing/corrupt row."""
    n = 60_000
    df = spark.range(0, n).select(
        F.encode(
            F.format_string(
                "cust#%08d", F.pmod(F.col("id") * 48271 + 11, F.lit(n))
            ),
            "UTF-8",
        ).alias("row"),
        (F.col("id") % 7).alias("v"),
    )
    on, off = str(tmp_path / "on"), str(tmp_path / "off")
    opts = {"parquet.block.size": str(128 * 1024)}
    with_row_bloom(
        df.repartition(1).write.mode("overwrite").options(**opts), ndv=8192
    ).parquet(on)
    df.repartition(1).write.mode("overwrite").options(**opts).parquet(off)
    # absent key INSIDE the key range: 'cust#00012345x' sorts between two
    # existing keys, so min/max stats cannot reject it ('ghost#...' would
    # be pruned by the file-level range on both sides and prove nothing)
    key = F.encode(F.lit("cust#00012345x"), "UTF-8")
    got_on = spark.read.parquet(on).filter(F.col("row") == key)
    got_off = spark.read.parquet(off).filter(F.col("row") == key)
    assert got_on.count() == 0 and got_off.count() == 0
    assert _scan_output_rows(got_on) == 0
    assert _scan_output_rows(got_off) == n


def test_ndv_for_bytes_sizes_from_budget():
    """Round-15 ADVICE fix: bloom ndv derives from the row-group byte
    budget (clamped to [1024, default]) instead of the fixed 1M — the
    measured small-row-group file-bloat case."""
    from symat_hbase_tools_spark.sources.bloom import (
        EST_CELL_ROW_BYTES,
        ROW_BLOOM_NDV,
        ndv_for_bytes,
    )

    assert ndv_for_bytes(128 * 1024 * 1024) == ROW_BLOOM_NDV
    assert ndv_for_bytes(1024 * 1024) == (1024 * 1024) // EST_CELL_ROW_BYTES
    assert ndv_for_bytes(0) == 1024  # floor
