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


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    """Malformed JSONL lines land in quarantine, good lines parse — one bad
    shard must never fail a corpus ingest."""
    from symat_hbase_tools_spark.sources.io import read_documents_jsonl

    p = tmp_path / "shard"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}\n'
        "this is not json at all\n"
        '{"doc_id": "NOT_A_NUMBER", "text": "x", "lang": "en", "source": "s", "n_chars": 1}\n'
        '{"doc_id": 2, "text": "ok", "lang": "zh", "source": "s", "n_chars": 2}\n'
    )
    good, bad = read_documents_jsonl(spark, str(p))
    good_rows = {r["doc_id"] for r in good.collect()}
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert good_rows == {1, 2}
    assert len(bad_rows) == 2
    assert any("not json" in b for b in bad_rows)


def test_jsonl_roundtrip_query_matches_parquet(spark):
    from symat_hbase_tools_spark.entry import QUERIES
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    out = {
        r["lang"]: (r["n_docs"], r["sum_chars"])
        for r in QUERIES["docs_jsonl_roundtrip"](spark, SF_DIR).collect()
    }
    import pyspark.sql.functions as F

    want = {
        r["lang"]: (r["n"], r["s"])
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert out == want


def test_orc_roundtrip_lossless(spark, documents, tmp_path):
    from symat_hbase_tools_spark.sources.io import (
        read_documents_orc,
        write_documents_orc,
    )

    path = str(tmp_path / "orc")
    write_documents_orc(documents, path)
    back = read_documents_orc(spark, path)
    orig = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
            for r in documents.collect()}
    got = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
           for r in back.collect()}
    assert got == orig

def test_scratch_paths_are_process_scoped(spark):
    """No derived store/export may land at a fixed shared /tmp path: two
    concurrent runs against the same sf_dir must not race on files
    (round-4 verdict #1 — the regionstore had the last fixed path)."""
    import tempfile

    from symat_hbase_tools_spark import entry
    from tests.conftest import SF_DIR

    tmproot = tempfile.gettempdir()
    for q in ("kv_region_scan", "docs_jsonl_roundtrip"):
        entry.QUERIES[q](spark, SF_DIR).collect()
    assert entry._FIXTURE_ROOT, "scratch root should exist after fixture use"
    root = entry._FIXTURE_ROOT[0]
    # mkdtemp => random suffix, mode 0700, owned by this process
    assert root.startswith(tmproot) and root != tmproot
    import os

    assert os.path.basename(root).startswith("symat_fixtures_")
    assert len(os.path.basename(root)) > len("symat_fixtures_")
    # the regionstore landed INSIDE the scratch, not at a fixed path
    stores = [p for p in os.listdir(root) if p.startswith("regionstore_")]
    assert stores, os.listdir(root)
