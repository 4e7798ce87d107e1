"""CLI dedup pipeline action: survivors parquet must equal the corpus minus
the non-canonical members of the near-dup clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.cli import main
from symat_hbase_tools_spark.operators import dedup
from symat_hbase_tools_spark.operators.clustering import connected_components
from symat_hbase_tools_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_cli_dedup_minhash_survivors(spark, tmp_path, capsys):
    out = str(tmp_path / "survivors")
    rc = main(["dedup", "--sfDir", SF_DIR, "--method", "minhash", "--output", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "DOCS_BEFORE=" in printed and "DROPPED=" in printed

    docs = load_table(spark, SF_DIR, "documents")
    labels = connected_components(
        dedup.minhash_lsh_pairs(spark, SF_DIR).select("d1", "d2")
    )
    want_drop = {
        r["node"]
        for r in labels.filter(F.col("node") != F.col("cluster")).collect()
    }
    survivors = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert survivors == all_ids - want_drop
    assert len(want_drop) > 0  # the corpus has planted near-dups
