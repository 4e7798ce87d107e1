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


def test_cli_bpe_train_writes_merge_table(tmp_path, capsys):
    from symat_hbase_tools_spark.cli import main

    out = tmp_path / "merges.tsv"
    rc = main(["bpe-train", "--merges", "4", "--output", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4
    ranks, counts = [], []
    for ln in lines:
        rank, left, right, cnt = ln.split("\t")
        ranks.append(int(rank))
        counts.append(int(cnt))
        assert left and right
    assert ranks == [0, 1, 2, 3]
    assert counts == sorted(counts, reverse=True)
    assert "LEARNED_MERGES=4" in capsys.readouterr().out


def test_cli_resample_writes_survivors(tmp_path, capsys):
    import re

    from symat_hbase_tools_spark.cli import main

    out = tmp_path / "resampled"
    rc = main(["resample", "--output", str(out)])
    assert rc == 0
    m = re.search(r"DOCS_BEFORE=(\d+) DOCS_AFTER=(\d+) DROPPED=(\d+)",
                  capsys.readouterr().out)
    before, after, dropped = map(int, m.groups())
    assert before == after + dropped and 0 < after < before


def test_cli_chunk_covers_every_doc(tmp_path, capsys):
    import re

    from symat_hbase_tools_spark.cli import main

    out = tmp_path / "chunks"
    rc = main(["chunk", "--output", str(out)])
    assert rc == 0
    m = re.search(r"DOCS=(\d+) CHUNKS=(\d+)", capsys.readouterr().out)
    n_docs, n_chunks = map(int, m.groups())
    assert n_docs == 500 and n_chunks >= n_docs
