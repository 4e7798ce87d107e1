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


def test_cli_ann_index_build_append_query(spark, tmp_path, capsys):
    """ann-index lifecycle through the CLI: build a persisted IVF index,
    append a shifted-id clone batch (frozen-codebook ingest), query with
    the clones — every clone must find its original at sim 1.0 (the
    appended union is immediately searchable), results land in parquet."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.cli import main
    from symat_hbase_tools_spark.sources.tables import load_table

    idx = str(tmp_path / "ivf")
    rc = main(["ann-index", "--action", "build", "--indexDir", idx,
               "--sfDir", "/root/testdata/sf0.001"])
    assert rc == 0
    assert "built index" in capsys.readouterr().out

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    batch = emb.limit(40).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    bpath = str(tmp_path / "batch")
    batch.write.parquet(bpath)
    rc = main(["ann-index", "--action", "append", "--indexDir", idx,
               "--vectors", bpath, "--nAssign", "3"])
    assert rc == 0
    assert "appended 40" in capsys.readouterr().out

    out = str(tmp_path / "res")
    rc = main(["ann-index", "--action", "query", "--indexDir", idx,
               "--vectors", bpath, "--k", "3", "--output", out])
    assert rc == 0
    res = spark.read.parquet(out)
    top = {r["query_id"]: (r["neighbor_id"], r["sim"])
           for r in res.filter(F.col("sim") >= 0.999999).collect()}
    # every clone's exact twin (vec_id - 100000) is its sim-1.0 neighbor
    for qid, (nid, _) in top.items():
        assert nid == qid - 100000
    assert len(top) == 40


def test_cli_decontaminate_writes_clean_corpus(spark, tmp_path, capsys):
    """decontaminate drops the benchmark subset AND every training doc
    sharing >= minOverlap shingles with it; the clean corpus must contain
    no benchmark doc and none of the operator's reported hits, and the
    bloom screen must produce the identical corpus (no false negatives,
    exact verify on survivors)."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.cli import main
    from symat_hbase_tools_spark.operators.contamination import (
        benchmark_contamination,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "clean")
    rc = main(["decontaminate", "--sfDir", sf, "--output", out])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "DOCS_BEFORE=500" in stdout and "DOCS_AFTER=" in stdout

    clean = spark.read.parquet(out)
    assert clean.filter(F.col("doc_id") % 50 == 0).count() == 0
    hits = {r["doc_id"] for r in benchmark_contamination(spark, sf).collect()}
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not (hits & kept)

    out_bloom = str(tmp_path / "clean_bloom")
    rc = main(["decontaminate", "--sfDir", sf, "--method", "bloom",
               "--output", out_bloom])
    assert rc == 0
    kept_bloom = {
        r["doc_id"]
        for r in spark.read.parquet(out_bloom).select("doc_id").collect()
    }
    assert kept_bloom == kept


def test_cli_select_writes_budgeted_corpus(spark, tmp_path, capsys):
    """`select` writes exactly the token_budget_select survivors, joined
    back to their document rows, with the provenance columns."""
    from symat_hbase_tools_spark.operators.text_analysis import (
        token_budget_select,
    )

    out = str(tmp_path / "selected")
    rc = main(["select", "--sfDir", SF_DIR, "--output", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "DOCS_SELECTED=" in printed and "TOKENS_SELECTED=" in printed

    want = {r["doc_id"] for r in token_budget_select(spark, SF_DIR).collect()}
    got_df = spark.read.parquet(out)
    got = {r["doc_id"] for r in got_df.select("doc_id").collect()}
    assert got == want
    assert {"text", "score", "sel_rank", "cum_tokens"} <= set(got_df.columns)


def test_cli_mine_negatives_writes_pairs(spark, tmp_path, capsys):
    """`mine-negatives` writes the hard-negative pairs (routed exact at
    this scale) — k rows per labeled query, no same-label pair."""
    out = str(tmp_path / "negs")
    rc = main(["mine-negatives", "--sfDir", SF_DIR, "--k", "3", "--output", out])
    assert rc == 0
    assert "NEGATIVE_PAIRS=" in capsys.readouterr().out

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label")
    label_of = {r["vec_id"]: r["label"] for r in emb.collect()}
    rows = spark.read.parquet(out).collect()
    per_q: dict = {}
    for r in rows:
        assert label_of[r["query_id"]] != label_of[r["negative_id"]]
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert per_q and all(v <= 3 for v in per_q.values())


def test_cli_mine_negatives_rejects_nprobe_zero(spark, tmp_path, capsys):
    """`--nProbe 0` must be rejected, not silently replaced with the
    default (round-9 advisory: `or`-defaulting treated 0 as unset)."""
    from symat_hbase_tools_spark.operators.similarity import build_ivf_index

    idx = str(tmp_path / "np0_idx")
    build_ivf_index(spark, SF_DIR, idx, n_cells=4)
    rc = main(
        [
            "mine-negatives", "--sfDir", SF_DIR, "--indexDir", idx,
            "--nProbe", "0", "--output", str(tmp_path / "out"),
        ]
    )
    assert rc == 1
    assert "--nProbe must be >= 1" in capsys.readouterr().err


def test_cli_ann_index_query_rejects_nprobe_zero(spark, tmp_path, capsys):
    """Same falsy-zero guard on the `ann-index query` action."""
    import os

    from symat_hbase_tools_spark.operators.similarity import build_ivf_index

    idx = str(tmp_path / "np0q_idx")
    build_ivf_index(spark, SF_DIR, idx, n_cells=4)
    vecs = str(tmp_path / "qvecs")
    (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .limit(3)
        .write.mode("overwrite")
        .parquet(vecs)
    )
    rc = main(
        [
            "ann-index", "--action", "query", "--indexDir", idx,
            "--vectors", vecs, "--nProbe", "0",
        ]
    )
    assert rc == 1
    assert "--nProbe must be >= 1" in capsys.readouterr().err


def test_cli_curate_ccnet_and_dsir(spark, tmp_path, capsys):
    """curate writes the kept corpus with provenance columns: ccnet drops
    exactly the per-language tail tercile; dsir keeps exactly the
    selected top-fifth."""
    from symat_hbase_tools_spark.operators import text_analysis

    out1 = str(tmp_path / "ccnet_kept")
    rc = main(["curate", "--sfDir", SF_DIR, "--method", "ccnet", "--output", out1])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "DOCS_KEPT=" in printed and "METHOD=ccnet" in printed
    kept = {r["doc_id"] for r in spark.read.parquet(out1).collect()}
    want = {
        r["doc_id"]
        for r in text_analysis.ccnet_buckets(spark, SF_DIR).collect()
        if r["ppl_bucket"] in ("head", "middle")
    }
    assert kept == want
    assert "ppl_bucket" in spark.read.parquet(out1).columns

    out2 = str(tmp_path / "dsir_kept")
    rc = main(["curate", "--sfDir", SF_DIR, "--method", "dsir", "--output", out2])
    assert rc == 0
    sel = {
        r["doc_id"]
        for r in text_analysis.dsir_select(spark, SF_DIR).collect()
        if r["selected"]
    }
    assert {r["doc_id"] for r in spark.read.parquet(out2).collect()} == sel

    # invalid bucket -> descriptive exit 1
    rc = main(
        ["curate", "--sfDir", SF_DIR, "--keepBuckets", "head,bogus",
         "--output", str(tmp_path / "x")]
    )
    assert rc == 1
    assert "keepBuckets" in capsys.readouterr().err


def test_cli_curate_all_buckets_keeps_unscored_docs(spark, tmp_path):
    """--keepBuckets head,middle,tail means "keep everything": docs with
    no perplexity row (fewer than 2 words — unscorable) must survive with
    NULL score columns instead of being silently inner-joined away
    (ADVICE r10). A corpus with a 1-word doc exercises the gap."""
    docs = spark.createDataFrame(
        [(1, "single", "en", "src", 6),
         (2, "the quick brown fox jumps over the dog", "en", "src", 38),
         (3, "a slow green turtle crawls under a log", "en", "src", 38),
         (4, "the quick brown fox jumps over the fox", "en", "src", 38)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "corpus")
    docs.write.parquet(sf + "/documents.parquet")
    out = str(tmp_path / "kept")
    rc = main(["curate", "--sfDir", sf, "--keepBuckets", "head,middle,tail",
               "--output", out])
    assert rc == 0
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2, 3, 4}  # nothing dropped
    assert got[1]["ppl_bucket"] is None  # unscored, kept with NULL score
    assert all(got[d]["ppl_bucket"] is not None for d in (2, 3, 4))

    # a narrower subset is a real quality cut: unscored docs stay excluded
    out2 = str(tmp_path / "kept2")
    rc = main(["curate", "--sfDir", sf, "--keepBuckets", "head,middle",
               "--output", out2])
    assert rc == 0
    assert 1 not in {r["doc_id"] for r in spark.read.parquet(out2).collect()}


def test_dedup_containment_drops_smaller_side(spark, tmp_path):
    """--method containment: the smaller doc of each high-containment pair
    is dropped (quote/subset subsumption); containers survive."""
    import pyspark.sql.functions as F

    from symat_hbase_tools_spark.cli import main

    body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            (1, body + " kilo lima mike november oscar papa quebec", "en", "s", 80),
            (2, body, "en", "s", 60),  # contained in 1 -> dropped
            (3, "sierra tango uniform victor whiskey xray yankee zulu", "en", "s", 50),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "cont")
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "out")
    rc = main(["dedup", "--sfDir", sf_dir, "--method", "containment", "--output", out])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert kept == {1, 3}


def test_tokenize_cli_writes_consistent_tokens(spark, tmp_path):
    """tokenize: the written corpus's token totals must agree with the
    census's compression accounting (same learned table, same encode)."""
    from symat_hbase_tools_spark.cli import main
    from symat_hbase_tools_spark.operators import bpe

    out = str(tmp_path / "toks")
    rc = main(["tokenize", "--sfDir", SF_DIR, "--merges", "8", "--output", out])
    assert rc == 0
    back = spark.read.parquet(out)
    total = back.agg({"n_tokens": "sum"}).collect()[0][0]
    census = bpe.tokenize_census(spark, SF_DIR, n_merges=8)
    census_total = census.agg({"total_bpe_tokens": "sum"}).collect()[0][0]
    assert total == census_total
    # per-row consistency: n_tokens == len(tokens)
    import pyspark.sql.functions as F

    assert back.filter(F.col("n_tokens") != F.size("tokens")).count() == 0


def test_pack_cli_assignment_is_budget_consistent(spark, tmp_path):
    """pack: every document's start_offset div budget equals its seq_id
    and the tape is gapless (sum of n_tokens == max offset + last doc)."""
    from symat_hbase_tools_spark.cli import main

    out = str(tmp_path / "packed")
    rc = main(["pack", "--sfDir", SF_DIR, "--budget", "512", "--output", out])
    assert rc == 0
    import pyspark.sql.functions as F

    back = spark.read.parquet(out)
    bad = back.filter(F.expr("start_offset div 512") != F.col("seq_id")).count()
    assert bad == 0
    agg = back.agg(
        F.sum("n_tokens").alias("s"),
        F.max(F.col("start_offset") + F.col("n_tokens")).alias("m"),
    ).collect()[0]
    assert agg["s"] == agg["m"]


def test_cli_select_diverse(spark, tmp_path):
    """select-diverse writes the k-center selection; bad --k exits 1."""
    from symat_hbase_tools_spark.cli import main

    out = str(tmp_path / "div")
    rc = main(
        ["select-diverse", "--sfDir", SF_DIR, "--k", "4", "--output", out]
    )
    assert rc == 0
    got = spark.read.parquet(out).orderBy("rank").collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4]
    assert len({r["vec_id"] for r in got}) == 4
    assert main(["select-diverse", "--sfDir", SF_DIR, "--k", "0",
                 "--output", out]) == 1


def test_cli_trim_spans_writes_trimmed_corpus(spark, tmp_path, capsys):
    """trim-spans pipeline action: the output corpus keeps every doc (trim,
    not drop), text/n_chars stay consistent, counters reconcile with the
    operator, and a bad --minSpan exits 1."""
    out = str(tmp_path / "trimmed")
    rc = main(["trim-spans", "--sfDir", SF_DIR, "--output", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "DOCS_TOTAL=500" in printed and "TOKENS_REMOVED=" in printed

    got = spark.read.parquet(out)
    docs = load_table(spark, SF_DIR, "documents")
    assert got.count() == docs.count()
    assert set(got.columns) == set(docs.columns)
    # text/n_chars consistency after the rewrite
    assert got.filter(F.length("text") != F.col("n_chars")).count() == 0
    # trimmed text matches the operator's output doc by doc
    want = {
        r["doc_id"]: r["trimmed_text"]
        for r in dedup.trim_dup_spans(spark, SF_DIR).collect()
    }
    mism = [
        r["doc_id"]
        for r in got.select("doc_id", "text").collect()
        if r["text"] != want[r["doc_id"]]
    ]
    assert mism == []

    rc = main(["trim-spans", "--sfDir", SF_DIR, "--minSpan", "0", "--output", out])
    assert rc == 1


def test_cli_trim_spans_within_doc_flag(spark, tmp_path, capsys):
    """--withinDoc trims a span repeated only inside one document; the
    default leaves it (cross-document criterion)."""
    rep = " ".join(f"r{i}" for i in range(20))
    src = tmp_path / "corpus"
    spark.createDataFrame(
        [
            (1, rep + " " + " ".join(f"m{j}" for j in range(7)) + " " + rep,
             "en", "s", 1),
            (2, " ".join(f"x{j}" for j in range(25)), "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(src / "documents.parquet"))
    out = str(tmp_path / "t1")
    assert main(["trim-spans", "--sfDir", str(src), "--output", out]) == 0
    assert "TOKENS_REMOVED=0" in capsys.readouterr().out
    out2 = str(tmp_path / "t2")
    assert (
        main(
            ["trim-spans", "--sfDir", str(src), "--withinDoc", "--output", out2]
        )
        == 0
    )
    printed = capsys.readouterr().out
    assert "DOCS_TRIMMED=1" in printed and "TOKENS_REMOVED=40" in printed
    kept = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out2).collect()
    }
    assert kept[1] == " ".join(f"m{j}" for j in range(7))


def test_cli_trim_spans_noop_corpus(spark, tmp_path, capsys):
    """A corpus with no cross-document spans: every doc passes through
    verbatim, DOCS_TRIMMED=0 TOKENS_REMOVED=0."""
    src = tmp_path / "corpus"
    spark.createDataFrame(
        [(i, " ".join(f"u{i}_{j}" for j in range(30)), "en", "s", 100)
         for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(src / "documents.parquet"))
    out = str(tmp_path / "trimmed")
    rc = main(["trim-spans", "--sfDir", str(src), "--output", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "DOCS_TRIMMED=0" in printed and "TOKENS_REMOVED=0" in printed
    assert spark.read.parquet(out).count() == 4


def test_cli_span_index_build_and_trim(spark, tmp_path, capsys):
    """span-index end to end: build over a corpus, trim a NEW batch
    against it (the corpus never rescanned); the planted shared fragment
    is removed from the batch doc, the unique doc passes verbatim;
    TOKENS_REMOVED sums actual coverage; trim without --output exits 1."""
    frag = " ".join(f"s{i}" for i in range(25))
    corpus = tmp_path / "corpus"
    spark.createDataFrame(
        [
            (1, " ".join(f"a{j}" for j in range(8)) + " " + frag, "en", "s", 1),
            (2, " ".join(f"b{j}" for j in range(30)), "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(corpus / "documents.parquet"))
    idx = str(tmp_path / "idx")
    assert main(["span-index", "--action", "build", "--sfDir", str(corpus),
                 "--indexDir", idx]) == 0
    printed = capsys.readouterr().out
    assert "SPAN_INDEX_BUILT" in printed and "k=20" in printed

    batch = tmp_path / "batch"
    pre = " ".join(f"n{j}" for j in range(5))
    spark.createDataFrame(
        [
            (100, pre + " " + frag, "en", "s", 1),
            (101, " ".join(f"u{j}" for j in range(40)), "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(batch / "documents.parquet"))
    out = str(tmp_path / "trimmed")
    assert main(["span-index", "--action", "trim", "--sfDir", str(batch),
                 "--indexDir", idx, "--assumeNew", "--output", out]) == 0
    printed = capsys.readouterr().out
    assert "DOCS_TOTAL=2" in printed and "DOCS_TRIMMED=1" in printed
    assert "TOKENS_REMOVED=25" in printed
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got[100] == pre
    assert got[101] == " ".join(f"u{j}" for j in range(40))

    assert main(["span-index", "--action", "trim", "--sfDir", str(batch),
                 "--indexDir", idx]) == 1
    assert main(["span-index", "--action", "build", "--sfDir", str(corpus),
                 "--indexDir", idx, "--minSpan", "0"]) == 1


def test_cli_span_index_append(spark, tmp_path, capsys):
    """span-index --action append: a nightly batch merges into the live
    index in place; a later batch sharing the APPENDED doc's fragment is
    trimmed (proof the merge is live), and counters report the window
    delta."""
    corpus, batch = tmp_path / "corpus", tmp_path / "batch"
    frag = " ".join(f"q{i}" for i in range(25))
    spark.createDataFrame(
        [(1, " ".join(f"a{j}" for j in range(30)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(corpus / "documents.parquet"))
    spark.createDataFrame(
        [(50, " ".join(f"m{j}" for j in range(4)) + " " + frag, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(batch / "documents.parquet"))

    idx = str(tmp_path / "idx")
    assert main(["span-index", "--action", "build", "--sfDir", str(corpus),
                 "--indexDir", idx]) == 0
    capsys.readouterr()
    assert main(["span-index", "--action", "append", "--sfDir", str(batch),
                 "--indexDir", idx]) == 0
    printed = capsys.readouterr().out
    assert "SPAN_INDEX_APPENDED" in printed and "k=20" in printed
    assert "added=10" in printed  # 29-20+1 new windows from the batch doc

    probe, out = tmp_path / "probe", str(tmp_path / "trimmed")
    spark.createDataFrame(
        [(200, frag + " " + " ".join(f"t{j}" for j in range(6)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(probe / "documents.parquet"))
    assert main(["span-index", "--action", "trim", "--sfDir", str(probe),
                 "--indexDir", idx, "--assumeNew", "--output", out]) == 0
    printed = capsys.readouterr().out
    assert "DOCS_TRIMMED=1" in printed and "TOKENS_REMOVED=25" in printed
