"""Distributed BPE merge learning (Sennrich et al. 2016, word-histogram
formulation) — the tokenizer-training step of a pre-training pipeline.

The scalable shape: the only corpus-sized work is ONE shuffle building the
word-frequency histogram (groupBy word — at 100 TB this is the standard
wordcount). The merge loop then iterates over the VOCAB-sized histogram
(orders of magnitude smaller than the corpus, the same reduction
SentencePiece/HF trainers rely on): each round counts weighted adjacent
symbol pairs (codegen arrays_zip explode + partial agg), picks the argmax
deterministically, and applies the merge with a vectorized Arrow kernel
(greedy left-to-right, standard BPE application). localCheckpoint per round
caps the lineage so round N doesn't replay rounds 0..N-1.

Iterative — not SQL-expressible, so the query entry is rows-only; a pure-
python reference implementation parity-tests the whole loop in
tests/test_text_analysis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.functions.text import tokens
from symat_hbase_tools_spark.sources.tables import load_table


def _adjacent_pairs(arr: F.Column) -> F.Column:
    """array<struct<w1,w2>> of adjacent element pairs (codegen arrays_zip of
    the array against its own tail; empty for arrays shorter than 2)."""
    n = F.size(arr)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(arr, 1, n - 1).alias("w1"),
            F.slice(arr, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word-frequency table — the one corpus-sized aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def learn_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the documents corpus.

    Output: (merge_rank, left, right, pair_count) — the ranked merge table a
    tokenizer trainer exports. Deterministic: argmax ties break on
    (left, right) lexicographically.
    """
    vocab = word_histogram(spark, sf_dir).withColumn(
        "syms", F.split("word", "")
    ).select("freq", "syms")
    vocab = vocab.localCheckpoint(eager=True)

    merges = []
    for rank in range(n_merges):
        top = (
            vocab.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.w1").alias("left"), F.col("p.w2").alias("right"))
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rank, a, b, int(cnt)))

        def apply_merge(batches, a=a, b=b):
            for pdf in batches:
                def m(syms):
                    out, i, n = [], 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    return out

                pdf["syms"] = pdf["syms"].map(m)
                yield pdf

        vocab = vocab.mapInPandas(
            apply_merge, schema="freq long, syms array<string>"
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    ).orderBy("merge_rank")


def apply_merges(word: str, merge_list) -> list:
    """Greedy BPE encode of one word: merges applied in learned order —
    the standard encode; shared by the census (counts) and
    ``tokenize_corpus`` (emits the symbols)."""
    syms = list(word)
    for a, b in merge_list:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def tokenize_corpus(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Tokenized corpus: (doc_id, n_tokens, tokens array<string>) under the
    learned merge table — the WRITE form of ``tokenize_census`` (the
    pipeline step that materializes training tokens; the census only
    reports compression). Same greedy encode, same two corpus passes
    (learn + encode), same per-batch word cache; the merge table ships as
    a closure constant into one Arrow-batched kernel.
    """
    merge_rows = learn_merges(spark, sf_dir, n_merges=n_merges).collect()
    merge_list = [(r["left"], r["right"]) for r in merge_rows]
    docs = load_table(spark, sf_dir, "documents")

    def encode(batches):
        for pdf in batches:
            cache: dict[str, list] = {}

            def doc_tokens(text):
                out = []
                for w in text.split():
                    hit = cache.get(w)
                    if hit is None:
                        hit = cache[w] = apply_merges(w, merge_list)
                    out.extend(hit)
                return out

            toks = pdf["text"].map(doc_tokens)
            yield __import__("pandas").DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": toks.map(len),
                    "tokens": toks,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        encode, schema="doc_id long, n_tokens long, tokens array<string>"
    )


def tokenize_census(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Apply the learned merge table to the whole corpus and report the
    compression it buys: per (lang, source), characters in, BPE tokens out,
    and the chars-per-token ratio — the fertility number a tokenizer
    evaluation reports.

    Scale shape: the merge table is tiny (n_merges rows) and ships as a
    plain closure constant into ONE Arrow-batched kernel that tokenizes
    every document (greedy merge application per word, merges in learned
    order — the standard BPE encode); the census is then a partial-agg
    groupBy on (lang, source). The corpus scans once; learning the table
    (learn_merges) scans once more — two passes total, both map-heavy.
    """
    merge_rows = learn_merges(spark, sf_dir, n_merges=n_merges).collect()
    merge_list = [(r["left"], r["right"]) for r in merge_rows]

    docs = load_table(spark, sf_dir, "documents")

    def encode(batches):
        def word_tokens(word):
            return len(apply_merges(word, merge_list))

        for pdf in batches:
            cache: dict[str, int] = {}

            def doc_tokens(text):
                total = 0
                for w in text.split():
                    hit = cache.get(w)
                    if hit is None:
                        hit = cache[w] = word_tokens(w)
                    total += hit
                return total

            pdf["n_bpe_tokens"] = pdf["text"].map(doc_tokens)
            yield pdf[["lang", "source", "n_chars", "n_bpe_tokens"]]

    per_doc = docs.select("lang", "source", "n_chars", "text").mapInPandas(
        encode, schema="lang string, source string, n_chars long, n_bpe_tokens long"
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        (
            F.sum("n_chars").cast("double") / F.sum("n_bpe_tokens")
        ).alias("chars_per_token"),
    )


def learn_check(spark: SparkSession, sf_dir: str, n_merges: int = 8) -> DataFrame:
    """Oracle-paired verification of ``learn_merges`` (the tolerance-oracle
    pattern of pca_check / kmeans_check): the parts SQL can state exactly,
    it states — the FIRST merge is, by definition, the argmax weighted
    adjacent character pair of the corpus word histogram, which DuckDB can
    compute independently (same (count desc, left, right) tie-break). The
    iterative tail is covered by structural invariants the engine asserts
    as booleans:

    * n_merges_ok — at most ``n_merges`` merges were learned, and at
      least one was learned exactly when the corpus has a mergeable pair
      (some word of length >= 2). A short corpus that exhausts its
      learnable merges early DEGRADES this check instead of failing it —
      the round-7 form hardcoded the requested count on the oracle side,
      which falsely failed any corpus with fewer than ``n_merges``
      learnable merges (and emitted zero oracle rows on an empty corpus
      against the engine's always-one row);
    * ranks_ok — merge_rank values are exactly 0..n-1;
    * counts_positive — every merge's pair_count > 0;
    * parts_consistent — every multi-character merge operand equals the
      concatenation produced by an EARLIER merge (the defining BPE
      vocabulary-growth invariant: symbols only exist once learned).

    One row out; the full merge loop also has a pure-python reference
    parity test (tests/test_text_analysis.py).
    """
    rows = sorted(
        learn_merges(spark, sf_dir, n_merges=n_merges).collect(),
        key=lambda r: r["merge_rank"],
    )
    # independent of the merge loop: does the corpus contain ANY
    # mergeable adjacent pair? (limit-1 probe, stops at the first hit)
    docs = load_table(spark, sf_dir, "documents")
    has_pair = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .limit(1)
        .count()
        > 0
    )
    # >=1 merge is expected iff the corpus has a pair AND at least one
    # merge was requested — n_merges=0 on a pair-bearing corpus is a
    # caller choice, not an engine failure
    n_merges_ok = (
        len(rows) <= n_merges
        and (len(rows) >= 1) == (has_pair and n_merges > 0)
    )
    ranks_ok = [r["merge_rank"] for r in rows] == list(range(len(rows)))
    counts_positive = all(r["pair_count"] > 0 for r in rows)
    produced: set[str] = set()
    parts_consistent = True
    for r in rows:
        for part in (r["left"], r["right"]):
            if len(part) > 1 and part not in produced:
                parts_consistent = False
        produced.add(r["left"] + r["right"])
    first = rows[0] if rows else None
    return spark.createDataFrame(
        [
            (
                first["left"] if first else None,
                first["right"] if first else None,
                int(first["pair_count"]) if first else 0,
                bool(n_merges_ok),
                bool(ranks_ok),
                bool(counts_positive),
                bool(parts_consistent),
            )
        ],
        "first_left string, first_right string, first_count long, "
        "n_merges_ok boolean, ranks_ok boolean, counts_positive boolean, "
        "parts_consistent boolean",
    )


def tokenize_check(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Oracle-paired verification of ``tokenize_census``: per (lang,
    source) group the SQL-exact facts (n_docs, total_chars) plus the BPE
    sandwich bound as a boolean — total BPE tokens lies between the word
    count (every word is >= 1 token) and the non-space character count
    (every token is >= 1 character). The raw census stays registered for
    pipelines; this is the driver-verified form.
    """
    census = tokenize_census(spark, sf_dir, n_merges=n_merges).select(
        "lang", "source", "n_docs", "total_chars", "total_bpe_tokens"
    )
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang", "source").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("n_words"),
        F.sum(
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("long")
        ).alias("nonspace_chars"),
    )
    return (
        census.join(bounds, ["lang", "source"])
        .select(
            "lang",
            "source",
            "n_docs",
            "total_chars",
            (
                (F.col("total_bpe_tokens") >= F.col("n_words"))
                & (F.col("total_bpe_tokens") <= F.col("nonspace_chars"))
            ).alias("tokens_within_bounds"),
        )
    )
