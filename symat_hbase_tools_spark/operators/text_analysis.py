"""Text-analysis operators over the documents table.

Language-ID, quality scoring, token statistics, and document fingerprinting —
the per-document scans a training-data pipeline runs over every corpus.
All pure built-in expressions (whole-stage codegen), no UDFs; every operator
has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.functions.text import (
    STOPWORDS,
    bpe_ish_token_count,
    rolling_fingerprint,
    token_count,
    tokens,
)
from symat_hbase_tools_spark.sources.tables import load_table


def lang_id_expr(text: F.Column) -> F.Column:
    """Rule-based language ID: Unicode-script presence, then stopword cues.

    On real corpora the script rules dominate; this synthetic corpus is
    ASCII word-salad, so everything lands in the final en/unknown rule —
    the operator's value here is exercising the classification plumbing
    end-to-end with an oracle twin.
    """
    return (
        # kana before CJK: Japanese text contains kanji, so the kana rule
        # must win first
        F.when(text.rlike("[぀-ヿ]"), "ja")
        .when(text.rlike("[一-鿿]"), "zh")
        .when(text.rlike("[Ѐ-ӿ]"), "ru")
        .when(text.rlike("[؀-ۿ]"), "ar")
        .when(text.rlike("(^| )(der|die|das|und) "), "de")
        .when(text.rlike("(^| )(el|la|los|las) "), "es")
        .when(text.rlike("(^| )(the|a|of|and) "), "en")
        .otherwise("unknown")
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted language vs. the corpus label — confusion counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id_expr(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + a composite score.

    All ratios are exact-integer divisions in double — bit-identical across
    engines; no rounding needed.
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    toks = tokens(text)
    n_tokens = token_count(text)
    n_chars = F.length(text).cast("bigint")
    # characters that are neither lowercase letters nor spaces = "punct-ish"
    non_word = n_chars - F.length(F.regexp_replace(text, "[^a-z ]", "")).cast("bigint")
    word_chars = F.length(F.translate(text, " ", "")).cast("bigint")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("bigint")
    avg_word_len = F.when(n_tokens > 0, word_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, non_word / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + (1 - punct_ratio) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics per (lang, source) — the pre-training census."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text)).alias("total_tokens"),
        F.sum(bpe_ish_token_count(text)).alias("total_bpe_tokens"),
        F.sum(F.col("n_chars")).alias("total_chars"),
        (F.sum(token_count(text)).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rolling-hash fingerprint per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp"))
