"""Bulk import/export of cells tables across storage formats.

The reference's I/O surface is HBase RPC + HDFS TSV (README.md:69-81); the
engine generalizes it: a cells DataFrame round-trips through any of Spark's
columnar/row formats. Binary columns need care in text formats — CSV/JSON
get the HBase-shell escaped rendering (functions/bytes_binary), so exported
files are also human-readable the way HBase shell prints keys.

Format guidance at scale (docstrings are the contract, tests enforce
round-trips):
  * parquet — the default: columnar, predicate pushdown, column pruning.
  * orc     — same class; use when the lakehouse standard is ORC.
  * json/csv — interchange only: no pushdown, full scans, escaped binary.
Writers accept partition columns — e.g. partition exported cells by family
for family-pruned reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.functions.bytes_binary import (
    to_bytes_binary_col,
    to_string_binary_col,
)

_BINARY_COLS = ("row", "qualifier", "value")


def _escape_binary(cells: DataFrame) -> DataFrame:
    out = cells
    for c in _BINARY_COLS:
        out = out.withColumn(c, to_string_binary_col(F.col(c)))
    return out


def _unescape_binary(df: DataFrame) -> DataFrame:
    out = df
    for c in _BINARY_COLS:
        out = out.withColumn(c, to_bytes_binary_col(F.col(c)))
    return out.select("row", "family", "qualifier", "ts", "type", "value")


def write_cells(
    cells: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None
) -> None:
    writer = cells.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt in ("parquet", "orc"):
        writer.format(fmt).save(path)
    elif fmt == "json":
        _escape_binary(cells).write.mode("overwrite").json(path)
    elif fmt == "csv":
        _escape_binary(cells).write.mode("overwrite").option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def read_cells(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt in ("parquet", "orc"):
        return spark.read.format(fmt).load(path)
    schema = "row string, family string, qualifier string, ts long, type string, value string"
    if fmt == "json":
        return _unescape_binary(spark.read.schema(schema).json(path))
    if fmt == "csv":
        return _unescape_binary(
            spark.read.schema(schema).option("header", True).csv(path)
        )
    raise ValueError(f"unsupported format: {fmt}")


# -- documents-table JSONL interchange ---------------------------------------
#
# JSONL (one JSON object per line) is the de-facto interchange format of LLM
# data pipelines (Common Crawl derivatives, RefinedWeb/Dolma releases, …).
# Reading untrusted JSONL at corpus scale means malformed lines ARE expected;
# Spark's PERMISSIVE mode quarantines them into a corrupt-record column
# instead of failing the job, so one bad shard can't kill a 100 TB ingest.
# JSON text splits by line, so a single huge file still fans out across the
# cluster; there is no pushdown/pruning — convert to parquet after ingest.

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Export a documents table as JSONL (gzip splits poorly; leave plain)."""
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) documents from JSONL.

    good: rows matching DOCUMENTS_SCHEMA. quarantined: the raw text of every
    malformed line (broken JSON, or a doc_id that fails to parse), kept for
    forensics — the standard ingest contract for untrusted corpus shards.

    Implementation: text source + ``from_json`` rather than the JSON
    source's _corrupt_record column — Spark disallows plans that reference
    ONLY the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the
    parse is cached, and caching inside a reader is wrong at corpus scale.
    The text source splits by line exactly like the JSON source, and
    from_json yields NULL for unparseable lines — one narrow pass, both
    outputs prune from the same scan.
    """
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        "value", F.from_json(F.col("value"), DOCUMENTS_SCHEMA).alias("j")
    )
    is_good = F.col("j").isNotNull() & F.col("j.doc_id").isNotNull()
    good = parsed.filter(is_good).select("j.*")
    bad = parsed.filter(~is_good).select(F.col("value").alias("raw_line"))
    return good, bad


def write_documents_orc(docs: DataFrame, path: str) -> None:
    """Export a documents table as ORC (Spark-native columnar interchange —
    zlib by default, splittable, predicate-pushdown capable like parquet)."""
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).orc(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Documents from ORC with the canonical schema enforced (schema drift in
    interchange files surfaces as an analysis error, not silent nulls)."""
    return spark.read.schema(DOCUMENTS_SCHEMA).orc(path)


def write_documents_csv(docs: DataFrame, path: str) -> None:
    """Export a documents table as headered CSV: fields quoted, embedded
    quotes doubled (RFC 4180), newlines kept verbatim inside quotes."""
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).option("header", True).option("escape", '"').csv(path)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Documents from CSV with the canonical schema enforced and RFC 4180
    quote-escape parsing matching the writer.

    ``multiLine`` is required for quoted embedded newlines — and it makes
    each CSV FILE one parse unit (no intra-file splits), which is why CSV
    is interchange-only here (module header): at corpus scale the writer's
    many part-files are the parallelism unit, parquet/ORC the real format.
    """
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
