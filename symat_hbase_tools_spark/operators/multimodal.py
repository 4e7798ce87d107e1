"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video at 100 TB live as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched pandas on
``mapInPandas`` so each task streams batches without materializing a
partition. The decode libraries (PIL/ffmpeg/...) are NOT in this container —
the decode step is stubbed behind ``use_real_decoder`` (raises
NotImplementedError) with a deterministic fake so the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested end-to-end.

The synthetic payload is the UTF-8 encoding of documents.text, which makes
the fake features (byte length, byte-sum checksum) oracle-checkable in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.sources.tables import load_table

CHECKSUM_MOD = 997

FEATURE_SCHEMA = "doc_id bigint, byte_len bigint, checksum bigint, width int, height int"


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal records: (doc_id, payload binary, meta struct)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("txt").alias("format"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            (F.col("doc_id") % 10 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real image/audio decode."""
    return len(payload), sum(payload) % CHECKSUM_MOD


def extract_features(records: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Decode payloads and emit per-record features via mapInPandas.

    Arrow-batched: each task pulls pandas batches, the "decoder" handle is
    initialized once per partition (the per-partition-connection pattern of
    CorruptRowsMR.java:104-123), and output batches stream back.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_decoder:
            raise NotImplementedError(
                "real decoders (PIL/torchaudio/ffmpeg) are not available in "
                "this container; deterministic fake decode is the test path"
            )
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": feats.map(lambda t: t[0]),
                    "checksum": feats.map(lambda t: t[1]),
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                }
            )

    return records.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(records: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: explode meta.n_frames into frame indices (JVM-side)."""
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    return records.select(
        "doc_id", F.explode(idx).alias("frame_idx"), F.col("meta.n_frames").alias("n_frames")
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queryable end-to-end pipeline: attach payload -> decode -> features."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


def multimodal_frame_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-frame counts per source (exercises the explode path)."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_payload(docs))
    return (
        frames.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )
