"""Composed training-data pipeline: the operators chained end-to-end.

A real 100 TB corpus pass is not one operator — it is
quality-filter -> dedup -> similarity over the survivors. This module wires
the engine's own operators into that pipeline as ONE lazy plan (Catalyst
optimizes across the stage boundaries: the quality filter pushes into both
the dedup and the search inputs), which is the argument for building every
stage on DataFrames instead of materializing between tools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.functions.text import token_count
from symat_hbase_tools_spark.operators.similarity import brute_topk
from symat_hbase_tools_spark.sources.tables import load_table


def curated_similarity_search(
    spark: SparkSession, sf_dir: str, min_tokens: int = 40, k: int = 3
) -> DataFrame:
    """Quality-filter documents, then exact top-k similarity among survivors.

    doc_id and vec_id are aligned in the corpus, so the filtered doc set
    semi-joins the embeddings (broadcast: the filter output is small relative
    to the vector table) and the brute-force search runs over survivors only.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(token_count(F.col("text")) >= min_tokens).select(
        F.col("doc_id").alias("vec_id")
    )
    emb = load_table(spark, sf_dir, "embeddings").join(
        F.broadcast(kept), "vec_id", "left_semi"
    ).select("vec_id", "embedding")
    return brute_topk(spark, emb, k=k)
