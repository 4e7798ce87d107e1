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


#: reciprocal-rank-fusion constant (Cormack et al. 2009 — 60 is the
#: canonical value; dampens the head so one list can't dominate)
RRF_K = 60

#: fixed hybrid-search query: the corpus vector whose embedding anchors
#: the semantic list (its document is NOT excluded from the lexical list
#: — BM25 knows nothing of the vector identity, mirroring real hybrid
#: retrieval where the two indexes are independent)
HYBRID_QUERY_VEC_ID = 7


def hybrid_search_rrf(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = HYBRID_QUERY_VEC_ID,
    query_terms: tuple[str, ...] = ("hash", "join", "scan"),
    n_list: int = 20,
    k: int = 10,
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion — the standard RAG
    serving composition: a LEXICAL candidate list (BM25 over the inverted-
    index shape) and a SEMANTIC list (cosine against a query embedding),
    fused by rrf = sum over lists of 1/(RRF_K + rank). Rank fusion beats
    score fusion because BM25 scores and cosines live on incomparable
    scales; RRF needs only the orders.

    Determinism: both lists rank on round-6 scores with doc_id tiebreaks
    (the bm25_search / knn discipline), so the fused order is
    hash-comparable cross-engine. Output: top-k (doc_id, lex_rank,
    sem_rank, rrf_score) — NULL rank = absent from that list, the honest
    single-list case RRF handles natively.

    Scale shape: the lexical side walks only the query terms' postings
    (see bm25_search); the semantic side is one narrow map over the
    embeddings with the 1-row query vector broadcast (a 64-dim fold per
    row — JVM-side zip_with/aggregate, no Python), then a top-n_list
    TakeOrdered. The fusion join touches 2*n_list rows. Nothing here is
    corpus-quadratic; at 100 TB the semantic list would come from the
    persisted IVF-PQ index instead (same fused shape downstream)."""
    from pyspark.sql import Window

    from symat_hbase_tools_spark.operators.similarity import as_double
    from symat_hbase_tools_spark.operators.text_analysis import bm25_search

    lex = bm25_search(spark, sf_dir, query_terms=query_terms, k=n_list).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("lex_rank"),
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    nrm = (
        "sqrt(aggregate(zip_with({c}, {c}, (x, y) -> x * y), 0D, (a, v) -> a + v))"
    )
    # q-norm hoisted into the 1-row broadcast side (round 16, guide §4.1
    # spirit: the aggregate/zip_with HOFs run interpreted, so per-row array
    # passes are the cost unit): computing sqrt(q.q) per candidate row spent
    # one of three interpreted 64-element folds on a constant. Same double
    # (identical fold over the identical array), so sim is bit-unchanged.
    # Interleaved A/B at the 10x probe (with the bm25 doclen pin):
    # 0.387/0.441 -> 0.315/0.365 s min/med.
    q = emb.filter(F.col("vec_id") == int(query_vec_id)).select(
        F.col("emb").alias("q"),
        F.expr(nrm.format(c="emb")).alias("qn"),
    )
    dot = "aggregate(zip_with(emb, q, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    sim = F.round(
        F.expr(dot) / (F.expr(nrm.format(c="emb")) * F.col("qn")),
        6,
    )
    sem = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != int(query_vec_id))
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), "doc_id")
        .limit(n_list)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("sim"), "doc_id"))
            .alias("sem_rank"),
        )
    )

    kk = float(RRF_K)
    fused = lex.join(sem, "doc_id", "full").select(
        "doc_id",
        F.col("lex_rank").cast("long").alias("lex_rank"),
        F.col("sem_rank").cast("long").alias("sem_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(kk) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(kk) + F.col("sem_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(k)
