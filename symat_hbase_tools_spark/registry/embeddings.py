"""Embedding/ANN surface (kNN, LSH/IVF/PQ recall checks,
PCA, k-means, diversity selection).

Registration fragment: QUERIES (Spark callables) + ORACLE_SQL (DuckDB)
assembled by registry/__init__.py; split out of entry.py in round 13.
"""

from __future__ import annotations

from symat_hbase_tools_spark.registry.wrappers import (
    ann_ivf_drift_check,
    ann_ivf_indexed_recall_check,
    ann_ivfpq_indexed_recall_check,
    kcenter_check,
    kcenter_select,
    pca,
    similarity,
)

QUERIES = {
    # LLM-pipeline surface: similarity search (the ANN operators are
    # represented by their oracle-paired recall checks — which EXECUTE the
    # ANN paths and compare against the exact oracle; the raw top-k
    # variants sit at 51+ as rows-only)
    "knn_cosine_topk": similarity.knn_cosine_topk,
    "ann_lsh_recall_check": similarity.ann_lsh_recall_check,
    "ann_ivf_recall_check": similarity.ann_ivf_recall_check,
    "ann_ivf_indexed_recall_check": ann_ivf_indexed_recall_check,
    # round-12: the persisted add-pq/query-pq serving path's recall row
    "ann_ivfpq_indexed_recall_check": ann_ivfpq_indexed_recall_check,
    # round-15: drift census + rebalance maintenance lifecycle (build ->
    # drifting append -> census flags -> re-fit/re-encode -> census clears,
    # quantization error drops, planted clones still retrievable)
    "ann_ivf_drift_check": ann_ivf_drift_check,
    "embedding_near_dup": lambda spark, sf: similarity.embedding_near_dup_pairs(
        spark, sf, threshold=0.4
    ),
    # round-8: ANN-backed hard negatives (the >1M scale path; rows-only —
    # plane-seed buckets) with its oracle-paired recall check
    "embedding_hard_negatives_ann": similarity.embedding_hard_negatives_ann,
    # round-12: kNN-probe accuracy (the non-parametric rep-quality eval)
    "embedding_knn_label_vote": similarity.knn_label_vote,
    # embedding maintenance (round 3; executes the PCA path end-to-end)
    "embedding_pca_check": pca.pca_check,
    "embedding_hard_negatives": similarity.embedding_hard_negatives,
    # embedding-table maintenance (round 2)
    "embedding_quantize_int8": similarity.embedding_quantize_int8,
    "embedding_norm_histogram": similarity.embedding_norm_histogram,
    "embedding_near_dup_lsh": similarity.embedding_near_dup_lsh,
    "embedding_near_dup_lsh_check": similarity.embedding_near_dup_lsh_check,
    "embedding_semantic_dedup": similarity.embedding_semantic_dedup,
    "embedding_semantic_dedup_check": similarity.embedding_semantic_dedup_check,
    "ann_lsh_topk": similarity.ann_lsh_topk,
    "ann_ivf_topk": similarity.ann_ivf_topk,
    "embedding_label_centroids": similarity.label_centroids,
    # round-10: embedding-space cleaning — per-label prototype-distance
    # outlier flags, exact-integer stats end-to-end
    "embedding_outlier_flags": similarity.embedding_outlier_flags,
    # round-10: matryoshka truncation census — prefix-dim energy
    # retention, exact-integer pipeline
    "embedding_matryoshka_census": similarity.matryoshka_census,
    "embedding_pca_project": pca.pca_project,
    # round-12: greedy k-center (farthest-point) diversity selection —
    # rows-only (iterative greedy, not SQL-expressible); the invariants
    # live in the oracle-paired check twin
    "embedding_kcenter_select": kcenter_select,
    "embedding_kcenter_check": kcenter_check,
    "embedding_kmeans_fit": similarity.embedding_kmeans_fit,
    "embedding_kmeans_check": similarity.embedding_kmeans_check,
    # round-11: product quantization (the PQ half of IVF-PQ serving) —
    # rows-only census + oracle-paired invariant twin
    "embedding_pq_fit": lambda spark, sf: similarity.embedding_pq_fit(spark, sf),
    "ann_pq_topk": lambda spark, sf: similarity.ann_pq_topk(spark, sf),
    "ann_pq_recall_check": similarity.ann_pq_recall_check,
    # round-13: binary (sign-bit) quantization tier — census + hamming
    # scan with exact re-rank + its recall floor
    "embedding_binary_quantize": similarity.embedding_binary_quantize,
    "ann_bq_topk": similarity.ann_bq_topk,
    "ann_bq_recall_check": similarity.ann_bq_recall_check,
    # round-11: the COMPOSED serving architecture — IVF cell pruning +
    # compressed-domain ADC scan + exact refine
    "ann_ivfpq_topk": lambda spark, sf: similarity.ann_ivfpq_topk(spark, sf),
    "ann_ivfpq_recall_check": similarity.ann_ivfpq_recall_check,
    # round-14: the 1-bit in-cell rung — IVF cell pruning + packed
    # sign-bit scan (16 B/member payload) + exact refine
    "ann_ivfbq_topk": lambda spark, sf: similarity.ann_ivfbq_topk(spark, sf),
    "ann_ivfbq_recall_check": similarity.ann_ivfbq_recall_check,
    "embedding_pq_check": lambda spark, sf: similarity.embedding_pq_check(
        spark, sf
    ),
}

ORACLE_SQL = {
    # exact integer micro-unit accumulation (see similarity.label_centroids):
    # both engines quantize each float32 component identically, sum exactly,
    # divide once — no order-dependent double summation to diverge on.
    "embedding_label_centroids": """
        WITH q AS (SELECT label,
                          generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS q
                   FROM embeddings)
        SELECT label, dim,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / (count(*) * 1e6) AS centroid
        FROM q GROUP BY label, dim
    """,
    # outlier flags: every aggregate input is an integer (micros
    # quantization -> exact bigint distance sums -> integer power sums);
    # the float expressions (prototype division, sqrt, threshold) are
    # single exact-rounded operations over identical bigints, so the
    # is_outlier boundary is bit-stable cross-engine. Expression shapes
    # mirror the Spark side exactly (same cast/operation order).
    "embedding_outlier_flags": """
        WITH q AS (SELECT vec_id, label,
                          generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                               AS BIGINT) AS q
                   FROM embeddings WHERE label IS NOT NULL),
        cent AS (SELECT label, dim,
                        CAST(round(CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
                                   / COUNT(*)) AS BIGINT) AS c_q
                 FROM q GROUP BY label, dim),
        pv AS (SELECT vec_id, label,
                      CAST(round(sqrt(CAST(CAST(SUM((q - c_q) * (q - c_q))
                                                AS BIGINT) AS DOUBLE)))
                           AS BIGINT) AS dist_micros
               FROM q JOIN cent USING (label, dim)
               GROUP BY vec_id, label),
        st AS (SELECT label, COUNT(*) AS n,
                      CAST(SUM(dist_micros) AS BIGINT) AS sd,
                      CAST(SUM(dist_micros * dist_micros) AS BIGINT) AS sdd
               FROM pv GROUP BY label),
        thr AS (SELECT label,
                       CAST(sd AS DOUBLE) / n
                       + 2.0 * sqrt(greatest(
                             (CAST(sdd AS DOUBLE)
                              - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / n)
                             / n, 0.0)) AS thr
                FROM st)
        SELECT vec_id, label, dist_micros,
               CAST(dist_micros AS DOUBLE) > thr AS is_outlier
        FROM pv JOIN thr USING (label)
    """,
    # matryoshka census: exact bigint energy sums; retention and the mean
    # are divisions/rounds of identical bigints (expression shapes mirror
    # the Spark side exactly, incl. the /full*1e6 association order)
    "embedding_matryoshka_census": """
        WITH q AS (SELECT vec_id,
                          generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                               AS BIGINT) AS q
                   FROM embeddings),
        pv AS (SELECT vec_id,
                      CAST(SUM(CASE WHEN dim < 8 THEN q * q ELSE 0 END)
                           AS BIGINT) AS e8,
                      CAST(SUM(CASE WHEN dim < 16 THEN q * q ELSE 0 END)
                           AS BIGINT) AS e16,
                      CAST(SUM(CASE WHEN dim < 32 THEN q * q ELSE 0 END)
                           AS BIGINT) AS e32,
                      CAST(SUM(CASE WHEN dim < 64 THEN q * q ELSE 0 END)
                           AS BIGINT) AS e64
               FROM q GROUP BY vec_id),
        r AS (SELECT vec_id, k,
                     CAST(round(CAST(e AS DOUBLE) / e64 * 1e6) AS BIGINT)
                         AS ret
              FROM (SELECT * FROM pv WHERE e64 > 0)
              CROSS JOIN LATERAL (VALUES (8, e8), (16, e16), (32, e32),
                                         (64, e64)) AS t(k, e))
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(CAST(SUM(ret) AS BIGINT) AS DOUBLE) / COUNT(*) / 1e6
                   AS mean_retention,
               CAST(MIN(ret) AS BIGINT) AS min_retention_micros,
               CAST(MAX(ret) AS BIGINT) AS max_retention_micros,
               CAST(COUNT(*) FILTER (WHERE ret >= 900000) AS BIGINT)
                   AS n_ge_90pct
        FROM r GROUP BY k
    """,
    "knn_cosine_topk": """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) emb FROM embeddings)
        SELECT query_id, neighbor_id, sim FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.emb, c.emb), 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id
                   ) AS rk
            FROM e q JOIN e c ON q.vec_id <> c.vec_id
        ) WHERE rk <= 5
    """,
    "embedding_near_dup": """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) emb FROM embeddings)
        SELECT a.vec_id AS d1, b.vec_id AS d2,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.4
    """,
    # hard negatives: the knn oracle shape with the positive mask in the
    # join condition (q.label <> c.label also drops NULL labels on both
    # sides, matching the engine's isNotNull filter)
    "embedding_hard_negatives": """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) emb
                   FROM embeddings WHERE label IS NOT NULL)
        SELECT query_id, negative_id, sim FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS negative_id,
                   round(list_cosine_similarity(q.emb, c.emb), 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id
                   ) AS rk
            FROM e q JOIN e c ON q.label <> c.label
        ) WHERE rk <= 5
    """,
    # ANN hard negatives: below ANN_BRUTE_CROSSOVER (1M vectors — every
    # test scale) auto_route runs the EXACT broadcast-BLAS form, so the
    # exact oracle applies verbatim; the LSH plan itself is certified by
    # hard_negatives_ann_recall_check (auto_route=False). Quadratic SQL:
    # keep in SWEEP_SKIP_ORACLES at sf1+ alongside embedding_hard_negatives.
    "embedding_hard_negatives_ann": """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) emb
                   FROM embeddings WHERE label IS NOT NULL)
        SELECT query_id, negative_id, sim FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS negative_id,
                   round(list_cosine_similarity(q.emb, c.emb), 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id
                   ) AS rk
            FROM e q JOIN e c ON q.label <> c.label
        ) WHERE rk <= 5
    """,
    # round-12: kNN-probe accuracy — the knn oracle shape, then a majority
    # vote (count DESC, label ASC tiebreak) and a per-class census
    "embedding_knn_label_vote": """
        WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                          CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings WHERE label IS NOT NULL),
        knn AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.emb, c.emb) DESC,
                                    c.vec_id
                       ) AS rk
                FROM e q JOIN e c ON q.vec_id <> c.vec_id
            ) WHERE rk <= 5
        ),
        votes AS (SELECT knn.query_id, n.label AS n_label,
                         CAST(COUNT(*) AS BIGINT) AS c
                  FROM knn JOIN e n ON knn.neighbor_id = n.vec_id
                  GROUP BY 1, 2),
        pred AS (SELECT query_id, n_label AS predicted FROM (
            SELECT query_id, n_label,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY c DESC, n_label ASC) AS rk
            FROM votes) WHERE rk = 1)
        SELECT t.label, CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(CASE WHEN p.predicted = t.label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN p.predicted = t.label THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS accuracy
        FROM e t LEFT JOIN pred p ON t.vec_id = p.query_id
        GROUP BY 1
    """,
    # ann recall checks: bounded-quality tolerance oracles (same pattern as
    # the sketch queries) — the floor boolean is the cross-engine claim
    "ann_lsh_recall_check": """
        SELECT 'lsh' AS method, COUNT(*) AS n_queries, TRUE AS recall_ok
        FROM embeddings
    """,
    "ann_ivf_recall_check": """
        SELECT 'ivf' AS method, COUNT(*) AS n_queries, TRUE AS recall_ok
        FROM embeddings
    """,
    "ann_ivf_indexed_recall_check": """
        SELECT 'ivf_indexed' AS method, COUNT(*) AS n_queries, TRUE AS recall_ok
        FROM embeddings
    """,
    "ann_ivfpq_indexed_recall_check": """
        SELECT 'ivfpq_indexed' AS method, COUNT(*) AS n_queries,
               TRUE AS recall_ok
        FROM embeddings
    """,
    # round-15: drift lifecycle — counts are exact SQL (the planted set is
    # vec_id % 5 == 0); the four booleans are guaranteed by construction
    # (see wrappers.ann_ivf_drift_check docstring)
    "ann_ivf_drift_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_base,
               CAST(COUNT(*) FILTER (vec_id % 5 = 0) AS BIGINT) AS n_planted,
               TRUE AS drift_flagged, TRUE AS cleared_ok,
               TRUE AS improved_ok, TRUE AS recovery_ok
        FROM embeddings
    """,
    # embedding_near_dup_lsh itself is rows-only (bucket collisions are
    # plane-seed specific); the oracle'd claim is the planted-duplicate
    # coverage check: every vector gets a jittered clone, >=95% of the
    # planted pairs must be recovered at threshold 0.99
    "embedding_near_dup_lsh_check": """
        SELECT COUNT(*) AS n_planted, TRUE AS coverage_ok FROM embeddings
    """,
    "embedding_semantic_dedup_check": """
        SELECT COUNT(*) AS n_planted, TRUE AS coverage_ok FROM embeddings
    """,
    # int8 quantization: floor (tie-free) keeps both engines bit-identical;
    # the position-weighted sum pins every quantized value to its dimension
    "embedding_quantize_int8": """
        WITH m AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS max_abs
            FROM embeddings)
        SELECT vec_id,
               CASE WHEN max_abs = 0 THEN 0.0
                    ELSE max_abs / 127.0 END AS scale,
               CAST(CASE WHEN max_abs = 0 THEN 0 ELSE
                   list_sum(list_transform(range(1, len(embedding) + 1),
                       i -> CAST(floor(CAST(embedding[i] AS DOUBLE)
                                       / max_abs * 127.0) AS BIGINT) * i))
               END AS BIGINT) AS q_wsum,
               CAST(CASE WHEN max_abs = 0 THEN 0 ELSE
                   list_sum(list_transform(embedding,
                       x -> abs(CAST(floor(CAST(x AS DOUBLE)
                                           / max_abs * 127.0) AS BIGINT))))
               END AS BIGINT) AS q_l1
        FROM m
    """,
    "embedding_norm_histogram": """
        SELECT CAST(floor(sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) / 0.25)
                   AS BIGINT) AS norm_bucket,
               COUNT(*) AS n_vecs
        FROM embeddings GROUP BY 1
    """,
    "embedding_pca_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, CAST(8 AS INTEGER) AS k,
               TRUE AS orthonormal_ok, TRUE AS centered_ok, TRUE AS variance_ok
        FROM embeddings
    """,
    "embedding_kmeans_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, CAST(10 AS INTEGER) AS k,
               TRUE AS partition_ok, TRUE AS inertia_ok
        FROM embeddings
    """,
    # round-11: PQ invariant twin — the census itself is rows-only (Lloyd
    # iterations); the oracle pins corpus size and the always-true-by-
    # construction invariant verdicts the Spark side actually computes
    "embedding_pq_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, CAST(4 AS INTEGER) AS m,
               CAST(16 AS INTEGER) AS k, TRUE AS partition_ok,
               TRUE AS codes_ok, TRUE AS quantization_ok
        FROM embeddings
    """,
    # round-11: PQ-ADC serving recall floor (tolerance-oracle pattern)
    "ann_pq_recall_check": """
        SELECT 'pq' AS method, COUNT(*) AS n_queries, TRUE AS recall_ok
        FROM embeddings
    """,
    "ann_bq_recall_check": """
        SELECT 'bq' AS method, COUNT(*) AS n_queries, TRUE AS recall_ok
        FROM embeddings
    """,
    # sign-bit packing: bit j of word w set iff dim 32w+j > 0 — exact
    # integers, the identical fold on both engines
    "embedding_binary_quantize": """
        SELECT vec_id,
               CAST(list_sum(list_transform(range(0, 32), j ->
                    CASE WHEN embedding[CAST(j + 1 AS INT)] > 0
                         THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bq_w0,
               CAST(list_sum(list_transform(range(0, 32), j ->
                    CASE WHEN embedding[CAST(j + 33 AS INT)] > 0
                         THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bq_w1,
               CAST(len(list_filter(embedding, v -> v > 0)) AS BIGINT) AS n_pos
        FROM embeddings
    """,
    # round-11: IVF-PQ composed-serving recall floor
    "ann_ivfpq_recall_check": """
        SELECT 'ivfpq' AS method, COUNT(*) AS n_queries, TRUE AS recall_ok
        FROM embeddings
    """,
    # round-14: IVF-BQ composed-serving recall floor
    "ann_ivfbq_recall_check": """
        SELECT 'ivfbq' AS method, COUNT(*) AS n_queries, TRUE AS recall_ok
        FROM embeddings
    """,
    # round-12: greedy k-center invariants — the oracle pins the selection
    # size (least(8, corpus)) and the two booleans the engine must earn
    "embedding_kcenter_check": """
        SELECT CAST(least(8, COUNT(*)) AS BIGINT) AS k_selected,
               TRUE AS distinct_ok, TRUE AS monotone_ok
        FROM embeddings
    """,
}
