"""Document/text pipeline (dedup families, tokenizers, quality,
sampling, contamination, multimodal).

Registration fragment: QUERIES (Spark callables) + ORACLE_SQL (DuckDB)
assembled by registry/__init__.py; split out of entry.py in round 13.
"""

from __future__ import annotations

from symat_hbase_tools_spark.registry.wrappers import (
    _md5_cut,
    doc_dup_spans_indexed,
    bpe,
    contamination,
    dedup,
    doc_contamination,
    doc_contamination_bloom,
    doc_dedup_clusters,
    doc_dedup_keep_best,
    doc_leakage_safe_split,
    doc_pack_sequences,
    doc_pack_stats,
    doc_reservoir_per_lang,
    doc_sample,
    doc_sample_stratified,
    doc_sample_weighted,
    doc_shuffle_assign,
    doc_softdedup_weights,
    doc_unimax_resample,
    docs_csv_roundtrip,
    docs_jsonl_roundtrip,
    docs_orc_roundtrip,
    load_table,
    multimodal,
    pipeline,
    text_analysis,
    unigram,
)
from symat_hbase_tools_spark.registry.sqlcommon import (
    _JACCARD_SQL,
    _NTOK,
    _SHINGLE_CTE,
    _TOKENS,
    _simhash_portable_sql,
)

QUERIES = {
    # LLM-pipeline surface: dedup (simhash is represented by its
    # oracle-paired portable twin; the banded original sits at 51+)
    "dedup_exact": dedup.exact_dedup,
    "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
    # round-11: asymmetric containment (quote/subset detection — high
    # containment at low Jaccard is the size-mismatched case)
    "doc_containment_pairs": lambda spark, sf: dedup.containment_pairs(
        spark, sf
    ).select("d1", "d2", "n_small", "containment"),
    "dedup_minhash_lsh": dedup.minhash_lsh_pairs,
    "dedup_simhash_portable": dedup.simhash_portable_pairs,
    "doc_dup_spans": dedup.dup_span_census,
    "doc_max_dup_spans": dedup.max_dup_spans,
    "doc_trim_dup_spans": dedup.trim_dup_spans,
    # round-14: the sub-k floor (k=8 catches 8-19-token boilerplate the
    # default k=20 is blind to), the within-doc-repeat criterion (full
    # Lee et al.: a span repeated only inside one document counts), and
    # the per-partner attribution refinement
    "doc_max_dup_spans_k8": lambda spark, sf: dedup.max_dup_spans(
        spark, sf, k=8
    ),
    "doc_trim_dup_spans_k8": lambda spark, sf: dedup.trim_dup_spans(
        spark, sf, k=8
    ),
    "doc_max_dup_spans_withindoc": lambda spark, sf: dedup.max_dup_spans(
        spark, sf, within_doc=True
    ),
    "doc_dup_span_partners": dedup.dup_span_partners,
    # round-15: partner fan-out cap — on a planted corpus where every doc
    # shares one boilerplate footer (nd = n_docs >> cap=8), the footer
    # demotes to doc-level attribution (partner_id = -1) while organic
    # nd<=3 fragments keep exact pair attribution; the hot list exposes
    # the demoted boilerplate text itself
    "doc_dup_span_partners_capped": lambda spark, sf: (
        dedup.dup_span_partners_of(
            _planted_hot_docs(spark, sf), k=20, max_partners_per_hash=8
        )
    ),
    "doc_dup_span_hot_list": lambda spark, sf: dedup.dup_span_hot_list_of(
        _planted_hot_docs(spark, sf), k=20, max_partners_per_hash=8
    ),
    # round-14: the persisted-index incremental form (batch spans served
    # off the standing window-hash index; oracle = direct computation)
    "doc_dup_spans_indexed": doc_dup_spans_indexed,
    "pipeline_curated_search": pipeline.curated_similarity_search,
    # round-12: hybrid lexical+semantic retrieval (reciprocal-rank fusion)
    "doc_hybrid_search_rrf": pipeline.hybrid_search_rrf,
    # LLM-pipeline surface: text analysis
    "text_lang_id": text_analysis.lang_id,
    "text_quality_score": text_analysis.quality_score,
    # round-13: Gopher rule-based quality gate (Rae et al. 2021)
    "doc_gopher_quality": text_analysis.gopher_quality_flags,
    "text_bigram_surprisal": text_analysis.bigram_surprisal,
    "text_repetition_signals": text_analysis.repetition_signals,
    "doc_mixture_weights": text_analysis.mixture_weights,
    "text_cleaning": text_analysis.text_cleaning,
    "text_unigram_logprob": text_analysis.unigram_logprob,
    "text_bm25_search": text_analysis.bm25_search,
    # round-5: closed-form linear-probe training (normal equations from
    # one distributed pass; exact-integer Gram => hash-exact oracle)
    "doc_probe_gram": lambda spark, sf: __import__(
        "symat_hbase_tools_spark.operators.regression", fromlist=["probe_gram"]
    ).probe_gram(spark, sf),
    "doc_probe_ridge": lambda spark, sf: __import__(
        "symat_hbase_tools_spark.operators.regression", fromlist=["ridge_fit"]
    ).ridge_fit(spark, sf),
    "doc_probe_ridge_check": lambda spark, sf: __import__(
        "symat_hbase_tools_spark.operators.regression", fromlist=["probe_fit_check"]
    ).probe_fit_check(spark, sf),
    # LLM-pipeline surface: multimodal plumbing
    "multimodal_features": multimodal.multimodal_features,
    # round-11: byte-identical media dedup (sha-256 over the raw payload —
    # the no-decode pass that works in this container)
    "multimodal_payload_dedup": lambda spark, sf: multimodal.payload_dedup(
        multimodal.attach_payload(load_table(spark, sf, "documents"))
    ),
    # round-12: perceptual (dHash byte-raster) near-dup — the lightly-
    # edited-copy companion to the byte-identical sha-256 pass; rows-only
    # (numpy fingerprint fold), claim carried by the planted-edit twin
    "multimodal_near_dup": multimodal.multimodal_near_dup,
    "multimodal_near_dup_check": multimodal.multimodal_near_dup_check,
    # round-15: REAL-pixel decode tier — raster fixtures generated by an
    # SQL-restatable law, decoded from bytes (netpbm header parse, BMP
    # padding + bottom-up order), censused; and the planted crop/
    # brightness recovery proof over decoded dHash (the edit classes the
    # byte-raster fingerprint provably cannot catch)
    "multimodal_decode_census": multimodal.multimodal_decode_census,
    "multimodal_decode_edit_check": multimodal.multimodal_decode_edit_check,
    # sampling surface
    "doc_sample": doc_sample,
    # training-pipeline assembly
    "doc_pack_sequences": doc_pack_sequences,
    "doc_dedup_clusters": doc_dedup_clusters,
    # round-12: SoftDeDup — reweight near-dup clusters (1/size) instead of
    # dropping members; same CC graph as doc_dedup_clusters
    "doc_softdedup_weights": doc_softdedup_weights,
    "doc_leakage_safe_split": doc_leakage_safe_split,
    "doc_contamination": doc_contamination,
    # round-10: fuzzy (near-duplicate) contamination — MinHash-LSH
    # candidates against the benchmark set, exact-Jaccard verified
    "doc_contamination_fuzzy": contamination.benchmark_contamination_fuzzy,
    "doc_contamination_overlap": contamination.contamination_overlap_census,
    "bpe_pair_stats": text_analysis.bpe_pair_stats,
    "text_tfidf_topk": text_analysis.tfidf_topk,
    "doc_quality_classifier": text_analysis.quality_classifier,
    "doc_unimax_resample": doc_unimax_resample,
    "doc_dedup_keep_best": doc_dedup_keep_best,
    # round-8 additions: token-budgeted corpus selection (distributed
    # ordered prefix sum) and contrastive hard-negative mining (label-
    # masked exact broadcast-BLAS top-k)
    "doc_token_budget_select": text_analysis.token_budget_select,
    # interchange formats (round 2)
    "docs_jsonl_roundtrip": docs_jsonl_roundtrip,
    "docs_orc_roundtrip": docs_orc_roundtrip,
    "doc_pii_scrub": text_analysis.pii_scrub,
    "bpe_learn_merges": lambda spark, sf: bpe.learn_merges(spark, sf),
    "bpe_tokenize_census": lambda spark, sf: bpe.tokenize_census(spark, sf),
    # round-7: oracle-paired check forms (DuckDB independently computes the
    # first merge + per-group exact facts; loop invariants as booleans)
    "bpe_learn_check": lambda spark, sf: bpe.learn_check(spark, sf),
    "bpe_tokenize_check": lambda spark, sf: bpe.tokenize_check(spark, sf),
    # round-13: the second tokenizer family — unigram-LM (SentencePiece
    # EM, Kudo 2018); iterative loop rows-only, seed argmax anchored
    "unigram_learn_vocab": lambda spark, sf: unigram.learn_unigram(spark, sf),
    "unigram_learn_check": lambda spark, sf: unigram.unigram_learn_check(spark, sf),
    "text_unigram_fertility": lambda spark, sf: unigram.unigram_fertility_census(spark, sf),
    "unigram_tokenize_check": lambda spark, sf: unigram.unigram_tokenize_check(spark, sf),
    # round-14: subword regularization (Kudo 2018 sampled segmentations) —
    # rows-only census + the oracle-paired lattice-invariant twin
    "text_unigram_sampled": lambda spark, sf: unigram.unigram_sampled_fertility(
        spark, sf
    ),
    "unigram_sample_check": lambda spark, sf: unigram.unigram_sample_check(
        spark, sf
    ),
    "dedup_incremental": dedup.incremental_dedup,
    # window evictions (oracle-verified locally + by the sf0.1 sweep;
    # each has an in-window sibling covering the same operator family —
    # and the three rows-only originals are represented in-window by their
    # oracle-paired twins/recall checks, which execute the same paths)
    "dedup_bow_fingerprint": dedup.bow_fingerprint_dedup,
    "dedup_simhash": dedup.simhash_pairs,
    "text_token_stats": text_analysis.token_stats,
    "text_nfc_clean": text_analysis.text_nfc_clean,
    "text_vocab_coverage": text_analysis.vocab_coverage,
    "multimodal_frame_census": multimodal.multimodal_frame_census,
    "multimodal_resize_census": multimodal.multimodal_resize_census,
    "doc_shuffle_assign": doc_shuffle_assign,
    "text_doc_fingerprints": text_analysis.doc_fingerprints,
    "doc_length_histogram": text_analysis.length_histogram,
    "doc_sample_stratified": doc_sample_stratified,
    "doc_reservoir_per_lang": doc_reservoir_per_lang,
    "doc_pack_stats": doc_pack_stats,
    "doc_chunk_census": text_analysis.chunk_census,
    # round-3: mixture temperature, PCA projection (check sits in-window)
    "doc_mixture_temperature": text_analysis.mixture_temperature,
    # round-3: CSV interchange
    "docs_csv_roundtrip": docs_csv_roundtrip,
    # round-3: PPS systematic weighted sampling + k-means clustering
    "doc_sample_weighted": doc_sample_weighted,
    "text_zipf_fit": text_analysis.zipf_fit,
    # round-11: phrase mining (PMI collocations) + per-doc word entropy
    "text_pmi_collocations": lambda spark, sf: text_analysis.pmi_collocations(
        spark, sf
    ),
    "text_word_entropy": text_analysis.word_entropy,
    # round-3: exact set-similarity join via prefix filtering (complete
    # candidates — no LSH recall loss, no DF cap; same oracle as
    # dedup_ngram_jaccard because the SPEC is identical)
    "dedup_prefix_filter": dedup.prefix_filter_pairs,
    # round-4: bloom-screened contamination (scale notch of
    # doc_contamination: bitmap broadcast + Arrow probe, exact verify)
    "doc_contamination_bloom": doc_contamination_bloom,
    # round-9: reward-model / DPO preference-pair construction
    "doc_preference_pairs": text_analysis.preference_pairs,
    # round-9: curriculum ordering with cross-language interleave
    "doc_curriculum_order": text_analysis.curriculum_order,
    # round-10: DSIR importance-weighted data selection (hashed-unigram
    # target/source log ratio, exact-micros weights)
    "doc_dsir_select": text_analysis.dsir_select,
    # round-10: CCNet-style per-language perplexity terciles over the
    # corpus bigram LM (rank-cut buckets, never value-interpolated)
    "doc_ccnet_buckets": text_analysis.ccnet_buckets,
    # round-10: per-language tokenizer fertility census (subwords/word,
    # bytes/subword — the vocabulary-rebalancing diagnostic)
    "text_tokenizer_fertility": text_analysis.tokenizer_fertility,
    # round-10: first-occurrence n-gram novelty (corpus-diversity /
    # memorization diagnostic)
    "doc_ngram_novelty": text_analysis.ngram_novelty,
}

# ---------------------------------------------------------------------------
# exact-substring-dedup oracle templates (parameterized by window width k and
# the duplication criterion) — one SQL body serves doc_max_dup_spans,
# doc_max_dup_spans_k8, doc_max_dup_spans_withindoc, the trim forms, and the
# per-partner refinement. Engine-internal hashes (Spark xxhash64 vs DuckDB
# md5) only need to GROUP identically — both hash the same space-joined
# k-token window strings.


def _span_wins_cte(k: int, src: str = "documents") -> str:
    """words -> overlapping k-token window positions -> md5 window hash.
    ``src`` is the (doc_id, text) relation — ``documents`` or a derived
    subquery (the planted-hot-boilerplate rows use one)."""
    return f"""
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM {src}),
             pos AS (SELECT doc_id, w, unnest(range(1, len(w) - {k - 2})) AS i
                     FROM words WHERE len(w) >= {k}),
             wins AS (SELECT doc_id, i AS pos,
                             md5(array_to_string(w[i:i+{k - 1}], ' ')) AS h
                      FROM pos)"""


def _merge_sql(keys: str, k: int) -> str:
    """islands over dup(keys..., pos) -> token extents -> interval-merge
    into disjoint maximal spans; mirrors operators/dedup.py::_merged_spans."""
    return f"""
             isl AS (SELECT {keys}, pos,
                            pos - ROW_NUMBER() OVER (PARTITION BY {keys}
                                                     ORDER BY pos) AS g
                     FROM dup),
             ext AS (SELECT {keys}, MIN(pos) AS s, MAX(pos) + {k - 1} AS e
                     FROM isl GROUP BY {keys}, g),
             ng AS (SELECT {keys}, s, e,
                           CASE WHEN s > COALESCE(MAX(e) OVER (
                                    PARTITION BY {keys} ORDER BY s
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), -1)
                                THEN 1 ELSE 0 END AS f
                    FROM ext),
             grp AS (SELECT {keys}, s, e,
                            SUM(f) OVER (PARTITION BY {keys} ORDER BY s
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW) AS gid
                     FROM ng)
        SELECT {keys}, CAST(MIN(s) AS BIGINT) AS start_pos,
               CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS span_tokens
        FROM grp GROUP BY {keys}, gid"""


def _max_dup_spans_sql(k: int, within_doc: bool = False) -> str:
    crit = "count(*) > 1" if within_doc else "count(DISTINCT doc_id) > 1"
    return f"""{_span_wins_cte(k)},
             hs AS (SELECT h FROM wins GROUP BY h HAVING {crit}),
             dup AS (SELECT doc_id, pos FROM wins
                     WHERE h IN (SELECT h FROM hs)),{_merge_sql("doc_id", k)}
    """


def _dup_span_partners_sql(
    k: int, cap: int = 64, src: str = "documents"
) -> str:
    # mirrors dedup.dup_span_partners_of: hashes owned by <= cap docs get
    # exact pair-level attribution; hotter hashes demote to doc-level rows
    # keyed partner_id = -1 (HOT_PARTNER_SENTINEL)
    return f"""{_span_wins_cte(k, src)},
             own AS (SELECT DISTINCT doc_id, h FROM wins),
             hh AS (SELECT h, COUNT(*) AS nd FROM own GROUP BY h),
             dup AS (SELECT DISTINCT a.doc_id, b.doc_id AS partner_id, a.pos
                     FROM wins a
                     JOIN own b ON a.h = b.h
                     JOIN hh ON a.h = hh.h
                     WHERE hh.nd <= {cap} AND a.doc_id <> b.doc_id
                     UNION
                     SELECT DISTINCT a.doc_id,
                            CAST(-1 AS BIGINT) AS partner_id, a.pos
                     FROM wins a JOIN hh ON a.h = hh.h
                     WHERE hh.nd > {cap}),{
        _merge_sql("doc_id, partner_id", k)}
    """


def _dup_span_hot_list_sql(
    k: int, cap: int = 64, src: str = "documents"
) -> str:
    # mirrors dedup.dup_span_hot_list_of: (window_text, nd) per hash owned
    # by more than cap docs, text from the (doc_id, pos)-min occurrence
    return f"""{_span_wins_cte(k, src)},
             own AS (SELECT DISTINCT doc_id, h FROM wins),
             hot AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS nd FROM own
                     GROUP BY h HAVING COUNT(*) > {cap}),
             rep AS (SELECT w.doc_id, w.pos, w.h,
                            ROW_NUMBER() OVER (PARTITION BY w.h
                                               ORDER BY w.doc_id, w.pos) AS rn
                     FROM wins w JOIN hot ON w.h = hot.h)
        SELECT array_to_string(wd.w[r.pos:r.pos+{k - 1}], ' ') AS window_text,
               hot.nd AS nd
        FROM rep r
        JOIN hot ON r.h = hot.h
        JOIN words wd ON wd.doc_id = r.doc_id
        WHERE r.rn = 1
    """


#: planted hot-boilerplate corpus for the capped-partner oracle rows: the
#: same 20-token footer appended to EVERY document, so its window is owned
#: by the whole corpus (nd = n_docs >> cap) and must demote, while the
#: organic nd<=3 shared fragments stay exactly pair-attributed
_BOILER_TOKENS = [f"zzboiler{i}" for i in range(20)]
_PLANTED_SRC = (
    "(SELECT doc_id, text || ' "
    + " ".join(_BOILER_TOKENS)
    + "' AS text FROM documents)"
)


def _planted_hot_docs(spark, sf):
    from pyspark.sql import functions as F

    return load_table(spark, sf, "documents").withColumn(
        "text",
        F.concat_ws(" ", F.col("text"), F.lit(" ".join(_BOILER_TOKENS))),
    )


def _trim_dup_spans_sql(k: int) -> str:
    # coverage is the UNION of extents, so the trim oracle can use the
    # unmerged islands directly — identical covered-position set
    return f"""{_span_wins_cte(k)},
             hs AS (SELECT h FROM wins GROUP BY h
                    HAVING count(DISTINCT doc_id) > 1),
             dup AS (SELECT doc_id, pos FROM wins
                     WHERE h IN (SELECT h FROM hs)),
             isl AS (SELECT doc_id, pos,
                            pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                                     ORDER BY pos) AS g
                     FROM dup),
             ext AS (SELECT doc_id, MIN(pos) AS s,
                            CAST(COUNT(*) + {k - 1} AS BIGINT) AS L
                     FROM isl GROUP BY doc_id, g),
             cov AS (SELECT DISTINCT doc_id, unnest(range(s, s + L)) AS p
                     FROM ext),
             tok AS (SELECT doc_id, unnest(w) AS token,
                            generate_subscripts(w, 1) AS p
                     FROM words),
             kept AS (SELECT t.doc_id,
                             string_agg(t.token, ' ' ORDER BY t.p) AS trimmed,
                             CAST(COUNT(*) AS BIGINT) AS n_kept
                      FROM tok t LEFT JOIN cov c
                        ON t.doc_id = c.doc_id AND t.p = c.p
                      WHERE c.p IS NULL
                      GROUP BY t.doc_id)
        SELECT w.doc_id,
               CAST(len(w.w) AS BIGINT) AS n_tokens,
               CAST(len(w.w) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(k.trimmed, '') AS trimmed_text
        FROM words w LEFT JOIN kept k ON w.doc_id = k.doc_id
    """


ORACLE_SQL = {
    "dedup_exact": r"""
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               min(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "dedup_bow_fingerprint": """
        WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
             fps AS (SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY tok)) AS fp
                     FROM toks GROUP BY doc_id)
        SELECT fp, min(doc_id) AS keep_doc_id, COUNT(*) AS n_docs FROM fps GROUP BY fp
    """,
    "dedup_ngram_jaccard": _JACCARD_SQL,
    # same spec, different (prefix-filtering) candidate algorithm
    "dedup_prefix_filter": _JACCARD_SQL,
    # dedup_minhash_lsh verifies candidates with EXACT jaccard; at the corpus'
    # similarity gap (pairs are ~0.99 or <0.1) a banded miss has p ~ 1e-22, so
    # the exact-jaccard SQL is its oracle too. dedup_simhash / ann_lsh_topk
    # have no cross-engine twin (xxhash64 family) -> rows-only checks.
    "dedup_minhash_lsh": _JACCARD_SQL,
    # fuzzy contamination: the SAME exact-jaccard oracle restricted to
    # (train x benchmark) pairs, best benchmark match per contaminated
    # train doc (max jaccard, bench_doc tie-break). Completeness of the
    # engine's LSH banding at threshold 0.5 is the dedup_minhash_lsh
    # evidence, of which these pairs are a subset.
    "doc_contamination_fuzzy": f"""
        WITH {_SHINGLE_CTE},
        cj AS (SELECT tr.doc_id AS doc_id, be.doc_id AS bench_doc, COUNT(*) i
               FROM sh tr JOIN sh be USING (s)
               WHERE tr.doc_id % 50 <> 0 AND be.doc_id % 50 = 0
               GROUP BY 1, 2),
        cjac AS (SELECT cj.doc_id AS doc_id, cj.bench_doc AS bench_doc,
                        i / (s1.n + s2.n - i) AS jaccard
                 FROM cj JOIN sizes s1 ON cj.doc_id = s1.doc_id
                         JOIN sizes s2 ON cj.bench_doc = s2.doc_id)
        SELECT doc_id, bench_doc, jaccard
        FROM cjac
        WHERE jaccard >= 0.5
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY jaccard DESC, bench_doc) = 1
    """,
    # simhash over a PORTABLE md5-derived hash — the full cross-engine
    # verification twin of the (xxhash64, rows-only) dedup_simhash
    "dedup_simhash_portable": _simhash_portable_sql(),
    # incremental dedup: new batch (doc_id % 10 = 0) vs corpus only —
    # exact by normalized md5, near by one-sided shingle jaccard
    "dedup_incremental": r"""
        WITH norm AS (SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
              FROM documents),
        exact AS (SELECT n.doc_id, MIN(c.doc_id) AS exact_match
                  FROM (SELECT * FROM norm WHERE doc_id % 10 = 0) n
                  JOIN (SELECT * FROM norm WHERE doc_id % 10 <> 0) c USING (fp)
                  GROUP BY n.doc_id),
        t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        sh0 AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 1, 1)),
                    i -> w[i] || '|' || w[i+1] || '|' || w[i+2]) shl FROM t),
        sh AS (SELECT DISTINCT doc_id, unnest(shl) s FROM sh0),
        sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id, b.doc_id AS c_doc, COUNT(*) i
                  FROM sh a JOIN sh b USING (s)
                  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
                  GROUP BY 1, 2),
        jac AS (SELECT doc_id, c_doc, i / (s1.n + s2.n - i) AS jaccard
                FROM inter JOIN sizes s1 USING (doc_id)
                           JOIN sizes s2 ON c_doc = s2.doc_id
                WHERE i / (s1.n + s2.n - i) >= 0.5),
        near AS (SELECT doc_id, c_doc AS near_match,
                        round(jaccard, 6) AS best_jaccard
                 FROM (SELECT *, row_number() OVER (
                           PARTITION BY doc_id ORDER BY jaccard DESC, c_doc
                       ) AS rk FROM jac)
                 WHERE rk = 1)
        SELECT d.doc_id,
               CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
                    WHEN nr.near_match IS NOT NULL THEN 'near_dup'
                    ELSE 'unique' END AS verdict,
               COALESCE(e.exact_match, nr.near_match) AS match_doc,
               COALESCE(nr.best_jaccard, 0.0) AS best_jaccard
        FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
        LEFT JOIN exact e USING (doc_id)
        LEFT JOIN near nr USING (doc_id)
    """,
    # doc_dup_spans: the window hash is engine-internal (Spark xxhash64,
    # DuckDB md5) — only the grouping must agree, and it does because both
    # hash the identical space-joined 20-token window strings.
    "doc_dup_spans": """
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             pos AS (SELECT doc_id, w, unnest(range(1, len(w) - 18)) AS i
                     FROM words WHERE len(w) >= 20),
             wins AS (SELECT doc_id, md5(array_to_string(w[i:i+19], ' ')) AS h
                      FROM pos),
             hs AS (SELECT h, count(DISTINCT doc_id) AS nd FROM wins GROUP BY h)
        SELECT wins.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(count(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_dup_windows,
               CAST(count(CASE WHEN nd > 1 THEN 1 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS dup_fraction
        FROM wins JOIN hs USING (h)
        GROUP BY wins.doc_id
        HAVING count(CASE WHEN nd > 1 THEN 1 END) > 0
    """,
    # doc_max_dup_spans: gaps-and-islands over the SAME window-match table
    # as doc_dup_spans — maximal duplicated extents (Lee et al. 2022) —
    # then an interval-merge pass folding token-overlapping extents
    # (islands with positional gap <= k-2) into disjoint spans, mirroring
    # the engine's merge-before-trim (templates above).
    "doc_max_dup_spans": _max_dup_spans_sql(20),
    "doc_max_dup_spans_k8": _max_dup_spans_sql(8),
    "doc_max_dup_spans_withindoc": _max_dup_spans_sql(20, within_doc=True),
    "doc_dup_span_partners": _dup_span_partners_sql(20),
    "doc_dup_span_partners_capped": _dup_span_partners_sql(
        20, cap=8, src=_PLANTED_SRC
    ),
    "doc_dup_span_hot_list": _dup_span_hot_list_sql(
        20, cap=8, src=_PLANTED_SRC
    ),
    # indexed = direct spans restricted to the batch (hash-equality is the
    # proof the persisted path loses and invents nothing)
    "doc_dup_spans_indexed": f"""
        SELECT * FROM ({_max_dup_spans_sql(20)}) WHERE doc_id % 10 = 0
    """,
    "doc_trim_dup_spans_k8": _trim_dup_spans_sql(8),
    # trim = drop every covered token position; docs a span fully covers
    # COALESCE to '' (the engine emits an empty trimmed_text row)
    "doc_trim_dup_spans": _trim_dup_spans_sql(20),
    "text_vocab_coverage": """
        WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
             counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
             vocab AS (SELECT tok, row_number() OVER (ORDER BY n DESC, tok ASC) AS rk
                       FROM counts QUALIFY rk <= 10)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(CASE WHEN vocab.rk IS NULL THEN 1 END) AS BIGINT) AS n_oov,
               CAST(count(CASE WHEN vocab.rk IS NULL THEN 1 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS oov_rate
        FROM toks LEFT JOIN vocab USING (tok)
        GROUP BY lang
    """,
    "pipeline_curated_search": f"""
        WITH kept AS (SELECT doc_id FROM documents WHERE {_NTOK} >= 40),
             e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) emb FROM embeddings
                   WHERE vec_id IN (SELECT doc_id FROM kept))
        SELECT query_id, neighbor_id, sim FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.emb, c.emb), 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.vec_id
                   ) AS rk
            FROM e q JOIN e c ON q.vec_id <> c.vec_id
        ) WHERE rk <= 3
    """,
    "text_lang_id": """
        SELECT lang,
               CASE WHEN regexp_matches(text, '[぀-ヿ]') THEN 'ja'
                    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                    WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
                    WHEN regexp_matches(text, '[؀-ۿ]') THEN 'ar'
                    WHEN regexp_matches(text, '(^| )(der|die|das|und) ') THEN 'de'
                    WHEN regexp_matches(text, '(^| )(el|la|los|las) ') THEN 'es'
                    WHEN regexp_matches(text, '(^| )(the|a|of|and) ') THEN 'en'
                    ELSE 'unknown' END AS predicted,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1, 2
    """,
    # Gopher rule gate: every ratio divides identical bigints; the keep
    # boolean compares those bit-stable doubles to literal thresholds.
    # list_intersect dedups in both engines (Spark array_intersect too).
    "doc_gopher_quality": f"""
        WITH m AS (
            SELECT doc_id,
                   CAST({_NTOK} AS BIGINT) AS n_words,
                   CAST(length(replace(text, ' ', '')) AS BIGINT) AS word_chars,
                   CAST(length(text) - length(replace(text, '#', ''))
                        AS BIGINT) AS hash_cnt,
                   CAST((length(text) - length(replace(text, '...', ''))) // 3
                        AS BIGINT) AS ell_cnt,
                   CAST(len(list_filter({_TOKENS},
                        w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha_words,
                   CAST(len(list_intersect({_TOKENS},
                        ['the','a','of','and','to','in','is','it']))
                        AS BIGINT) AS n_stops
            FROM documents),
        r AS (
            SELECT doc_id, n_words,
                   CASE WHEN n_words > 0
                        THEN CAST(word_chars AS DOUBLE) / n_words
                        ELSE 0.0 END AS mean_word_len,
                   CASE WHEN n_words > 0
                        THEN CAST(hash_cnt + ell_cnt AS DOUBLE) / n_words
                        ELSE 0.0 END AS symbol_ratio,
                   CASE WHEN n_words > 0
                        THEN CAST(alpha_words AS DOUBLE) / n_words
                        ELSE 0.0 END AS alpha_frac,
                   n_stops AS n_stop_distinct
            FROM m)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
               n_stop_distinct,
               (n_words BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3.0 AND 10.0)
               AND (symbol_ratio <= 0.1)
               AND (alpha_frac >= 0.8)
               AND (n_stop_distinct >= 2) AS keep
        FROM r
    """,
    "text_quality_score": f"""
        WITH f AS (
            SELECT doc_id,
                   CAST({_NTOK} AS BIGINT) AS n_tokens,
                   CAST(length(replace(text, ' ', '')) AS BIGINT) AS word_chars,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g'))
                        AS BIGINT) AS non_word,
                   CAST(len(list_filter({_TOKENS},
                        t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
                        AS BIGINT) AS stop_hits
            FROM documents)
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens > 0 THEN word_chars / n_tokens ELSE 0.0 END AS avg_word_len,
               CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END AS stopword_ratio,
               CASE WHEN n_chars > 0 THEN non_word / n_chars ELSE 0.0 END AS punct_ratio,
               least(n_tokens / 100.0, 1.0) * 0.5
                 + (CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END) * 0.3
                 + (1 - (CASE WHEN n_chars > 0 THEN non_word / n_chars ELSE 0.0 END)) * 0.2
                 AS quality_score
        FROM f
    """,
    "text_token_stats": f"""
        WITH d AS (
            SELECT lang, source, n_chars,
                   CAST({_NTOK} AS BIGINT) AS n_toks,
                   CAST(list_sum(list_transform({_TOKENS},
                        w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS bpe
            FROM documents)
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
               CAST(SUM(bpe) AS BIGINT) AS total_bpe_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS avg_tokens
        FROM d GROUP BY lang, source
    """,
    "text_doc_fingerprints": """
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(text) + 1),
                           i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
                   (h, c) -> (h * 31 + c) % 1000000007) AS fp
        FROM documents
    """,
    "text_repetition_signals": """
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w,
                          trim(text) = '' AS empty
                   FROM documents),
        u AS (SELECT doc_id, unnest(w) AS word FROM t WHERE NOT empty),
        uc AS (SELECT doc_id, word, COUNT(*) AS c FROM u GROUP BY 1, 2),
        ua AS (SELECT doc_id, MAX(c) AS topc, CAST(SUM(c) AS BIGINT) AS ntok,
                      COUNT(*) AS ndist
               FROM uc GROUP BY 1),
        b0 AS (SELECT doc_id, list_transform(range(1, len(w)),
                          i -> w[i] || ' ' || w[i+1]) AS bl
               FROM t WHERE NOT empty),
        bu AS (SELECT doc_id, unnest(bl) AS bigram FROM b0),
        bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bu GROUP BY 1, 2),
        ba AS (SELECT doc_id, MAX(c) AS topb FROM bc GROUP BY 1)
        SELECT d.doc_id,
               COALESCE(ntok, 0) AS n_tokens,
               COALESCE(ndist, 0) AS n_distinct,
               CASE WHEN ntok > 0 THEN topc / ntok ELSE 0.0 END AS top_unigram_frac,
               CASE WHEN ntok > 0 THEN ndist / ntok ELSE 0.0 END AS distinct_ratio,
               CASE WHEN ntok > 1 THEN topb / (ntok - 1) ELSE 0.0 END AS top_bigram_frac
        FROM documents d
        LEFT JOIN ua ON d.doc_id = ua.doc_id
        LEFT JOIN ba ON d.doc_id = ba.doc_id
    """,
    "doc_mixture_weights": f"""
        WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                          CAST(SUM(ntok) AS BIGINT) AS total_tokens
                   FROM (SELECT lang, source, CAST({_NTOK} AS BIGINT) AS ntok
                         FROM documents)
                   GROUP BY 1, 2),
        tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS corpus_docs,
                       COUNT(*) AS n_groups FROM g)
        SELECT lang, source, n_docs, total_tokens,
               n_docs / corpus_docs AS share,
               (corpus_docs / n_groups) / n_docs AS weight
        FROM g, tot
    """,
    "doc_length_histogram": f"""
        SELECT bucket, n_docs, min_chars, max_chars, total_tokens,
               bucket * 200 AS bucket_lo
        FROM (SELECT n_chars // 200 AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
                     CAST(SUM(CAST({_NTOK} AS BIGINT)) AS BIGINT) AS total_tokens
              FROM documents GROUP BY 1)
    """,
    "text_unigram_logprob": f"""
        WITH w AS (SELECT doc_id, unnest({_TOKENS}) AS word
                   FROM documents WHERE trim(text) <> ''),
        v AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
        t AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_corpus FROM v)
        SELECT w.doc_id,
               COUNT(*) AS n_tokens,
               round(AVG(-ln(v.c / t.n_corpus)), 6) AS avg_neg_logprob
        FROM w JOIN v USING (word) CROSS JOIN t
        GROUP BY w.doc_id
    """,
    # NFC equivalence: Unicode's normalization stability policy pins NFC
    # across implementations, so utf8proc (DuckDB) == unicodedata (engine);
    # property-tested in tests/test_text_analysis.py. chr(768) = U+0300.
    "text_nfc_clean": """
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN replace(text, 'a', 'a' || chr(768))
                        ELSE text END AS t
            FROM documents),
        n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM d)
        SELECT doc_id,
               t <> nt AS changed,
               CAST(length(t) AS BIGINT) AS cp_before,
               CAST(length(nt) AS BIGINT) AS cp_after,
               md5(nt) AS nfc_fp
        FROM n
    """,
    "text_cleaning": """
        WITH c AS (
            SELECT doc_id, text,
                   trim(regexp_replace(
                        regexp_replace(text, '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'),
                        '[ \\t\\r\\n]+', ' ', 'g')) AS cleaned
            FROM documents)
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS raw_chars,
               CAST(length(cleaned) AS BIGINT) AS clean_chars,
               CAST(length(text) - length(cleaned) AS BIGINT) AS removed,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(cleaned) + 1),
                           i -> CAST(ascii(substr(cleaned, CAST(i AS INT), 1)) AS BIGINT))),
                   (h, ch) -> (h * 31 + ch) % 1000000007) AS clean_fp
        FROM c
    """,
    # round-12: hybrid retrieval — the bm25 oracle CTE + a cosine list on
    # the fixed query vector, fused by reciprocal rank (1/(60+rank))
    "doc_hybrid_search_rrf": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKENS}) AS term
                       FROM documents WHERE trim(text) <> ''),
        dl AS (SELECT doc_id, CAST({_NTOK} AS BIGINT) AS dl FROM documents),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        qt AS (SELECT unnest(['hash', 'join', 'scan']) AS term),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM words JOIN qt USING (term) GROUP BY 1, 2),
        dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        bm AS (
            SELECT doc_id,
                   round(SUM(ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                                / (df + 0.5) + 1.0)
                         * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))), 6)
                       AS score
            FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
                 CROSS JOIN stats
            GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20
        ),
        lex AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                            AS BIGINT) AS lex_rank
                FROM bm),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings),
        q AS (SELECT emb AS qe FROM e WHERE vec_id = 7),
        simt AS (SELECT vec_id AS doc_id,
                        round(list_cosine_similarity(e.emb, q.qe), 6) AS sim
                 FROM e CROSS JOIN q WHERE vec_id <> 7
                 ORDER BY sim DESC, doc_id LIMIT 20),
        sem AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
                            AS BIGINT) AS sem_rank
                FROM simt),
        f AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                     l.lex_rank, s.sem_rank,
                     round(COALESCE(1.0 / (60.0 + l.lex_rank), 0)
                           + COALESCE(1.0 / (60.0 + s.sem_rank), 0), 6)
                         AS rrf_score
              FROM lex l FULL JOIN sem s ON l.doc_id = s.doc_id)
        SELECT doc_id, lex_rank, sem_rank, rrf_score
        FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    "text_bm25_search": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKENS}) AS term
                       FROM documents WHERE trim(text) <> ''),
        dl AS (SELECT doc_id, CAST({_NTOK} AS BIGINT) AS dl FROM documents),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        qt AS (SELECT unnest(['hash', 'join', 'scan']) AS term),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM words JOIN qt USING (term) GROUP BY 1, 2),
        dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1)
        SELECT doc_id,
               round(SUM(ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                     * (tf * 2.2)
                     / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))), 6) AS score
        FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 20
    """,
    "multimodal_features": """
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               CAST(CAST(list_sum(list_transform(range(1, length(text) + 1),
                    i -> ascii(substr(text, CAST(i AS INT), 1)))) AS BIGINT) % 997
                    AS BIGINT) AS checksum,
               CAST(n_chars % 640 + 1 AS INT) AS width,
               CAST(doc_id % 480 + 1 AS INT) AS height
        FROM documents
    """,
    "multimodal_frame_census": """
        SELECT source,
               CAST(SUM((doc_id % 10) // 2 + 1) AS BIGINT) AS n_frames_sampled,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM documents GROUP BY source
    """,
    # multimodal_resize_census: the fake resize kernel is exact integer
    # arithmetic (aspect-preserving clamp to 64, area-ratio byte
    # truncation) — restated verbatim; strlen = BYTE length in DuckDB
    "multimodal_resize_census": """
        WITH m AS (
            SELECT doc_id, source,
                   n_chars % 640 + 1 AS w,
                   doc_id % 480 + 1 AS h,
                   strlen(text) AS in_len
            FROM documents
        ), d AS (
            SELECT doc_id, source, w, h, in_len,
                   greatest(w * least(greatest(w, h), 64) // greatest(w, h), 1) AS ow,
                   greatest(h * least(greatest(w, h), 64) // greatest(w, h), 1) AS oh
            FROM m
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(ow) AS BIGINT) AS sum_out_width,
               CAST(SUM(oh) AS BIGINT) AS sum_out_height,
               CAST(SUM(least(greatest(in_len * (ow * oh) // (w * h), 1), in_len))
                    AS BIGINT) AS sum_out_bytes,
               CAST(MAX(ow) AS INT) AS max_out_width
        FROM d GROUP BY source
    """,
    # portable md5 sampling: cutoffs are _md5_cut(fraction) hex strings —
    # 0.2->33333333, 0.25->40000000, 0.75->c0000000, 0.5->80000000
    "doc_sample": """
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE substr(md5(concat_ws(chr(31), '42', doc_id)), 1, 8) < '33333333'
    """,
    "doc_sample_stratified": """
        SELECT lang, COUNT(*) AS n_docs FROM documents
        WHERE substr(md5(concat_ws(chr(31), '42', doc_id)), 1, 8) <
              CASE lang WHEN 'en' THEN '40000000' WHEN 'zh' THEN 'c0000000'
                        ELSE '80000000' END
        GROUP BY lang ORDER BY lang
    """,
    "doc_shuffle_assign": """
        WITH h AS (SELECT doc_id, lang,
                          md5(concat_ws(chr(31), '42', doc_id)) AS h
                   FROM documents),
        s AS (SELECT doc_id, lang, h,
                     CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                           + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 256
                          AS INT) AS shard
              FROM h)
        SELECT doc_id, lang, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
                    AS BIGINT) AS pos
        FROM s
    """,
    "doc_reservoir_per_lang": """
        WITH r AS (SELECT doc_id, lang, n_chars,
                          ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY md5(concat_ws(chr(31), '42', doc_id)),
                                       doc_id) AS rk
                   FROM documents)
        SELECT doc_id, lang, n_chars FROM r WHERE rk <= 10
    """,
    "doc_pack_sequences": f"""
        WITH t AS (SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - n_tokens AS BIGINT) AS start_offset
              FROM t)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // 2048 AS seq_id
        FROM c
    """,
    "doc_pack_stats": f"""
        WITH t AS (SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - n_tokens AS BIGINT) AS start_offset
              FROM t)
        SELECT start_offset // 2048 AS seq_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_tokens) AS DOUBLE) / 2048 AS fill
        FROM c GROUP BY 1
    """,
    "doc_contamination": f"""
        WITH {_SHINGLE_CTE}
        SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0) tr
        JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0) be USING (s)
        GROUP BY tr.doc_id HAVING COUNT(*) >= 5
    """,
    # overlap-fraction census: every train doc, exact integer ratio in
    # double (bit-identical cross-engine), conventional severity bands
    "doc_contamination_overlap": f"""
        WITH {_SHINGLE_CTE},
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
        tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
        osz AS (SELECT doc_id, COUNT(*) AS n_sh FROM tr GROUP BY 1),
        oov AS (SELECT tr.doc_id, COUNT(b.s) AS n_ov
                FROM tr LEFT JOIN bench b USING (s) GROUP BY 1),
        base AS (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0)
        SELECT base.doc_id,
               CAST(COALESCE(osz.n_sh, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(oov.n_ov, 0) AS BIGINT) AS n_overlap,
               CASE WHEN COALESCE(osz.n_sh, 0) = 0 THEN 0.0
                    ELSE COALESCE(oov.n_ov, 0) / CAST(osz.n_sh AS DOUBLE)
               END AS overlap_frac,
               CASE WHEN COALESCE(osz.n_sh, 0) = 0 THEN 'clean'
                    WHEN COALESCE(oov.n_ov, 0) / CAST(osz.n_sh AS DOUBLE) >= 0.5
                        THEN 'leaked'
                    WHEN COALESCE(oov.n_ov, 0) / CAST(osz.n_sh AS DOUBLE) >= 0.05
                        THEN 'partial'
                    ELSE 'clean'
               END AS severity
        FROM base LEFT JOIN osz USING (doc_id) LEFT JOIN oov USING (doc_id)
    """,
    "doc_contamination_bloom": f"""
        WITH {_SHINGLE_CTE}
        SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0) tr
        JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0) be USING (s)
        GROUP BY tr.doc_id HAVING COUNT(*) >= 5
    """,
    # jsonl round-trip: oracle reads the parquet directly — equality proves
    # the JSONL writer+PERMISSIVE reader are lossless with zero quarantines
    "docs_orc_roundtrip": """
        WITH h AS (SELECT source, n_chars, md5(text) AS h FROM documents)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(((((((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1))) AS BIGINT) AS text_fp_sum
        FROM h GROUP BY source
    """,
    "docs_jsonl_roundtrip": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
        FROM documents GROUP BY lang
    """,
    # pii scrub: counts via regexp_extract_all length; fingerprint of the
    # scrubbed text via the same rolling-hash fold as text_doc_fingerprints
    "doc_pii_scrub": """
        WITH s AS (
            SELECT doc_id, text,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                       '\\+\\d{7,15}\\b', '<PHONE>', 'g') AS scrubbed
            FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text,
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(text,
                   '\\+\\d{7,15}\\b')) AS BIGINT) AS n_phones,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(scrubbed) + 1),
                           i -> CAST(ascii(substr(scrubbed, CAST(i AS INT), 1)) AS BIGINT))),
                   (h, c) -> (h * 31 + c) % 1000000007) AS scrubbed_fp
        FROM s
    """,
    "doc_dedup_clusters": f"""
        WITH RECURSIVE {_SHINGLE_CTE},
        pairs AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
        edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                  UNION SELECT d2, d1 FROM pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION
                        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        labels AS (SELECT a AS node, least(a, MIN(b)) AS cluster
                   FROM reach GROUP BY a)
        SELECT cluster, COUNT(*) AS n_members,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
        FROM labels GROUP BY cluster
    """,
    # round-12: SoftDeDup — same recursive-CTE labels, weight = 1/size
    "doc_softdedup_weights": f"""
        WITH RECURSIVE {_SHINGLE_CTE},
        pairs AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
        edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                  UNION SELECT d2, d1 FROM pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION
                        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        labels AS (SELECT a AS node, least(a, MIN(b)) AS cluster
                   FROM reach GROUP BY a),
        csz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM labels GROUP BY 1)
        SELECT d.doc_id, l.cluster,
               CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,
               1.0 / COALESCE(s.cluster_size, 1) AS weight
        FROM documents d
        LEFT JOIN labels l ON d.doc_id = l.node
        LEFT JOIN csz s ON l.cluster = s.cluster
    """,
    # doc_leakage_safe_split: the same recursive-CTE cluster labels as
    # doc_dedup_clusters, then the portable md5 split on
    # coalesce(cluster, doc_id) — the zero-leak boolean is TRUE by
    # construction (split is cluster-keyed), stated, not assumed
    "doc_leakage_safe_split": f"""
        WITH RECURSIVE {_SHINGLE_CTE},
        prs AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
        edges AS (SELECT d1 AS a, d2 AS b FROM prs
                  UNION SELECT d2, d1 FROM prs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION
                        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        labels AS (SELECT a AS node, least(a, MIN(b)) AS cluster
                   FROM reach GROUP BY a),
        assigned AS (
            SELECT d.doc_id, l.cluster,
                   substr(md5(concat_ws(chr(31), '42',
                       CAST(coalesce(l.cluster, d.doc_id) AS VARCHAR))), 1, 8) AS hx
            FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
        ),
        s AS (SELECT doc_id, cluster,
                     CASE WHEN hx < '{_md5_cut(0.8)}' THEN 'train'
                          WHEN hx < '{_md5_cut(0.9)}' THEN 'valid'
                          ELSE 'test' END AS split
              FROM assigned)
        SELECT split, COUNT(*) AS n_docs,
               CAST(COUNT(cluster) AS BIGINT) AS n_clustered_docs,
               TRUE AS no_cross_split_pairs
        FROM s GROUP BY split
    """,
    "bpe_pair_stats": """
        WITH t AS (SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(text), ' +') END AS w
                   FROM documents),
        p AS (SELECT unnest(list_transform(range(1, len(w)),
                         i -> w[i] || ' ' || w[i+1])) AS pair
              FROM t WHERE len(w) >= 2)
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM p GROUP BY pair
        ORDER BY pair_count DESC, pair
        LIMIT 50
    """,
    "bpe_learn_check": """
        WITH w AS (SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(text), ' +') END AS ws
                   FROM documents),
        wd AS (SELECT unnest(ws) AS word FROM w),
        p AS (SELECT unnest(list_transform(range(1, length(word)),
                         i -> substr(word, i, 1) || chr(31) || substr(word, i + 1, 1)))
                     AS pr
              FROM wd WHERE length(word) >= 2),
        top AS (SELECT split_part(pr, chr(31), 1) AS first_left,
                       split_part(pr, chr(31), 2) AS first_right,
                       CAST(COUNT(*) AS BIGINT) AS first_count
                FROM p GROUP BY pr
                ORDER BY first_count DESC, first_left, first_right
                LIMIT 1)
        -- anchored LEFT JOIN: exactly one row even on an empty corpus
        -- (nulls + count 0, matching the engine), and the merge count is
        -- checked as the engine-side bounded boolean n_merges_ok rather
        -- than a hardcoded requested count, so a corpus with fewer
        -- learnable merges degrades instead of falsely failing
        SELECT t.first_left, t.first_right,
               CAST(coalesce(t.first_count, 0) AS BIGINT) AS first_count,
               TRUE AS n_merges_ok, TRUE AS ranks_ok,
               TRUE AS counts_positive, TRUE AS parts_consistent
        FROM (SELECT 1 AS one) AS anchor LEFT JOIN top t ON TRUE
    """,
    # unigram_learn_check: the seed argmax (top weighted substring of
    # length 2..6 over all word occurrences) is SQL-exact — same
    # (count DESC, piece ASC) tie-break; EM-loop invariants are
    # engine-asserted booleans (the bpe_learn_check pattern).
    "unigram_learn_check": """
        WITH w AS (SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(text), ' +') END AS ws
                   FROM documents),
        wd AS (SELECT unnest(ws) AS word FROM w),
        sub AS (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece
                FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i
                      FROM wd)
                CROSS JOIN (SELECT unnest(range(2, 7)) AS l) ls
                WHERE i + l - 1 <= length(word)),
        top AS (SELECT piece AS top_piece,
                       CAST(COUNT(*) AS BIGINT) AS top_count
                FROM sub GROUP BY piece
                ORDER BY top_count DESC, top_piece LIMIT 1)
        SELECT t.top_piece,
               CAST(coalesce(t.top_count, 0) AS BIGINT) AS top_count,
               TRUE AS ranks_ok, TRUE AS coverage_ok,
               TRUE AS budget_ok, TRUE AS prob_mass_ok
        FROM (SELECT 1 AS one) AS anchor LEFT JOIN top t ON TRUE
    """,
    "bpe_tokenize_check": """
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               TRUE AS tokens_within_bounds
        FROM documents GROUP BY lang, source
    """,
    # unigram_tokenize_check: SQL-exact per-lang facts + the piece-count
    # sandwich as an engine-side boolean (the bpe_tokenize_check pattern)
    "unigram_tokenize_check": f"""
        WITH d AS (SELECT lang, CAST(len({_TOKENS}) AS BIGINT) AS n_w
                   FROM documents WHERE trim(text) <> '')
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_w) AS BIGINT) AS n_words,
               TRUE AS pieces_bounded_ok
        FROM d GROUP BY lang
    """,
    # unigram_sample_check: SQL-exact corpus word count + the sampling-
    # lattice invariants as engine-side booleans (unigram_learn_check
    # pattern)
    "unigram_sample_check": f"""
        SELECT CAST(SUM(CASE WHEN trim(text) <> ''
                             THEN len({_TOKENS}) ELSE 0 END) AS BIGINT)
                   AS n_words,
               TRUE AS valid_ok, TRUE AS ml_dominates_ok,
               TRUE AS greedy_limit_ok, TRUE AS pieces_cover_ok
        FROM documents
    """,
    "text_tfidf_topk": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKENS}) AS term
                       FROM documents WHERE trim(text) <> ''),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM words GROUP BY 1, 2),
        dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (SELECT doc_id, term, tf, df,
                          round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6)
                              AS score
                   FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
        ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, term) AS rk FROM scored)
        SELECT doc_id, term, tf, df, score, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 3
    """,
    "doc_quality_classifier": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKENS}) AS term
                       FROM documents WHERE trim(text) <> ''),
        b AS (SELECT doc_id,
                     CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                          + strpos('0123456789abcdef', substr(h, 2, 1)) - 1 - 128
                          AS BIGINT) AS wgt
              FROM (SELECT doc_id,
                           md5(concat_ws(chr(31), 'cls7', term)) AS h
                    FROM words)),
        agg AS (SELECT doc_id, CAST(SUM(wgt) AS BIGINT) AS wsum,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM b GROUP BY doc_id)
        SELECT doc_id, n_tokens, wsum,
               wsum / (256.0 * n_tokens) AS score,
               wsum / (256.0 * n_tokens) > 0 AS keep
        FROM agg
    """,
    # preference pairs: per (lang, source) domain, argmax-vs-argmin of the
    # exact-bigint classifier score with doc_id tie-breaks; margin is a
    # difference of bit-identical doubles so it hash-matches. Zero-margin
    # (all-tied) domains are dropped on both sides.
    "doc_preference_pairs": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKENS}) AS term
                       FROM documents WHERE trim(text) <> ''),
        b AS (SELECT doc_id,
                     CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                          + strpos('0123456789abcdef', substr(h, 2, 1)) - 1 - 128
                          AS BIGINT) AS wgt
              FROM (SELECT doc_id,
                           md5(concat_ws(chr(31), 'cls7', term)) AS h
                    FROM words)),
        agg AS (SELECT doc_id, CAST(SUM(wgt) AS BIGINT) AS wsum,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM b GROUP BY doc_id),
        s AS (SELECT a.doc_id, d.lang, d.source,
                     a.wsum / (256.0 * a.n_tokens) AS score
              FROM agg a JOIN documents d USING (doc_id)),
        ranked AS (SELECT *,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY score DESC, doc_id) AS rk_hi,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY score ASC, doc_id) AS rk_lo,
                     CAST(COUNT(*) OVER (PARTITION BY lang, source) AS BIGINT)
                        AS n_docs
                   FROM s),
        ch AS (SELECT lang, source, doc_id AS chosen_id, score AS cs, n_docs
               FROM ranked WHERE rk_hi = 1),
        rj AS (SELECT lang, source, doc_id AS rejected_id, score AS rs
               FROM ranked WHERE rk_lo = 1)
        SELECT ch.lang, ch.source, chosen_id, rejected_id,
               cs - rs AS margin, n_docs
        FROM ch JOIN rj USING (lang, source)
        WHERE cs - rs > 0
    """,
    # curriculum ordering: per-language easy-to-hard rank (token count,
    # doc_id tie-break) and a language-interleaved global position —
    # pure integer ranks under total orders, bit-identical cross-engine
    "doc_curriculum_order": f"""
        WITH d AS (SELECT doc_id, lang, CAST({_NTOK} AS BIGINT) AS n_tokens
                   FROM documents),
        lr AS (SELECT *,
                 CAST(row_number() OVER (PARTITION BY lang
                                         ORDER BY n_tokens, doc_id)
                      AS BIGINT) AS lang_rank
               FROM d)
        SELECT doc_id, lang, n_tokens, lang_rank,
               CAST(row_number() OVER (ORDER BY lang_rank, lang)
                    AS BIGINT) AS curriculum_rank
        FROM lr
    """,
    # DSIR selection: per-bucket ln importance ratio fixed to integer
    # micros at the 256-row weight table, so every per-doc score is an
    # exact bigint SUM (no float accumulation order anywhere) and the
    # top-n_docs//5 boundary is exact cross-engine
    "doc_dsir_select": f"""
        WITH tok AS (SELECT doc_id, lang, unnest({_TOKENS}) AS term
                     FROM documents WHERE trim(text) <> ''),
        tb AS (SELECT doc_id, lang,
                      CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                           + strpos('0123456789abcdef', substr(h, 2, 1)) - 1
                           AS INTEGER) AS bucket
               FROM (SELECT doc_id, lang,
                            md5(concat_ws(chr(31), 'dsir1', term)) AS h
                     FROM tok)),
        cnt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_s,
                       CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT)
                           AS c_t
                FROM tb GROUP BY 1),
        tot AS (SELECT CAST(SUM(c_s) AS BIGINT) AS n_s,
                       CAST(SUM(c_t) AS BIGINT) AS n_t FROM cnt),
        w AS (SELECT bucket,
                     CAST(round((ln((c_t + 1.0) / (n_t + 256))
                                 - ln((c_s + 1.0) / (n_s + 256))) * 1e6)
                          AS BIGINT) AS lw
              FROM cnt CROSS JOIN tot),
        doc AS (SELECT doc_id, any_value(lang) AS lang,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens,
                       CAST(SUM(lw) AS BIGINT) AS logw_micros
                FROM tb JOIN w USING (bucket) GROUP BY doc_id),
        d2 AS (SELECT *, CAST(logw_micros AS DOUBLE) / n_tokens
                             AS lw_per_token
               FROM doc),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d2)
        SELECT doc_id, lang, n_tokens, logw_micros, lw_per_token,
               row_number() OVER (ORDER BY lw_per_token DESC, doc_id)
                   <= n_docs // 5 AS selected
        FROM d2 CROSS JOIN n
    """,
    # CCNet buckets: the proven bigram-LM oracle feeds per-language
    # ntile(3) on (round-6 score in micros, doc_id) — a RANK cut, exact
    # integer end-to-end; a percentile VALUE cut would interpolate floats
    # and go boundary-unstable cross-engine
    "doc_ccnet_buckets": f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS w FROM documents
                   WHERE trim(text) <> ''),
        pos AS (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM t WHERE len(w) >= 2),
        bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pos),
        bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
               FROM bg GROUP BY 1, 2),
        cc AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1),
        vv AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS v
               FROM (SELECT unnest(w) AS s FROM t)),
        sc AS (SELECT doc_id, c12, c1, v
               FROM bg JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN vv),
        per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                       round(avg(-ln((c12 + 1) / (c1 + v))), 6) AS avg_surprisal
                FROM sc GROUP BY 1),
        sm AS (SELECT p.doc_id, p.n_bigrams, p.avg_surprisal, d.lang,
                      CAST(round(p.avg_surprisal * 1e6) AS BIGINT)
                          AS score_micros
               FROM per p JOIN documents d USING (doc_id)),
        r AS (SELECT *, ntile(3) OVER (PARTITION BY lang
                                       ORDER BY score_micros, doc_id) AS t3
              FROM sm)
        SELECT doc_id, lang, n_bigrams, avg_surprisal,
               CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS ppl_bucket
        FROM r
    """,
    # novelty: first-occurrence attribution over the SAME shingle CTE the
    # jaccard oracles use (unreferenced CTE members are not evaluated);
    # counts/min-owner are hash-independent given the dedup family's
    # collision-free xxhash64 argument; the ratio divides identical
    # bigints
    "doc_ngram_novelty": f"""
        WITH {_SHINGLE_CTE},
        owner AS (SELECT s, MIN(doc_id) AS owner_doc FROM sh GROUP BY s)
        SELECT sh.doc_id AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) FILTER (WHERE owner_doc = sh.doc_id)
                    AS BIGINT) AS n_owned,
               CAST(COUNT(*) FILTER (WHERE owner_doc = sh.doc_id)
                    AS DOUBLE) / COUNT(*) AS novelty
        FROM sh JOIN owner USING (s)
        GROUP BY sh.doc_id
    """,
    # fertility census: three bigint sums per language; the two ratios
    # are double divisions of identical bigints (bit-stable). DuckDB
    # list_sum of a BIGINT list returns HUGEINT -> cast per doc AND after
    # the outer SUM (the round-5 mismatch class). strlen = UTF-8 bytes
    # (DuckDB length() is characters; Spark octet_length is bytes).
    "text_tokenizer_fertility": f"""
        WITH d AS (SELECT lang,
                          CAST(len({_TOKENS}) AS BIGINT) AS n_w,
                          CAST(list_sum(list_transform({_TOKENS},
                               w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))
                               AS BIGINT) AS n_s,
                          CAST(strlen(text) AS BIGINT) AS n_b
                   FROM documents WHERE trim(text) <> ''),
        agg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(n_w) AS BIGINT) AS n_words,
                       CAST(SUM(n_s) AS BIGINT) AS n_subtokens,
                       CAST(SUM(n_b) AS BIGINT) AS n_bytes
                FROM d GROUP BY lang)
        SELECT lang, n_docs, n_words, n_subtokens, n_bytes,
               CAST(n_subtokens AS DOUBLE) / n_words AS fertility,
               CAST(n_bytes AS DOUBLE) / n_subtokens AS bytes_per_subtoken
        FROM agg
    """,
    # token-budgeted selection: the quality_classifier score feeds a
    # greedy prefix under budget = total_tokens div 2 (exact integer —
    # the running sum and the comparison never touch floats; the score
    # ORDER is a double but both engines derive it from identical bigint
    # (wsum, n_tokens) pairs, so the division is bit-identical)
    "doc_token_budget_select": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKENS}) AS term
                       FROM documents WHERE trim(text) <> ''),
        b AS (SELECT doc_id,
                     CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                          + strpos('0123456789abcdef', substr(h, 2, 1)) - 1 - 128
                          AS BIGINT) AS wgt
              FROM (SELECT doc_id,
                           md5(concat_ws(chr(31), 'cls7', term)) AS h
                    FROM words)),
        agg AS (SELECT doc_id, CAST(SUM(wgt) AS BIGINT) AS wsum,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM b GROUP BY doc_id),
        scored AS (SELECT doc_id, n_tokens, wsum,
                          wsum / (256.0 * n_tokens) AS score
                   FROM agg),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget
                FROM scored),
        ranked AS (SELECT *,
                          ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                              AS sel_rank,
                          CAST(SUM(n_tokens) OVER (
                              ORDER BY score DESC, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT)
                              AS cum_tokens
                   FROM scored)
        SELECT doc_id, n_tokens, wsum, score,
               CAST(sel_rank AS BIGINT) AS sel_rank, cum_tokens
        FROM ranked CROSS JOIN tot WHERE cum_tokens <= budget
    """,
    "doc_unimax_resample": f"""
        WITH d AS (SELECT source, CAST({_NTOK} AS BIGINT) AS wgt,
                          md5(concat_ws(chr(31), '57', doc_id)) AS h
                   FROM documents),
        f AS (SELECT source, wgt,
                     CAST((((((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(h, 6, 1)) - 1 AS BIGINT)
                     / 16777216.0 AS frac
              FROM d),
        totals AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
                          CAST(SUM(wgt) AS BIGINT) AS grp_weight
                   FROM f GROUP BY source),
        overall AS (SELECT CAST(SUM(grp_weight) AS BIGINT) AS total_weight,
                           CAST(COUNT(*) AS BIGINT) AS n_groups FROM totals),
        cuts AS (SELECT source, n_rows, grp_weight,
                        least(1.0, (0.5 * total_weight / n_groups) / grp_weight)
                            AS keep_frac
                 FROM totals CROSS JOIN overall)
        SELECT f.source, c.n_rows, c.grp_weight, c.keep_frac,
               CAST(SUM(CASE WHEN f.frac < c.keep_frac THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN f.frac < c.keep_frac THEN f.wgt ELSE 0 END)
                    AS BIGINT) AS weight_kept
        FROM f JOIN cuts c USING (source)
        GROUP BY f.source, c.n_rows, c.grp_weight, c.keep_frac
    """,
    "doc_dedup_keep_best": f"""
        WITH RECURSIVE {_SHINGLE_CTE},
        pairs AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
        edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                  UNION SELECT d2, d1 FROM pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION
                        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        labels AS (SELECT a AS node, least(a, MIN(b)) AS cluster
                   FROM reach GROUP BY a),
        qf AS (SELECT doc_id,
                      CAST({_NTOK} AS BIGINT) AS n_tokens,
                      CAST(length(text) AS BIGINT) AS n_chars,
                      CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g'))
                           AS BIGINT) AS non_word,
                      CAST(len(list_filter({_TOKENS},
                           t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
                           AS BIGINT) AS stop_hits
               FROM documents),
        q AS (SELECT doc_id,
                     least(n_tokens / 100.0, 1.0) * 0.5
                       + (CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END) * 0.3
                       + (1 - (CASE WHEN n_chars > 0 THEN non_word / n_chars ELSE 0.0 END)) * 0.2
                       AS quality_score
              FROM qf),
        lab AS (SELECT q.doc_id, COALESCE(l.cluster, q.doc_id) AS cluster,
                       q.quality_score
                FROM q LEFT JOIN labels l ON q.doc_id = l.node),
        ranked AS (SELECT *,
                          ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY quality_score DESC, doc_id) AS rk,
                          COUNT(*) OVER (PARTITION BY cluster) AS n_members
                   FROM lab)
        SELECT doc_id, cluster, CAST(n_members AS BIGINT) AS n_members,
               quality_score
        FROM ranked WHERE rk = 1
    """,
    "doc_chunk_census": f"""
        WITH t AS (SELECT doc_id,
                          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(text), ' +') END AS w
                   FROM documents),
        c AS (SELECT doc_id, w,
                     unnest(range(0, CAST(ceil(len(w) / 24.0) AS INT))) AS i
              FROM t WHERE len(w) > 0)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               CAST(i * 24 AS BIGINT) AS start_tok,
               CAST(len(list_slice(w, i * 24 + 1, i * 24 + 32)) AS BIGINT)
                   AS chunk_tokens,
               md5(array_to_string(list_slice(w, i * 24 + 1, i * 24 + 32), ' '))
                   AS chunk_fp
        FROM c
    """,
    "text_bigram_surprisal": f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS w FROM documents
                   WHERE trim(text) <> ''),
        pos AS (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM t WHERE len(w) >= 2),
        bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pos),
        bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
               FROM bg GROUP BY 1, 2),
        cc AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1),
        vv AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS v
               FROM (SELECT unnest(w) AS s FROM t)),
        sc AS (SELECT doc_id, c12, c1, v
               FROM bg JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN vv)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               round(avg(-ln((c12 + 1) / (c1 + v))), 6) AS avg_surprisal
        FROM sc GROUP BY 1
    """,
    "doc_mixture_temperature": """
        WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM documents GROUP BY 1, 2),
        gw AS (SELECT *, CAST(round(sqrt(n_docs) * 1e6) AS BIGINT) AS w FROM g),
        tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total,
                       CAST(SUM(n_docs) AS BIGINT) AS corpus_docs FROM gw)
        SELECT lang, source, n_docs,
               CAST(n_docs AS DOUBLE) / corpus_docs AS share,
               CAST(w AS DOUBLE) / w_total AS p_temp,
               CAST(w AS DOUBLE) / w_total * corpus_docs / n_docs AS boost
        FROM gw CROSS JOIN tot
    """,
    "doc_probe_gram": (lambda: (
        "WITH f AS (SELECT CAST(1 AS BIGINT) AS f0, "
        "CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(string_split_regex(trim(text), ' +')) END AS BIGINT) AS f1, "
        "CAST(length(text) AS BIGINT) AS f2, "
        "CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')) "
        "AS BIGINT) AS f3, "
        "CAST(len(list_filter(string_split_regex(trim(text), ' +'), "
        "t -> list_contains(['the','a','of','and','to','in','is','it'], t))) "
        "AS BIGINT) AS f4, "
        "CAST((lang = 'en') AS BIGINT) AS y FROM documents) "
        + " UNION ALL ".join(
            [
                f"SELECT 'xx_{i}_{j}' AS stat, CAST(SUM(f{i} * f{j}) AS BIGINT)"
                f" AS value FROM f"
                for i in range(5)
                for j in range(i, 5)
            ]
            + [
                f"SELECT 'xy_{i}' AS stat, CAST(SUM(f{i} * y) AS BIGINT)"
                f" AS value FROM f"
                for i in range(5)
            ]
            + ["SELECT 'yy' AS stat, CAST(SUM(y * y) AS BIGINT) AS value FROM f"]
        )
    ))(),
    "doc_probe_ridge_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS counts_match,
               TRUE AS mse_nonneg, TRUE AS r2_in_range
        FROM documents
    """,
    "docs_csv_roundtrip": """
        WITH h AS (SELECT lang, n_chars, md5(text) AS h FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(((((((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1))) AS BIGINT) AS text_fp_sum
        FROM h GROUP BY lang
    """,
    # systematic PPS on the n_chars tape in doc_id order: a doc is selected
    # iff a stride multiple lands in its weight interval — exact integer
    # arithmetic end to end (stride = total div 100, floored at 1)
    "doc_sample_weighted": """
        WITH tot AS (SELECT greatest(CAST(SUM(n_chars) AS BIGINT) // 100, 1)
                         AS stride FROM documents),
        c AS (SELECT doc_id, n_chars,
                     CAST(SUM(n_chars) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - n_chars AS BIGINT) AS cum
              FROM documents)
        SELECT doc_id, n_chars,
               CAST((cum + stride - 1) // stride AS BIGINT) AS sample_rank
        FROM c CROSS JOIN tot
        WHERE n_chars > 0
          AND (cum + n_chars - 1) // stride >= (cum + stride - 1) // stride
    """,
    "text_zipf_fit": f"""
        WITH vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                       FROM (SELECT unnest({_TOKENS}) AS w FROM documents
                             WHERE trim(text) <> '')
                       GROUP BY 1),
        xy AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w ASC)
                              AS DOUBLE)) AS x,
                      ln(CAST(c AS DOUBLE)) AS y
               FROM vocab),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
              FROM xy)
        SELECT n AS n_vocab,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
               round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                           / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
                     / CAST(n AS DOUBLE), 6) AS intercept,
               round(((CAST(n AS DOUBLE) * sxy - sx * sy)
                      * (CAST(n AS DOUBLE) * sxy - sx * sy))
                     / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
        FROM m
    """,
    # round-11: containment — same shingle CTE as the Jaccard oracles;
    # C = i / min(n1, n2), no length filter by design
    "doc_containment_pairs": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        sh0 AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 1, 1)),
                    i -> w[i] || '|' || w[i+1] || '|' || w[i+2]) shl FROM t),
        sh AS (SELECT DISTINCT doc_id, unnest(shl) s FROM sh0),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id d1, b.doc_id d2, CAST(COUNT(*) AS BIGINT) i
                  FROM sh a JOIN sh b USING (s)
                  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        cont AS (SELECT d1, d2, least(s1.n, s2.n) AS n_small,
                        round(CAST(i AS DOUBLE) / least(s1.n, s2.n), 6)
                            AS containment
                 FROM inter JOIN sizes s1 ON d1 = s1.doc_id
                            JOIN sizes s2 ON d2 = s2.doc_id)
        SELECT d1, d2, n_small, containment FROM cont WHERE containment >= 0.8
    """,
    # round-12: planted-edit coverage for the perceptual near-dup path —
    # the oracle pins n_planted (the >=8-byte doc count) and the boolean,
    # like the embedding near-dup twins; the dHash fold itself is the
    # engine-side claim
    "multimodal_near_dup_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, TRUE AS coverage_ok
        FROM documents
        WHERE text IS NOT NULL AND octet_length(encode(text)) >= 8
    """,
    # round-15: the raster-fixture generation law restated verbatim —
    # w = doc_id%13+4, h = doc_id%11+4, pixel i = (doc_id*7 + i*13)%256,
    # even doc_id -> PGM, odd -> BMP. The engine side must genuinely
    # parse the container bytes to reproduce these sums.
    "multimodal_decode_census": """
        WITH dims AS (SELECT doc_id, source,
                             doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h
                      FROM documents),
        px AS (SELECT doc_id, unnest(range(0, w * h)) AS i FROM dims),
        sums AS (SELECT doc_id,
                        SUM((doc_id * 7 + i * 13) % 256) AS ps
                 FROM px GROUP BY doc_id)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(w) AS BIGINT) AS sum_width,
               CAST(SUM(h) AS BIGINT) AS sum_height,
               CAST(SUM(ps) AS BIGINT) AS sum_pixels,
               CAST(COUNT(*) FILTER (doc_id % 2 = 1) AS BIGINT) AS n_bmp,
               CAST(COUNT(*) FILTER (doc_id % 2 = 0) AS BIGINT) AS n_pgm
        FROM dims JOIN sums USING (doc_id) GROUP BY source
    """,
    # round-15: the oracle pins the plant count and the guaranteed-by-
    # construction booleans (see multimodal_decode_edit_check docstring)
    "multimodal_decode_edit_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
               TRUE AS brightness_ok, TRUE AS crop_ok
        FROM documents
    """,
    # round-11: byte-identical payload dedup — sha-256 hex on both engines
    "multimodal_payload_dedup": """
        SELECT sha256(text) AS fp,
               CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY 1
    """,
    # round-11: PMI collocations — bigram derivation is the
    # text_bigram_surprisal CTE; counts exact, ln last, round BEFORE the
    # (pmi desc, w1, w2) total-order cut so both engines cut identically
    "text_pmi_collocations": """
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w
                   FROM documents WHERE trim(text) <> ''),
        pos AS (SELECT doc_id, unnest(range(1, len(w))) AS i, w
                FROM t WHERE len(w) >= 2),
        bg AS (SELECT w[i] AS w1, w[i + 1] AS w2 FROM pos),
        pairs AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                  FROM bg GROUP BY 1, 2),
        cl AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS cl FROM pairs GROUP BY 1),
        cr AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS cr FROM pairs GROUP BY 1),
        nn AS (SELECT CAST(SUM(c12) AS BIGINT) AS nn FROM pairs)
        SELECT w1, w2, c12,
               round(ln(CAST(c12 AS DOUBLE) * CAST(nn AS DOUBLE)
                        / (CAST(cl AS DOUBLE) * CAST(cr AS DOUBLE))), 6) AS pmi
        FROM pairs JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN nn
        WHERE c12 >= 5
        ORDER BY pmi DESC, w1, w2 LIMIT 200
    """,
    # round-11: per-doc word entropy — c*ln(c) terms frozen to the exact
    # 1e-9 integer grid before summing (order-free), assembly mirrored
    "text_word_entropy": """
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w
                   FROM documents WHERE trim(text) <> ''),
        wc AS (SELECT doc_id, unnest(w) AS word FROM t),
        cnt AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c
                FROM wc GROUP BY 1, 2),
        pd AS (SELECT doc_id,
                      CAST(SUM(c) AS BIGINT) AS n_tokens,
                      CAST(COUNT(*) AS BIGINT) AS n_distinct,
                      CAST(SUM(CAST(round(CAST(c AS DOUBLE)
                                          * ln(CAST(c AS DOUBLE)) * 1e9)
                               AS BIGINT)) AS BIGINT) AS clnc_1e9
               FROM cnt GROUP BY 1),
        e AS (SELECT doc_id, n_tokens, n_distinct,
                     ln(CAST(n_tokens AS DOUBLE))
                       - (CAST(clnc_1e9 AS DOUBLE) / 1e9)
                         / CAST(n_tokens AS DOUBLE) AS raw
              FROM pd)
        SELECT doc_id, n_tokens, n_distinct, round(raw, 6) AS entropy,
               round(CASE WHEN n_distinct > 1
                          THEN raw / ln(CAST(n_distinct AS DOUBLE)) END,
                     6) AS norm_entropy
        FROM e
    """,
}
