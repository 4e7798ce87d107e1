"""Text-analysis operator tests: Python recomputation as the per-doc oracle."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from symat_hbase_tools_spark.functions.text import FINGERPRINT_MOD, STOPWORDS
from symat_hbase_tools_spark.operators import text_analysis
from tests.conftest import SF_DIR


def py_quality(text: str) -> dict:
    toks = re.split(" +", text.strip()) if text.strip() else []
    n_tokens = len(toks)
    word_chars = len(text.replace(" ", ""))
    n_chars = len(text)
    non_word = n_chars - len(re.sub("[^a-z ]", "", text))
    stop_hits = sum(t in STOPWORDS for t in toks)
    return {
        "n_tokens": n_tokens,
        "avg_word_len": word_chars / n_tokens if n_tokens else 0.0,
        "stopword_ratio": stop_hits / n_tokens if n_tokens else 0.0,
        "punct_ratio": non_word / n_chars if n_chars else 0.0,
        "quality_score": min(n_tokens / 100.0, 1.0) * 0.5
        + (stop_hits / n_tokens if n_tokens else 0.0) * 0.3
        + (1 - (non_word / n_chars if n_chars else 0.0)) * 0.2,
    }


def test_quality_score_matches_python(spark, documents):
    sample = {r["doc_id"]: r["text"] for r in documents.limit(20).collect()}
    out = {
        r["doc_id"]: r.asDict()
        for r in text_analysis.quality_score(spark, SF_DIR).collect()
        if r["doc_id"] in sample
    }
    for doc_id, text in sample.items():
        want = py_quality(text)
        got = out[doc_id]
        for k, v in want.items():
            assert got[k] == v, f"doc {doc_id} {k}: {got[k]} != {v}"


def test_fingerprint_matches_python(spark, documents):
    sample = {r["doc_id"]: r["text"] for r in documents.limit(20).collect()}
    out = {r["doc_id"]: r["fp"] for r in text_analysis.doc_fingerprints(spark, SF_DIR).collect()}
    for doc_id, text in sample.items():
        h = 0
        for ch in text:
            h = (h * 31 + ord(ch)) % FINGERPRINT_MOD
        assert out[doc_id] == h


def test_lang_id_labels(spark):
    out = text_analysis.lang_id(spark, SF_DIR).collect()
    valid = {"zh", "ja", "ru", "ar", "de", "es", "en", "unknown"}
    assert all(r["predicted"] in valid for r in out)
    assert sum(r["n_docs"] for r in out) == 500


def test_lang_id_script_rules(spark):
    from symat_hbase_tools_spark.operators.text_analysis import lang_id_expr

    df = spark.createDataFrame(
        [("这是中文文本",), ("これは日本語です",), ("это русский текст",),
         ("هذا نص عربي",), ("der hund und die katze",), ("el gato la casa",),
         ("the quick brown fox of doom",), ("zzz qqq xxx",)],
        "text string",
    )
    got = [r["p"] for r in df.select(lang_id_expr(F.col("text")).alias("p")).collect()]
    assert got == ["zh", "ja", "ru", "ar", "de", "es", "en", "unknown"]


def test_token_stats_consistency(spark, documents):
    out = text_analysis.token_stats(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in out) == documents.count()
    total_chars = documents.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["total_chars"] for r in out) == total_chars
    for r in out:
        assert r["avg_tokens"] == r["total_tokens"] / r["n_docs"]
        assert r["total_bpe_tokens"] >= r["total_tokens"]  # >=1 BPE token per word


def test_repetition_signals_match_python(spark, documents):
    sample = {r["doc_id"]: r["text"] for r in documents.limit(20).collect()}
    out = {
        r["doc_id"]: r.asDict()
        for r in text_analysis.repetition_signals(spark, SF_DIR).collect()
    }
    assert len(out) == documents.count()  # every doc present, even empty ones
    for doc_id, text in sample.items():
        toks = re.split(" +", text.strip()) if text.strip() else []
        got = out[doc_id]
        assert got["n_tokens"] == len(toks)
        assert got["n_distinct"] == len(set(toks))
        if toks:
            from collections import Counter

            top_uni = Counter(toks).most_common(1)[0][1]
            assert got["top_unigram_frac"] == top_uni / len(toks)
            assert got["distinct_ratio"] == len(set(toks)) / len(toks)
        if len(toks) > 1:
            bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            top_bi = Counter(bigrams).most_common(1)[0][1]
            assert got["top_bigram_frac"] == top_bi / (len(toks) - 1)


def test_mixture_weights_sum_to_one(spark):
    rows = text_analysis.mixture_weights(spark, SF_DIR).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    # resampled doc mass (n_docs * weight) is uniform across groups
    masses = {round(r["n_docs"] * r["weight"], 6) for r in rows}
    assert len(masses) == 1


def test_length_histogram_covers_corpus(spark, documents):
    rows = text_analysis.length_histogram(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == documents.count()
    for r in rows:
        assert r["bucket_lo"] == r["bucket"] * 200
        assert r["bucket_lo"] <= r["min_chars"] <= r["max_chars"] < r["bucket_lo"] + 200


def test_boilerplate_shingles_are_document_frequencies(spark, documents):
    rows = text_analysis.boilerplate_shingles(spark, SF_DIR, k=5).collect()
    assert len(rows) == 5
    freqs = [r["doc_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # spot-check the top shingle's doc frequency by direct containment scan
    top = rows[0]
    words = top["shingle"].split("|")
    needle = " ".join(words)
    n = documents.filter(F.col("text").contains(needle)).count()
    # containment can overcount (substring of longer words) but never undercount
    assert n >= top["doc_freq"]


def test_clean_text_expr_on_dirty_input(spark):
    from symat_hbase_tools_spark.operators.text_analysis import clean_text_expr

    df = spark.createDataFrame(
        [("  hello\t\tworld \x00\x1f!\n\nnew  line  ",),
         ("already clean",),
         ("\x07\x08\x0b",)],
        "text string",
    )
    got = [r["c"] for r in df.select(clean_text_expr(F.col("text")).alias("c")).collect()]
    assert got == ["hello world ! new line", "already clean", ""]


def test_vocab_coverage_rates(spark):
    from symat_hbase_tools_spark.operators.text_analysis import vocab_coverage

    out = vocab_coverage(spark, SF_DIR, vocab_size=10).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_tokens"] > 0 and 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) < 1e-15
    # a vocab covering every distinct token leaves nothing OOV
    full = vocab_coverage(spark, SF_DIR, vocab_size=10_000).collect()
    assert all(r["n_oov"] == 0 for r in full)


def test_nfc_udf_idempotent_and_matches_duckdb(spark):
    """NFC properties on adversarial inputs: idempotence (NFC(NFC(x)) ==
    NFC(x)) and exact agreement with DuckDB's utf8proc nfc_normalize —
    the cross-engine claim text_nfc_clean's oracle rests on."""
    import duckdb
    import unicodedata

    from symat_hbase_tools_spark.operators.text_analysis import nfc_normalize_udf

    cases = [
        "plain ascii",
        "à la carte",          # decomposed grave -> a-grave
        "école",               # decomposed acute
        "école",                # already composed
        "ṩ",                    # s with dot below and dot above (composed)
        "ṩ",             # same, fully decomposed
        "ṩ",             # same marks, swapped order (canonical reorder)
        "ﬁne",                  # fi ligature: NFC leaves compat chars alone
        "Å",              # A + ring -> Å
        "ﬀ̨́q̀",      # combining soup after a ligature
        "",
        "mixed à and à forms",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    nfc = nfc_normalize_udf()
    out = {r["i"]: r["n"] for r in df.select("i", nfc(F.col("s")).alias("n")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(cases):
        want = unicodedata.normalize("NFC", s)
        duck = con.execute("select nfc_normalize(?)", [s]).fetchone()[0]
        assert out[i] == want, f"case {i}: engine != python NFC"
        assert duck == want, f"case {i}: duckdb != python NFC"
        assert unicodedata.normalize("NFC", want) == want, f"case {i}: not idempotent"


def test_text_nfc_clean_flags_decorated_docs_only(spark, documents):
    out = {r["doc_id"]: r for r in text_analysis.text_nfc_clean(spark, SF_DIR).collect()}
    raw = {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}
    for doc_id, r in out.items():
        decorated = doc_id % 3 == 0 and "a" in raw[doc_id]
        assert r["changed"] == decorated
        if decorated:
            # every decomposed 'a'+U+0300 recomposes: one code point saved per 'a'
            assert r["cp_before"] - r["cp_after"] == raw[doc_id].count("a")
        else:
            assert r["cp_before"] == r["cp_after"]


def test_stopword_hits_boundary_cases(spark):
    """The codegen'd regex count == a plain Python token count, on
    boundary-adversarial inputs (consecutive stopwords, edges, runs of
    spaces, stopwords embedded in longer words)."""
    from symat_hbase_tools_spark.functions.text import STOPWORDS, stopword_hits

    cases = [
        "",
        "the",
        " the ",
        "the the the",
        "of the",
        "a of the a",
        "athe thea theb the",
        "x  the   a  y",
        "  leading the and trailing a  ",
        "to in is it of and a the",
        "no stop words here",
        "a",
        " a",
        "a ",
        "it it it it it",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    out = df.select("i", stopword_hits(F.col("s")).alias("n")).collect()
    for r in out:
        s = cases[r["i"]]
        want = sum(1 for t in s.split() if t in STOPWORDS)
        assert r["n"] == want, f"{s!r}: got={r['n']} want={want}"


def test_unigram_logprob_matches_python(spark, documents):
    import math
    from collections import Counter

    texts = {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}
    counts = Counter(t for s in texts.values() for t in s.split())
    n_corpus = sum(counts.values())
    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_neg_logprob"])
        for r in text_analysis.unigram_logprob(spark, SF_DIR).collect()
    }
    checked = 0
    for doc_id, s in texts.items():
        toks = s.split()
        if not toks:
            assert doc_id not in out
            continue
        want = sum(-math.log(counts[t] / n_corpus) for t in toks) / len(toks)
        got_n, got_avg = out[doc_id]
        assert got_n == len(toks)
        assert abs(got_avg - want) < 1e-5
        checked += 1
    assert checked > 0


def test_bpe_pair_stats_match_python(spark, documents):
    from collections import Counter

    texts = [r["text"] for r in documents.select("text").collect()]
    counts = Counter()
    for s in texts:
        toks = s.split()
        counts.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r["pair"], r["pair_count"])
        for r in text_analysis.bpe_pair_stats(spark, SF_DIR).collect()
    ]
    assert got == want


def test_bpe_pair_stats_short_docs_contribute_nothing(spark):
    df_texts = ["one", "", "  ", "two words", "a b c"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(df_texts)], "doc_id long, text string"
    )
    # route through the same expression stack via a temp dir-independent call:
    from symat_hbase_tools_spark.functions.text import tokens

    toks = tokens(F.col("text"))
    n = F.size(toks)
    zipped = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = df.select(F.explode(zipped).alias("z")).select(
        F.concat_ws(" ", F.col("z.w1"), F.col("z.w2")).alias("pair")
    )
    got = sorted(r["pair"] for r in pairs.collect())
    assert got == ["a b", "b c", "two words"]


def test_tfidf_topk_ranks_by_score_then_term(spark):
    out = text_analysis.tfidf_topk(spark, SF_DIR).collect()
    assert out, "tfidf produced no rows"
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        keys = [(-r["score"], r["term"]) for r in rows]
        assert keys == sorted(keys), f"doc {doc_id} not rank-ordered"


def test_quality_classifier_matches_python(spark, documents):
    import hashlib

    texts = {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}
    out = {
        r["doc_id"]: (r["n_tokens"], r["wsum"], r["score"], r["keep"])
        for r in text_analysis.quality_classifier(spark, SF_DIR).collect()
    }
    checked = 0
    for doc_id, s in texts.items():
        toks = s.split()
        if not toks:
            assert doc_id not in out
            continue
        wsum = 0
        for t in toks:
            h = hashlib.md5(f"cls7\x1f{t}".encode()).hexdigest()
            wsum += int(h[:2], 16) - 128
        n, got_wsum, score, keep = out[doc_id]
        assert (n, got_wsum) == (len(toks), wsum)
        assert score == wsum / (256.0 * len(toks))
        assert keep == (score > 0)
        checked += 1
    assert checked > 0


def test_chunk_census_matches_python(spark, documents):
    import hashlib

    CH, ST = 32, 24
    texts = {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}
    want = {}
    for doc_id, s in texts.items():
        toks = s.split()
        n = len(toks)
        if n == 0:
            continue
        n_chunks = -(-n // ST)
        for i in range(n_chunks):
            cw = toks[i * ST : i * ST + CH]
            want[(doc_id, i)] = (
                i * ST,
                len(cw),
                hashlib.md5(" ".join(cw).encode()).hexdigest(),
            )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start_tok"], r["chunk_tokens"], r["chunk_fp"])
        for r in text_analysis.chunk_census(spark, SF_DIR).collect()
    }
    assert got == want
    # overlap invariant: consecutive chunks share CH - ST tokens of context
    assert any(v[1] == CH for v in got.values())


def test_bpe_learn_merges_matches_python_reference(spark, documents):
    from collections import Counter

    from symat_hbase_tools_spark.operators import bpe

    words = Counter()
    for r in documents.select("text").collect():
        words.update(r["text"].split())

    def ref_merges(word_freq, n):
        vocab = {tuple(w): f for w, f in word_freq.items()}
        out = []
        for rank in range(n):
            pairs = Counter()
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += f
            if not pairs:
                break
            (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, a, b, cnt))
            new_vocab = {}
            for syms, f in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                key = tuple(merged)
                new_vocab[key] = new_vocab.get(key, 0) + f
            vocab = new_vocab
        return out

    want = ref_merges(words, 6)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe.learn_merges(spark, SF_DIR, n_merges=6).collect()
    ]
    assert got == want
    # merges actually compose: later merges may consume earlier merge symbols
    assert len(got) == 6


def test_bpe_tokenize_census_matches_python(spark, documents):
    from collections import Counter

    from symat_hbase_tools_spark.operators import bpe

    merges = [
        (r["left"], r["right"])
        for r in bpe.learn_merges(spark, SF_DIR, n_merges=8).collect()
    ]

    def word_tokens(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want: dict = {}
    for r in documents.select("lang", "source", "n_chars", "text").collect():
        key = (r["lang"], r["source"])
        d = want.setdefault(key, [0, 0, 0])
        d[0] += 1
        d[1] += r["n_chars"]
        d[2] += sum(word_tokens(w) for w in r["text"].split())
    got = {
        (r["lang"], r["source"]): [r["n_docs"], r["total_chars"], r["total_bpe_tokens"]]
        for r in bpe.tokenize_census(spark, SF_DIR, n_merges=8).collect()
    }
    assert got == want
    # BPE must compress: fewer tokens than characters
    for (n, ch, tok) in got.values():
        assert tok < ch


def test_zipf_fit_recovers_zipfian_slope(spark, tmp_path):
    """A synthetic corpus with freq(rank) ~ rank^-1 must fit slope ~ -1
    with high r^2; the op is the corpus-health diagnostic."""
    words = []
    for rank in range(1, 101):
        words += [f"w{rank:03d}"] * max(1, round(1000 / rank))
    rows = [(i, " ".join(words[i::50]), "en", "src", 1) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "zipf")
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from symat_hbase_tools_spark.operators.text_analysis import zipf_fit

    row = zipf_fit(spark, sf_dir).first()
    assert row["n_vocab"] == 100
    assert -1.15 < row["slope"] < -0.85, row
    assert row["r2"] > 0.95, row


def test_token_budget_select_is_greedy_quality_prefix(spark):
    """The selection must be exactly the greedy prefix of the quality
    ordering: ranks 1..m contiguous, running token sum exact, within
    budget, and the NEXT document (if any) would overshoot it."""
    from symat_hbase_tools_spark.operators.text_analysis import (
        quality_classifier,
        token_budget_select,
    )

    all_docs = (
        quality_classifier(spark, SF_DIR)
        .toPandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = int(all_docs["n_tokens"].sum())
    budget = total // 2

    sel = (
        token_budget_select(spark, SF_DIR)
        .orderBy("sel_rank")
        .toPandas()
    )
    m = len(sel)
    assert list(sel["sel_rank"]) == list(range(1, m + 1))
    assert list(sel["doc_id"]) == list(all_docs["doc_id"][:m])
    running = all_docs["n_tokens"][:m].cumsum()
    assert list(sel["cum_tokens"]) == list(running)
    assert int(sel["cum_tokens"].iloc[-1]) <= budget
    if m < len(all_docs):
        overshoot = int(running.iloc[-1]) + int(all_docs["n_tokens"][m])
        assert overshoot > budget


def test_preference_pairs_semantics(spark):
    """chosen is the strict-best-scoring doc of its domain and rejected the
    strict-worst (doc_id tie-breaks), margin is their score gap, and every
    all-tied or singleton domain is absent (no zero-margin pairs)."""
    from symat_hbase_tools_spark.operators.text_analysis import (
        preference_pairs,
        quality_classifier,
    )
    from symat_hbase_tools_spark.sources.tables import load_table

    pairs = {
        (r["lang"], r["source"]): r
        for r in preference_pairs(spark, SF_DIR).collect()
    }
    scores = quality_classifier(spark, SF_DIR).select("doc_id", "score")
    dims = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source"
    )
    pdf = scores.join(dims, "doc_id").toPandas()
    for (lang, source), sub in pdf.groupby(["lang", "source"]):
        sub = sub.sort_values(["score", "doc_id"], ascending=[False, True])
        lo = sub.sort_values(["score", "doc_id"], ascending=[True, True])
        chosen, rejected = sub.iloc[0], lo.iloc[0]
        key = (lang, source)
        if chosen["score"] - rejected["score"] <= 0:
            assert key not in pairs
            continue
        got = pairs[key]
        assert got["chosen_id"] == chosen["doc_id"]
        assert got["rejected_id"] == rejected["doc_id"]
        assert abs(got["margin"] - (chosen["score"] - rejected["score"])) == 0.0
        assert got["n_docs"] == len(sub)
        assert got["margin"] > 0


def test_curriculum_order_interleaves_languages(spark):
    """Within a language, curriculum order is ascending difficulty
    (n_tokens, doc_id); globally, every language's k-th easiest doc
    precedes any language's (k+1)-th — the interleave property."""
    from symat_hbase_tools_spark.operators.text_analysis import curriculum_order

    rows = curriculum_order(spark, SF_DIR).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["lang_rank"])
        assert [r["lang_rank"] for r in rs] == list(range(1, len(rs) + 1))
        diffs = [(r["n_tokens"], r["doc_id"]) for r in rs]
        assert diffs == sorted(diffs)
    # interleave: curriculum position sorts by (lang_rank, lang)
    sched = sorted(rows, key=lambda r: r["curriculum_rank"])
    keys = [(r["lang_rank"], r["lang"]) for r in sched]
    assert keys == sorted(keys)
    assert [r["curriculum_rank"] for r in sched] == list(range(1, len(rows) + 1))


def test_dsir_select_prefers_target_language(spark):
    """DSIR importance weights must rank target-language (en) documents
    above the corpus at large: the mean PER-TOKEN log-ratio of en docs
    exceeds the non-en mean (the absolute level is negative for all —
    add-1 smoothing penalizes the smaller target model; only the
    relative order is meaningful), and the selected top-fifth is
    en-enriched relative to the corpus share. Selection count is exactly
    floor(n_docs / 5) with the deterministic (per-token weight, doc_id)
    order."""
    from symat_hbase_tools_spark.operators.text_analysis import dsir_select

    rows = dsir_select(spark, SF_DIR).collect()
    n = len(rows)
    sel = [r for r in rows if r["selected"]]
    assert len(sel) == n // 5
    en = [r["lw_per_token"] for r in rows if r["lang"] == "en"]
    other = [r["lw_per_token"] for r in rows if r["lang"] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)
    en_share_sel = sum(1 for r in sel if r["lang"] == "en") / len(sel)
    en_share_all = len(en) / n
    assert en_share_sel > en_share_all
    # the selected set IS the top-m by (per-token weight desc, doc_id);
    # the division is double-over-identical-bigints, so no boundary
    # ambiguity
    ordered = sorted(rows, key=lambda r: (-r["lw_per_token"], r["doc_id"]))
    assert {r["doc_id"] for r in sel} == {
        r["doc_id"] for r in ordered[: n // 5]
    }
    for r in rows:
        assert r["lw_per_token"] == r["logw_micros"] / r["n_tokens"]


def test_ccnet_buckets_are_rank_terciles_per_language(spark):
    """Per language: bucket sizes differ by at most 1 (ntile semantics,
    head gets the remainder first), every head score <= every middle
    score <= every tail score (with doc_id tie-break consistency), and
    all scored docs are bucketed."""
    from symat_hbase_tools_spark.operators.text_analysis import ccnet_buckets

    rows = ccnet_buckets(spark, SF_DIR).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) == 5
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        sizes = [
            sum(1 for r in rs if r["ppl_bucket"] == b)
            for b in ("head", "middle", "tail")
        ]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert sorted(sizes, reverse=True) == sizes, (lang, sizes)
        # bucket order agrees with the (score, doc_id) total order
        rs.sort(key=lambda r: (round(r["avg_surprisal"] * 1e6), r["doc_id"]))
        buckets = [order[r["ppl_bucket"]] for r in rs]
        assert buckets == sorted(buckets), lang


def test_tokenizer_fertility_matches_python(spark, documents):
    """Fertility census vs a plain-python recomputation on the collected
    corpus: exact integer sums, ratio identities, and the fertility >= 1
    invariant (every word is at least one subword token)."""
    import math

    got = {
        r["lang"]: r
        for r in text_analysis.tokenizer_fertility(spark, SF_DIR).collect()
    }
    by_lang: dict = {}
    for r in documents.collect():
        t = (r["text"] or "").strip()
        if not t:
            continue
        words = [w for w in t.split() if w]
        n_s = sum(math.ceil(len(w) / 4) for w in words)
        d = by_lang.setdefault(r["lang"], [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(words)
        d[2] += n_s
        d[3] += len(r["text"].encode("utf-8"))
    assert set(got) == set(by_lang)
    for lang, (n_docs, n_w, n_s, n_b) in by_lang.items():
        g = got[lang]
        assert (g["n_docs"], g["n_words"], g["n_subtokens"], g["n_bytes"]) == (
            n_docs,
            n_w,
            n_s,
            n_b,
        ), lang
        assert g["fertility"] == n_s / n_w >= 1.0
        assert g["bytes_per_subtoken"] == n_b / n_s


def test_ngram_novelty_matches_python(spark, documents):
    """First-occurrence attribution vs a python recomputation: owners are
    min-doc_id per distinct trigram shingle, novelty ratios divide the
    exact counts, and the corpus-level identity holds (sum of owned =
    number of distinct shingles in the corpus)."""
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_owned"], r["novelty"])
        for r in text_analysis.ngram_novelty(spark, SF_DIR).collect()
    }
    owner: dict = {}
    per_doc: dict = {}
    for r in sorted(documents.collect(), key=lambda r: r["doc_id"]):
        words = (r["text"] or "").strip().split()
        shingles = {
            "|".join(words[i : i + 3]) for i in range(len(words) - 2)
        }
        if not shingles:
            continue
        per_doc[r["doc_id"]] = shingles
        for s in shingles:
            owner.setdefault(s, r["doc_id"])
    assert set(got) == set(per_doc)
    total_owned = 0
    for doc_id, shingles in per_doc.items():
        n_owned = sum(1 for s in shingles if owner[s] == doc_id)
        ns, no, nov = got[doc_id]
        assert (ns, no) == (len(shingles), n_owned), doc_id
        assert nov == n_owned / len(shingles)
        total_owned += n_owned
    assert total_owned == len(owner)


def test_word_entropy_boundary_distributions(spark, tmp_path, monkeypatch):
    """Entropy boundaries: an all-one-word doc has entropy 0 and NULL
    normalized entropy (no scale at n_distinct=1); an all-distinct doc has
    entropy ln(n) and normalized entropy exactly 1."""
    import math

    from symat_hbase_tools_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [
            (1, "dup dup dup dup dup dup", "en", "s", 23),
            (2, "one two three four five six seven eight", "en", "s", 39),
            (3, "a a a b b c", "en", "s", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "ent")
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = {r["doc_id"]: r for r in ta.word_entropy(spark, sf_dir).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["norm_entropy"] is None
    assert out[2]["entropy"] == round(math.log(8), 6)
    assert out[2]["norm_entropy"] == 1.0
    # mixed doc: -sum p ln p over (3/6, 2/6, 1/6)
    want = -sum(c / 6 * math.log(c / 6) for c in (3, 2, 1))
    assert abs(out[3]["entropy"] - want) < 1e-6
    assert out[3]["n_tokens"] == 6 and out[3]["n_distinct"] == 3


def test_pmi_collocations_exclusive_pair_tops(spark, tmp_path):
    """A bigram that ALWAYS co-occurs exclusively maximizes PMI: with
    cl(w1)=cr(w2)=c12, pmi = ln(N / c12) — the top collocation beats any
    pair whose parts also appear apart."""
    import math

    from symat_hbase_tools_spark.operators import text_analysis as ta

    # 'san francisco' x6 exclusive; filler gives 'the cat' diluted counts
    rows = []
    for i in range(6):
        rows.append((i, "san francisco is the cat place", "en", "s", 30))
    for i in range(6, 12):
        rows.append((i, "the dog saw the cat and the bird", "en", "s", 32))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "pmi")
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = ta.pmi_collocations(spark, sf_dir, min_count=5, top_k=10).collect()
    assert out, "no collocations above min_count"
    # every FULLY exclusive pair (cl = cr = c12) ties at the maximum
    # pmi = ln(N / c12); (san, francisco) must be in that top group, and
    # diluted pairs (e.g. involving 'the'/'cat', which appear in multiple
    # contexts) must score strictly lower
    n_bigrams = 6 * 5 + 6 * 7  # 6 docs x 5 bigrams + 6 docs x 7 bigrams
    top_pmi = out[0]["pmi"]
    assert top_pmi == round(math.log(n_bigrams / 6), 6)
    top_group = {(r["w1"], r["w2"]) for r in out if r["pmi"] == top_pmi}
    assert ("san", "francisco") in top_group
    assert all(
        r["pmi"] < top_pmi for r in out if "the" in (r["w1"], r["w2"])
    )


def test_unigram_learn_matches_python_reference(spark, documents):
    """Engine unigram-LM EM (seed -> Viterbi E-step -> prune, Kudo 2018
    hard-EM variant) == an independent pure-python implementation of the
    same spec, rank by rank: seed = top substring counts (len 1..6,
    every occurrence, weighted by word freq); E-step = max-likelihood
    segmentation with ties to the longest last piece; prune = keep top
    75% of live multi-char pieces per round, exact budget on the last,
    single chars floored at count 1."""
    import math
    from collections import Counter

    from symat_hbase_tools_spark.operators import unigram

    words = Counter()
    for r in documents.select("text").collect():
        words.update(r["text"].split())

    MAXL, SEED_MULTI, VOCAB, ITERS = 6, 256, 96, 3

    def viterbi(word, logp):
        n = len(word)
        dp = [0.0] + [-math.inf] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            best, bj = -math.inf, -1
            for j in range(max(0, i - MAXL), i):
                lp = logp.get(word[j:i])
                if lp is None or dp[j] == -math.inf:
                    continue
                if dp[j] + lp > best:
                    best, bj = dp[j] + lp, j
            dp[i], back[i] = best, bj
        out, i = [], n
        while i > 0:
            out.append(word[back[i]:i])
            i = back[i]
        return out[::-1]

    subc: Counter = Counter()
    chars = set()
    for w, f in words.items():
        for i in range(len(w)):
            chars.add(w[i])
            for length in range(1, min(MAXL, len(w) - i) + 1):
                subc[w[i:i + length]] += f
    multi = sorted(
        ((p, c) for p, c in subc.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:SEED_MULTI]
    counts = dict(multi)
    for ch in chars:
        counts[ch] = subc[ch]

    target_multi = max(0, VOCAB - len(chars))
    for it in range(ITERS):
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items()}
        newc: dict = {}
        for w, f in words.items():
            for p in viterbi(w, logp):
                newc[p] = newc.get(p, 0) + f
        live = sorted(
            ((p, c) for p, c in newc.items() if len(p) > 1 and c > 0),
            key=lambda x: (-x[1], x[0]),
        )
        keep_n = (
            target_multi
            if it == ITERS - 1
            else max(target_multi, math.ceil(len(live) * 0.75))
        )
        counts = dict(live[:keep_n])
        for ch in chars:
            counts[ch] = max(newc.get(ch, 0), 1)

    total = sum(counts.values())
    want = [
        (rank, p, c, round(math.log(c / total), 6))
        for rank, (p, c) in enumerate(
            sorted(counts.items(), key=lambda x: (-x[1], x[0]))
        )
    ]
    got = [
        (r["rank"], r["piece"], r["count"], r["logprob"])
        for r in unigram.learn_unigram(spark, SF_DIR).collect()
    ]
    assert got == want
    # the model actually learned multi-char pieces on a text corpus
    assert any(len(p) > 1 for _, p, _, _ in got)


def test_unigram_fertility_census_matches_python(spark, documents):
    """The fertility census under the learned vocab == per-lang python
    sums with the same Viterbi encode; unigram must compress (fertility
    strictly below chars-per-word)."""
    from symat_hbase_tools_spark.operators import unigram
    from symat_hbase_tools_spark.operators.unigram import _viterbi

    import re

    vocab = {
        r["piece"]: r["logprob"]
        for r in unigram.learn_unigram(spark, SF_DIR).collect()
    }
    maxl = max(len(p) for p in vocab)
    want: dict = {}
    for r in documents.select("lang", "text").collect():
        ws = [w for w in re.split(" +", r["text"].strip(" ")) if w]
        if not ws:
            continue
        d = want.setdefault(r["lang"], [0, 0, 0])
        d[0] += 1
        d[1] += len(ws)
        d[2] += sum(len(_viterbi(w, vocab, maxl)) for w in ws)
    got = {
        r["lang"]: [r["n_docs"], r["n_words"], r["n_pieces"]]
        for r in unigram.unigram_fertility_census(spark, SF_DIR).collect()
    }
    assert got == want
    for lang, (nd, nw, np_) in got.items():
        assert nw <= np_  # every word is at least one piece


def test_unigram_fertility_tab_newline_are_token_chars(spark, tmp_path):
    """Round-14 advice: the fertility kernel must tokenize with the
    family's ' +' regex on space-trimmed text — a tab or newline is a
    token CHARACTER, not a separator. 'aa\\tbb cc' is 2 words ('aa\\tbb',
    'cc'), where str.split() would have said 3."""
    from symat_hbase_tools_spark.operators import unigram

    rows = [(1, "aa\tbb cc", "en", "src", 8), (2, "dd\nee ff gg", "en", "src", 11)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = unigram.unigram_fertility_census(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 2
    assert got[0]["n_words"] == 5  # 2 + 3, not 3 + 4


def test_gopher_quality_flags_rule_by_rule(spark, tmp_path):
    """One doc per violated rule + one clean doc: each rule flips keep for
    exactly its own doc (thresholds: words in [50,1e5], mean word len in
    [3,10], symbol ratio <= 0.1, alpha frac >= 0.8, >= 2 distinct
    stopwords)."""
    from symat_hbase_tools_spark.operators.text_analysis import (
        gopher_quality_flags,
    )

    filler = " ".join(
        f"word{i:03d} the of" for i in range(20)
    )  # 60 tokens, mean len ~4.6, stopwords present
    rows = [
        (1, filler),                                             # clean: keep
        (2, "too short the of"),                                 # < 50 words
        (3, " ".join("ab" for _ in range(58)) + " the of"),      # mean len < 3
        (4, filler + " " + " ".join("#" for _ in range(10))),    # symbols
        (5, " ".join("123" for _ in range(58)) + " the of"),     # alpha < 0.8
        (6, " ".join(f"word{i:03d} extra pad" for i in range(20))),  # no stops
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in gopher_quality_flags(spark, str(tmp_path)).collect()
    }
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["n_words"] < 50
    assert got[3]["keep"] is False and got[3]["mean_word_len"] < 3.0
    assert got[4]["keep"] is False and got[4]["symbol_ratio"] > 0.1
    assert got[5]["keep"] is False and got[5]["alpha_frac"] < 0.8
    assert got[6]["keep"] is False and got[6]["n_stop_distinct"] < 2


def test_unigram_learns_obvious_piece_on_constructed_corpus(spark, tmp_path):
    """A corpus dominated by one repeated 4-char word: the trainer must
    keep 'abab' (or its halves) as high-rank multi-char pieces and the
    fertility census must show compression (pieces < chars)."""
    from symat_hbase_tools_spark.operators import unigram

    rows = [(i, "abab " * 30 + "xyzw", "en", "src", 125) for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    vocab = unigram.learn_unigram(spark, str(tmp_path)).collect()
    pieces = {r["piece"]: r["rank"] for r in vocab}
    multi = [p for p in pieces if len(p) > 1]
    assert multi, "no multi-char pieces learned"
    assert any(p in ("abab", "ab", "ba", "aba", "bab") for p in multi)
    fert = unigram.unigram_fertility_census(spark, str(tmp_path)).collect()
    assert len(fert) == 1
    r = fert[0]
    # 31 words/doc; 'abab' should encode in <= 2 pieces, far below 4 chars
    assert r["n_pieces"] < 3 * r["n_words"]


def test_gopher_quality_empty_text_is_dropped_not_crashed(spark, tmp_path):
    """Empty/whitespace-only docs: zero words -> every ratio 0.0, keep
    False; no division-by-zero or null leakage."""
    from symat_hbase_tools_spark.operators.text_analysis import (
        gopher_quality_flags,
    )

    rows = [(1, ""), (2, "   "), (3, "the of " * 30)]
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in gopher_quality_flags(spark, str(tmp_path)).collect()}
    assert got[1]["n_words"] == 0 and got[1]["keep"] is False
    assert got[2]["n_words"] == 0 and got[2]["keep"] is False
    assert got[2]["mean_word_len"] == 0.0 and got[2]["alpha_frac"] == 0.0
    assert got[3]["n_words"] == 60


def test_gopher_regex_counts_match_token_semantics(spark, tmp_path):
    """Round-15 regression for the regex rewrite of the alpha-free token
    count and distinct-stopword count: adversarial tokenization edges —
    consecutive alpha-free tokens, leading/trailing/multiple spaces,
    stopwords at string edges and back-to-back, mixed alnum tokens —
    must count exactly what the old per-token formulation counted
    (filter(words, w -> w.rlike('[a-z]')) / array_intersect(words,
    STOPWORDS))."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.functions.text import STOPWORDS, tokens
    from symat_hbase_tools_spark.operators.text_analysis import (
        gopher_quality_flags,
    )

    rows = [
        (1, "!! ?? 123 456 a1 b"),          # 2 alpha among 6; no stopwords
        (2, "  the of the  "),              # padded, consecutive stopwords
        (3, "of"),                          # single stopword = whole string
        (4, "x #### ... ## y"),             # symbol runs between alphas
        (5, "a-z 0-9 --- [a]"),             # punctuation-mixed tokens
        (6, "the!! the of9 andof in"),      # stopword-PREFIXED non-stopwords
        (7, "7 77 7a a7 _ __"),             # digit/underscore salad
    ]
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in gopher_quality_flags(spark, str(tmp_path)).collect()
    }
    # reference counts straight from the token array (the old formulation)
    ref = {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "documents.parquet"))
        .select(
            "doc_id",
            F.size(
                F.filter(tokens(F.col("text")), lambda w: w.rlike("[a-z]"))
            ).alias("alpha"),
            F.size(
                F.array_intersect(
                    tokens(F.col("text")),
                    F.array(*[F.lit(s) for s in STOPWORDS]),
                )
            ).alias("stops"),
            F.size(tokens(F.col("text"))).alias("n"),
        )
        .collect()
    }
    for i, _ in rows:
        assert got[i]["n_words"] == ref[i]["n"], i
        n = ref[i]["n"]
        assert got[i]["alpha_frac"] == (ref[i]["alpha"] / n if n else 0.0), i
        assert got[i]["n_stop_distinct"] == ref[i]["stops"], i


def test_gopher_plan_has_no_hof_and_no_split(spark):
    """Round-15 plan gate: the gopher rewrite removed every higher-order
    function AND the materialized token array — the executed plan must
    contain no lambdafunction and no split() other than inside
    token_count's size(split(...))."""
    from symat_hbase_tools_spark.entry import QUERIES
    from symat_hbase_tools_spark.plans.explain import plan_string

    plan = plan_string(
        QUERIES["doc_gopher_quality"](spark, SF_DIR), mode="simple"
    )
    assert "lambdafunction" not in plan, plan
    assert "array_intersect" not in plan, plan
    # map-only: one WholeStageCodegen project over the scan, no Exchange
    # beyond the fanout repartition
    assert "SortAggregate" not in plan and "Window" not in plan, plan
    # (split(trim(text)) appears once PER CONSUMER in the display; runtime
    # subexpression elimination shares the evaluation, so no count assert)


def test_unigram_sampled_fertility_and_temperature_limits(spark):
    """Subword-regularization census (round 14): deterministic across
    runs (word-type-keyed RNG), sampled piece counts bounded below by the
    word count, and the alpha -> inf limit collapses to the Viterbi
    census exactly."""
    from symat_hbase_tools_spark.operators import unigram

    a = {
        r["lang"]: (r["n_pieces_sampled"], r["n_pieces_viterbi"], r["n_words"])
        for r in unigram.unigram_sampled_fertility(spark, SF_DIR).collect()
    }
    b = {
        r["lang"]: (r["n_pieces_sampled"], r["n_pieces_viterbi"], r["n_words"])
        for r in unigram.unigram_sampled_fertility(spark, SF_DIR).collect()
    }
    assert a == b and a
    for ns, nv, nw in a.values():
        assert ns >= nw and nv >= nw
    hot = {
        r["lang"]: r["n_pieces_sampled"]
        for r in unigram.unigram_sampled_fertility(
            spark, SF_DIR, alpha=1e9
        ).collect()
    }
    assert hot == {k: nv for k, (ns, nv, nw) in a.items()}
    # a genuinely soft temperature diversifies at least one segmentation
    cold = {
        r["lang"]: r["n_pieces_sampled"]
        for r in unigram.unigram_sampled_fertility(
            spark, SF_DIR, alpha=0.01
        ).collect()
    }
    assert any(
        cold[k] != a[k][1] for k in cold
    ), "alpha=0.01 sampled exactly the Viterbi census — sampler inert?"


def test_unigram_large_budget_parity_at_sf01(spark):
    """Round-14 'realistic budget' run: at sf0.1 with a 1024-piece budget
    the corpus (31 distinct synthetic words, 259 distinct substrings)
    cannot fill it — the trainer must keep EVERY live multi-char piece,
    stay a probability model, and still match the pure-python reference
    rank by rank (the parity loop extended beyond census defaults)."""
    import math
    from collections import Counter

    import duckdb

    from symat_hbase_tools_spark.operators import unigram

    SF01 = "/root/testdata/sf0.1"
    got = [
        (r["rank"], r["piece"], r["count"], r["logprob"])
        for r in unigram.learn_unigram(
            spark, SF01, vocab_size=1024, seed_multi=4096
        ).collect()
    ]
    assert abs(sum(math.exp(lp) for *_, lp in got) - 1.0) < 1e-4

    words = Counter()
    con = duckdb.connect()
    for w, f in con.execute(
        "SELECT w, count(*) FROM (SELECT unnest(string_split_regex(trim(text),"
        f"' +')) AS w FROM read_parquet('{SF01}/documents.parquet')) "
        "WHERE w <> '' GROUP BY w"
    ).fetchall():
        words[w] = f
    want = _python_unigram_reference(words, vocab=1024, seed_multi=4096)
    assert got == want


def test_unigram_vocab_1k_on_rich_corpus(spark, tmp_path):
    """A corpus with enough lexical diversity for a REAL >= 1k vocabulary
    (the testdata's 31-word synthetic vocab cannot): 1500 distinct
    seeded pseudo-words. The trainer must fill >= 1000 pieces, keep the
    rank order, stay a probability model, and match the python reference
    rank by rank at this budget."""
    import math
    import random
    from collections import Counter

    from symat_hbase_tools_spark.operators import unigram

    rng = random.Random(7)
    alphabet = "abcdefghijklmnop"
    vocab_words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(4, 10)))
        for _ in range(1500)
    ]
    docs = [
        (i, " ".join(rng.choices(vocab_words, k=40)), "en", "s", 1)
        for i in range(300)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = [
        (r["rank"], r["piece"], r["count"], r["logprob"])
        for r in unigram.learn_unigram(
            spark, str(tmp_path), vocab_size=1100, seed_multi=4096
        ).collect()
    ]
    assert len(got) >= 1000, len(got)
    assert abs(sum(math.exp(lp) for *_, lp in got) - 1.0) < 1e-4

    words = Counter()
    for _, text, *_ in docs:
        words.update(text.split(" "))
    want = _python_unigram_reference(words, vocab=1100, seed_multi=4096)
    assert got == want


def _python_unigram_reference(words, vocab, seed_multi, maxl=6, iters=3):
    """The pure-python spec reference shared by the parity tests (same
    loop as test_unigram_learn_matches_python_reference, parameterized)."""
    import math

    def viterbi(word, logp):
        n = len(word)
        dp = [0.0] + [-math.inf] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            best, bj = -math.inf, -1
            for j in range(max(0, i - maxl), i):
                lp = logp.get(word[j:i])
                if lp is None or dp[j] == -math.inf:
                    continue
                if dp[j] + lp > best:
                    best, bj = dp[j] + lp, j
            dp[i], back[i] = best, bj
        out, i = [], n
        while i > 0:
            out.append(word[back[i]:i])
            i = back[i]
        return out[::-1]

    from collections import Counter

    subc: Counter = Counter()
    chars = set()
    for w, f in words.items():
        for i in range(len(w)):
            chars.add(w[i])
            for length in range(1, min(maxl, len(w) - i) + 1):
                subc[w[i:i + length]] += f
    multi = sorted(
        ((p, c) for p, c in subc.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_multi]
    counts = dict(multi)
    for ch in chars:
        counts[ch] = subc[ch]

    target_multi = max(0, vocab - len(chars))
    for it in range(iters):
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items()}
        newc: dict = {}
        for w, f in words.items():
            for p in viterbi(w, logp):
                newc[p] = newc.get(p, 0) + f
        live = sorted(
            ((p, c) for p, c in newc.items() if len(p) > 1 and c > 0),
            key=lambda x: (-x[1], x[0]),
        )
        keep_n = (
            target_multi
            if it == iters - 1
            else max(target_multi, math.ceil(len(live) * 0.75))
        )
        counts = dict(live[:keep_n])
        for ch in chars:
            counts[ch] = max(newc.get(ch, 0), 1)

    total = sum(counts.values())
    return [
        (rank, p, c, round(math.log(c / total), 6))
        for rank, (p, c) in enumerate(
            sorted(counts.items(), key=lambda x: (-x[1], x[0]))
        )
    ]


def test_unigram_sample_check_survives_tied_lattices(spark, tmp_path):
    """Exactly-tied segmentations (['a','aaa'] vs ['aaa','a'] on 'aaaa')
    make the zero-temperature limit ambiguous up to ties — the check's
    greedy invariant compares LIKELIHOOD, not path, and must hold on a
    corpus engineered to produce such ties."""
    from symat_hbase_tools_spark.operators import unigram

    rows = [
        (i, "aaaa aaa aa a baba bab ba b", "en", "s", 1) for i in range(6)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = unigram.unigram_sample_check(spark, str(tmp_path)).collect()[0]
    assert got["valid_ok"] and got["ml_dominates_ok"]
    assert got["greedy_limit_ok"] and got["pieces_cover_ok"]
