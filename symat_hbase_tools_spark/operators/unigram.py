"""Distributed unigram-LM tokenizer training (Kudo 2018, the SentencePiece
unigram model) — the OTHER tokenizer family next to BPE (operators/bpe.py):
where BPE grows a vocabulary bottom-up by merging, unigram starts from a
large seed of candidate pieces and PRUNES top-down under an EM-estimated
piece-probability model.

The scalable shape mirrors bpe.py's word-histogram formulation: the only
corpus-sized work is ONE shuffle building the word-frequency histogram
(standard wordcount at any scale). Everything after iterates over the
histogram (distinct words — orders of magnitude smaller than the corpus)
with the candidate vocabulary broadcast (<= a few hundred entries):

* **Seed** — every substring of length 1..MAX_PIECE_LEN of every distinct
  word, weighted by word freq x occurrences-in-word, one explode +
  partial-agg groupBy(piece); keep ALL single characters (coverage) plus
  the TOP ``seed_multi`` multi-character pieces by (count DESC, piece ASC).
  This first-round argmax is exactly SQL-expressible — the anchored oracle
  of ``unigram_learn_check`` (the bpe_learn_check pattern).
* **E-step** — Viterbi hard-EM (the deterministic variant): each distinct
  word is segmented to its maximum-likelihood piece sequence under the
  current log-probabilities (ties: the longest feasible last piece, i.e.
  the smallest split point). Piece counts accumulate weighted by word
  freq. One Arrow-batched ``mapInPandas`` pass over the histogram with
  the vocab broadcast as a closure constant, then a vocab-sized groupBy.
* **M-step / prune** — re-estimate p(piece) = count/total; drop dead
  multi-char pieces and keep the top 75% per round (SentencePiece's
  gradual shrink) until the multi-char budget is met on the final round.
  Single characters are never pruned and get a count floor of 1
  (smoothing), so every word stays segmentable.

Iterative — not SQL-expressible end to end, so ``unigram_learn_vocab`` is
rows-only; the check twin anchors the seed argmax against DuckDB and
asserts the structural invariants (ranks, probability mass, coverage).
A pure-python reference implementation parity-tests the full EM loop in
tests/test_text_analysis.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.bpe import word_histogram
from symat_hbase_tools_spark.sources.tables import load_table

#: longest candidate piece enumerated by the seed pass. Substring fan-out
#: per word is O(len * MAX_PIECE_LEN) rows — bounded per word, linear in
#: the histogram, never corpus-sized.
MAX_PIECE_LEN = 6
#: multi-char seed candidates kept after the first argmax pass
SEED_MULTI = 256
#: default final vocabulary budget (single chars + multi-char pieces)
VOCAB_SIZE = 96
#: EM rounds (each = one histogram pass; SentencePiece's default shrink
#: schedule converges in a handful of rounds at these vocab sizes)
N_ITERS = 3
#: per-round keep fraction for multi-char pieces above the final budget
SHRINK_KEEP = 0.75


def _substr_counts(words: DataFrame, max_len: int) -> DataFrame:
    """(piece, cnt): every substring of length 1..max_len of every word,
    weighted by word freq x occurrences — one explode + one partial-agg
    groupBy, both on the histogram (never the corpus)."""
    subs = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_len), F.length("word") - i + 1
                            ),
                        ),
                        lambda l: F.substring(F.col("word"), i, l),
                    ),
                )
            )
        ).alias("piece"),
    )
    return subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))


def _viterbi(word: str, logp: dict, max_len: int) -> list:
    """Max-likelihood segmentation of ``word`` under piece log-probs.
    Deterministic tie-break: at equal likelihood prefer the SMALLEST split
    point (the longest final piece). Single chars are always in ``logp``,
    so a path always exists."""
    n = len(word)
    dp = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        best, bj = -math.inf, -1
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None or dp[j] == -math.inf:
                continue
            cand = dp[j] + lp
            if cand > best:  # strict: first (smallest) j wins ties
                best, bj = cand, j
        dp[i], back[i] = best, bj
    pieces, i = [], n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def _estep_counts(hist: DataFrame, logp: dict, max_len: int) -> dict:
    """One distributed Viterbi E-step over the word histogram: piece ->
    freq-weighted count. The vocab ships as a closure constant (tiny);
    the result is vocab-sized (safe to collect)."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            acc: dict[str, int] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for p in _viterbi(word, logp, max_len):
                    acc[p] = acc.get(p, 0) + int(freq)
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "c": list(acc.values())}
            )

    rows = (
        hist.mapInPandas(kernel, schema="piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in rows}


def _prune(
    counts: dict, chars: set, target_multi: int, final: bool
) -> dict:
    """M-step prune: single chars always survive (count floor 1); dead
    multi-char pieces drop; live ones keep the top (count DESC, piece ASC)
    — 75% per intermediate round, the exact budget on the final round."""
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1 and c > 0),
        key=lambda x: (-x[1], x[0]),
    )
    keep_n = (
        target_multi
        if final
        else max(target_multi, math.ceil(len(multi) * SHRINK_KEEP))
    )
    kept = dict(multi[:keep_n])
    for ch in chars:
        kept[ch] = max(counts.get(ch, 0), 1)
    return kept


def _logprobs(counts: dict) -> dict:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items()}


def learn_unigram(
    spark: SparkSession,
    sf_dir: str,
    vocab_size: int = VOCAB_SIZE,
    n_iters: int = N_ITERS,
    max_len: int = MAX_PIECE_LEN,
    seed_multi: int = SEED_MULTI,
) -> DataFrame:
    """Learn a unigram-LM tokenizer vocabulary over the documents corpus.

    Output: (rank, piece, count, logprob) ranked by (count DESC, piece
    ASC); logprob is round-6 of log(count/total) over the FINAL vocab.
    Deterministic end to end (seed argmax, Viterbi tie-breaks, prune
    order) — the pure-python reference in tests reproduces it rank by
    rank.
    """
    hist = word_histogram(spark, sf_dir).localCheckpoint(eager=True)
    seed = _substr_counts(hist, max_len)
    chars = {
        r["piece"]
        for r in seed.filter(F.length("piece") == 1).select("piece").collect()
    }
    top_multi = (
        seed.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(int(seed_multi))
        .collect()
    )
    counts = {r["piece"]: int(r["cnt"]) for r in top_multi}
    for ch in chars:
        counts[ch] = 1
    # seed probabilities from the raw substring weights (chars floored)
    char_cnt = {
        r["piece"]: int(r["cnt"])
        for r in seed.filter(F.length("piece") == 1).collect()
    }
    counts.update(char_cnt)

    target_multi = max(0, int(vocab_size) - len(chars))
    for it in range(int(n_iters)):
        logp = _logprobs(counts)
        counts = _estep_counts(hist, logp, max_len)
        counts = _prune(
            counts, chars, target_multi, final=(it == n_iters - 1)
        )

    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda x: (-x[1], x[0]))
    rows = [
        (rank, p, int(c), round(math.log(c / total), 6))
        for rank, (p, c) in enumerate(ranked)
    ]
    return spark.createDataFrame(
        rows, "rank int, piece string, count long, logprob double"
    ).orderBy("rank")


def unigram_learn_check(
    spark: SparkSession, sf_dir: str, **kw
) -> DataFrame:
    """Oracle-paired verification of ``learn_unigram`` (the
    bpe_learn_check pattern): the part SQL can state exactly, it states —
    the TOP multi-char seed candidate is by definition the argmax weighted
    substring of the corpus word histogram, which DuckDB computes
    independently (same (count DESC, piece ASC) tie-break). The iterative
    EM tail is covered by engine-asserted structural invariants:

    * ranks_ok — ranks are exactly 0..n-1 in (count DESC, piece ASC) order;
    * coverage_ok — every single character of every corpus word is in the
      vocab (no word can fail to segment);
    * budget_ok — multi-char pieces <= the target budget, counts positive;
    * prob_mass_ok — exp(logprob) sums to 1 within 1e-6 (a probability
      model, not just a score table).
    """
    hist = word_histogram(spark, sf_dir).localCheckpoint(eager=True)
    seed = _substr_counts(hist, MAX_PIECE_LEN)
    top = (
        seed.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(1)
        .collect()
    )
    top_piece = top[0]["piece"] if top else None
    top_count = int(top[0]["cnt"]) if top else 0

    vocab = learn_unigram(spark, sf_dir, **kw).collect()
    ranks_ok = [r["rank"] for r in vocab] == list(range(len(vocab)))
    order = [(-r["count"], r["piece"]) for r in vocab]
    ranks_ok = ranks_ok and order == sorted(order)
    chars_needed = {
        c
        for r in hist.select(
            F.explode(F.split("word", "")).alias("c")
        ).distinct().collect()
        for c in [r["c"]]
        if c
    }
    vocab_pieces = {r["piece"] for r in vocab}
    coverage_ok = chars_needed <= vocab_pieces
    n_chars = len(chars_needed)
    budget_ok = (
        sum(1 for r in vocab if len(r["piece"]) > 1)
        <= max(0, VOCAB_SIZE - n_chars)
        and all(r["count"] > 0 for r in vocab)
    )
    prob_mass_ok = (
        abs(sum(math.exp(r["logprob"]) for r in vocab) - 1.0) < 1e-4
    )
    return spark.createDataFrame(
        [
            (
                top_piece,
                top_count,
                bool(ranks_ok),
                bool(coverage_ok),
                bool(budget_ok),
                bool(prob_mass_ok),
            )
        ],
        "top_piece string, top_count long, ranks_ok boolean, "
        "coverage_ok boolean, budget_ok boolean, prob_mass_ok boolean",
    )


def unigram_fertility_census(
    spark: SparkSession, sf_dir: str, **kw
) -> DataFrame:
    """Per-language tokenizer-fertility census under the LEARNED unigram
    vocabulary — the real-tokenizer counterpart of
    ``text_tokenizer_fertility`` (which uses the bpe_ish length stand-in):
    fertility = Viterbi unigram pieces per word.

    Scale shape: learn (histogram passes) + ONE corpus encode pass — the
    vocab ships as a closure constant into an Arrow-batched kernel with a
    per-batch word cache (repeated words Viterbi once per batch), then a
    language-keyed partial aggregate.

    Output: (lang, n_docs, n_words, n_pieces, fertility) for documents
    with >= 1 word.
    """
    vocab_rows = learn_unigram(spark, sf_dir, **kw).collect()
    logp = {r["piece"]: r["logprob"] for r in vocab_rows}
    max_len = max((len(p) for p in logp), default=1)
    docs = load_table(spark, sf_dir, "documents")

    def encode(batches):
        import re

        import pandas as pd

        # ' +' on trimmed text, NOT str.split(): matches tokens()/_TOKENS
        # semantics everywhere else in the text family (a tab or newline is
        # a token character there, not a separator)
        def toks(text):
            return [w for w in re.split(" +", text.strip(" ")) if w]

        for pdf in batches:
            cache: dict[str, int] = {}

            def n_pieces(text):
                total = 0
                for w in toks(text):
                    hit = cache.get(w)
                    if hit is None:
                        hit = cache[w] = len(_viterbi(w, logp, max_len))
                    total += hit
                return total

            out = pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    "n_w": pdf["text"].map(lambda t: len(toks(t))),
                    "n_p": pdf["text"].map(n_pieces),
                }
            )
            yield out[out["n_w"] >= 1]

    per_doc = docs.select("lang", "text").mapInPandas(
        encode, schema="lang string, n_w long, n_p long"
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_w").alias("n_words"),
            F.sum("n_p").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_pieces",
            (F.col("n_pieces").cast("double") / F.col("n_words")).alias(
                "fertility"
            ),
        )
    )


def unigram_tokenize_check(
    spark: SparkSession, sf_dir: str, **kw
) -> DataFrame:
    """Oracle-paired verification of ``unigram_fertility_census`` (the
    bpe tokenize_check sandwich): per language the SQL-exact facts
    (n_docs, n_words) plus a boolean — total unigram pieces lies between
    the word count (every word >= 1 piece) and the non-space character
    count (every piece >= 1 character)."""
    census = unigram_fertility_census(spark, sf_dir, **kw)
    from symat_hbase_tools_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    bounds = (
        docs.filter(F.size(tokens(F.col("text"))) >= 1)
        .groupBy("lang")
        .agg(
            F.sum(
                F.length(F.regexp_replace(F.col("text"), " ", "")).cast(
                    "long"
                )
            ).alias("nonspace_chars"),
        )
    )
    return (
        census.join(bounds, "lang")
        .select(
            "lang",
            "n_docs",
            "n_words",
            (
                (F.col("n_pieces") >= F.col("n_words"))
                & (F.col("n_pieces") <= F.col("nonspace_chars"))
            ).alias("pieces_bounded_ok"),
        )
    )


def _sample_segmentation(
    word: str, logp: dict, max_len: int, alpha: float, rng
) -> list:
    """SAMPLE a segmentation with P(seg) proportional to p(seg)^alpha —
    subword regularization (Kudo 2018 §3): forward-filtering (log
    partition over prefixes at temperature alpha) then backward-sampling
    of split points. alpha -> inf recovers the Viterbi path; alpha -> 0
    approaches uniform over feasible segmentations. Single chars are
    always in ``logp``, so the lattice is never empty."""
    n = len(word)
    Z = [0.0] + [-math.inf] * n
    for i in range(1, n + 1):
        terms = []
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and Z[j] != -math.inf:
                terms.append(Z[j] + alpha * lp)
        if terms:
            m = max(terms)
            Z[i] = m + math.log(sum(math.exp(t - m) for t in terms))
    pieces, i = [], n
    while i > 0:
        cands = []
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and Z[j] != -math.inf:
                cands.append((j, Z[j] + alpha * lp))
        m = max(t for _, t in cands)
        weights = [math.exp(t - m) for _, t in cands]
        u = rng.random() * sum(weights)
        acc, pick = 0.0, cands[-1][0]
        for (j, _), w in zip(cands, weights):
            acc += w
            if u <= acc:
                pick = j
                break
        pieces.append(word[pick:i])
        i = pick
    return pieces[::-1]


def _word_rng(seed: int, word: str):
    """Deterministic, partition-layout-independent RNG per word TYPE:
    keyed by (seed, word) through crc32 — the same word samples the same
    segmentation wherever it lands, so the census is reproducible across
    runs, partitionings, and retries (Python's builtin hash is salted per
    process and would not be)."""
    import random
    import zlib

    return random.Random(zlib.crc32(f"{seed}:{word}".encode("utf-8")))


def unigram_sampled_fertility(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.2,
    seed: int = 42,
    **kw,
) -> DataFrame:
    """Per-language fertility census under SAMPLED segmentations — the
    training-time counterpart of ``unigram_fertility_census`` (which
    serves the deterministic Viterbi path): subword regularization feeds
    a model segmentation DIVERSITY, and this census quantifies how much
    the sampled encoding inflates piece counts vs the ML path at a given
    temperature.

    Sampling is per word TYPE (deterministically keyed by (seed, word)),
    not per token occurrence: reproducibility and distributed stability
    outrank within-corpus variance here — a per-occurrence variant is a
    cache-key change away, but its output would depend on nothing
    checkable. Output: (lang, n_docs, n_words, n_pieces_sampled,
    n_pieces_viterbi, sampled_overhead) for documents with >= 1 word.

    Scale: identical shape to the Viterbi census — learn (histogram
    passes) + ONE corpus encode pass with the vocab broadcast; the
    per-batch word cache amortizes both lattice passes over repeated
    words.
    """
    vocab_rows = learn_unigram(spark, sf_dir, **kw).collect()
    logp = {r["piece"]: r["logprob"] for r in vocab_rows}
    max_len = max((len(p) for p in logp), default=1)
    docs = load_table(spark, sf_dir, "documents")

    def encode(batches):
        import re

        import pandas as pd

        def toks(text):
            return [w for w in re.split(" +", text.strip(" ")) if w]

        for pdf in batches:
            cache: dict[str, tuple] = {}

            def counts(text):
                ns = nv = 0
                for w in toks(text):
                    hit = cache.get(w)
                    if hit is None:
                        hit = cache[w] = (
                            len(
                                _sample_segmentation(
                                    w, logp, max_len, alpha, _word_rng(seed, w)
                                )
                            ),
                            len(_viterbi(w, logp, max_len)),
                        )
                    ns += hit[0]
                    nv += hit[1]
                return ns, nv

            both = pdf["text"].map(counts)
            out = pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    "n_w": pdf["text"].map(lambda t: len(toks(t))),
                    "n_s": both.map(lambda t: t[0]),
                    "n_v": both.map(lambda t: t[1]),
                }
            )
            yield out[out["n_w"] >= 1]

    per_doc = docs.select("lang", "text").mapInPandas(
        encode, schema="lang string, n_w long, n_s long, n_v long"
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_w").alias("n_words"),
            F.sum("n_s").alias("n_pieces_sampled"),
            F.sum("n_v").alias("n_pieces_viterbi"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_pieces_sampled",
            "n_pieces_viterbi",
            (
                F.col("n_pieces_sampled").cast("double")
                / F.col("n_pieces_viterbi").cast("double")
            ).alias("sampled_overhead"),
        )
    )


def unigram_sample_check(
    spark: SparkSession, sf_dir: str, alpha: float = 0.2, seed: int = 42, **kw
) -> DataFrame:
    """Oracle-paired verification of subword-regularization sampling (the
    unigram_learn_check pattern): SQL states the exact anchor (corpus
    word count under the family's ' +' tokenizer), the engine asserts the
    lattice-sampling invariants over EVERY distinct corpus word:

    * valid_ok — every sampled segmentation concatenates back to its word;
    * ml_dominates_ok — log-likelihood of the sampled path never exceeds
      the Viterbi path's (Viterbi is the argmax; a sampler that beats it
      is reading a different lattice);
    * greedy_limit_ok — at alpha=1e9 the sampled path's LIKELIHOOD equals
      the Viterbi path's (temperature semantics). Likelihood, not path:
      two distinct segmentations can be exactly tied (['a','aaa'] vs
      ['aaa','a']), and the zero-temperature limit is only defined up to
      ties — path equality would make the check a coin flip there;
    * pieces_cover_ok — sampled piece count >= 1 per word and every piece
      is in the learned vocab.
    """
    vocab_rows = learn_unigram(spark, sf_dir, **kw).collect()
    logp = {r["piece"]: r["logprob"] for r in vocab_rows}
    max_len = max((len(p) for p in logp), default=1)
    hist = word_histogram(spark, sf_dir)

    def kernel(batches):
        import pandas as pd

        valid = ml_dom = greedy = cover = True
        for pdf in batches:
            for word in pdf["word"]:
                samp = _sample_segmentation(
                    word, logp, max_len, alpha, _word_rng(seed, word)
                )
                vit = _viterbi(word, logp, max_len)
                valid &= "".join(samp) == word
                lp_s = sum(logp[p] for p in samp)
                lp_v = sum(logp[p] for p in vit)
                ml_dom &= lp_s <= lp_v + 1e-9
                cold = _sample_segmentation(
                    word, logp, max_len, 1e9, _word_rng(seed, word)
                )
                greedy &= abs(sum(logp[p] for p in cold) - lp_v) < 1e-9
                cover &= len(samp) >= 1 and all(p in logp for p in samp)
        yield pd.DataFrame(
            {
                "valid": [valid],
                "ml_dom": [ml_dom],
                "greedy": [greedy],
                "cover": [cover],
            }
        )

    flags = (
        hist.mapInPandas(
            kernel,
            schema="valid boolean, ml_dom boolean, greedy boolean, cover boolean",
        )
        .agg(
            F.bool_and("valid").alias("valid_ok"),
            F.bool_and("ml_dom").alias("ml_dominates_ok"),
            F.bool_and("greedy").alias("greedy_limit_ok"),
            F.bool_and("cover").alias("pieces_cover_ok"),
        )
    )
    from symat_hbase_tools_spark.functions.text import tokens

    n_words = load_table(spark, sf_dir, "documents").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("n_words")
    )
    return n_words.crossJoin(flags).select(
        "n_words", "valid_ok", "ml_dominates_ok", "greedy_limit_ok",
        "pieces_cover_ok",
    )
