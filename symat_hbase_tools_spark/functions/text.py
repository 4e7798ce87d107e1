"""Text column functions: tokenization, shingling, hashing.

Everything here is built-in Spark expressions (split/transform/sequence/
xxhash64) so the text pipeline stays inside whole-stage codegen — crucial
when the documents table is 100 TB. Python appears nowhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for the polynomial rolling fingerprint (fits 64-bit: h*31+c < 2^35)
FINGERPRINT_MOD = 1_000_000_007

#: tiny multilingual stopword profile used by quality scoring / lang-id
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty string -> empty array, matching the oracle)."""
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), " +")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on word/number/punctuation boundaries.

    A cheap BPE stand-in — counts regex token groups (letter runs count one
    per 4 chars like typical BPE merges, punctuation counts singly).
    """
    words = tokens(text)
    per_word = F.transform(
        words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("bigint")
    )
    return F.aggregate(per_word, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


#: whole-token stopword matcher, one codegen'd regex pass per document.
#: Alternatives longest-first so Java's ordered alternation rarely backtracks;
#: the lookahead keeps the trailing space unconsumed so CONSECUTIVE stopwords
#: ("of the") each match. Exactly equivalent to counting tokens() members in
#: STOPWORDS because tokens() splits trimmed text on runs of spaces: a token
#: equals a stopword iff the word appears bounded by space-or-string-edge.
#: (Java regex only — the DuckDB oracle keeps its list_filter formulation,
#: RE2 has no lookahead. The per-token higher-order F.filter this replaced
#: ran interpreted per element: 2.97 s warm at sf0.1, 47% of the bench
#: total. A literal-replace-on-doubled-spaces formulation was ALSO tried
#: and measured 3x slower: Spark inlines the doubled-padded subexpression
#: into all 9 uses — no cross-projection CSE — so the doubling allocation
#: swamps the regex savings.)
_STOPWORD_RE = (
    "(^| )(" + "|".join(sorted(STOPWORDS, key=len, reverse=True)) + ")(?=( |$))"
)


#: whole-token "contains no lowercase letter" matcher (round 15): a token of
#: tokens() — a maximal space-bounded run of non-space chars — contains no
#: [a-z] iff it is a maximal space-bounded run of [^a-z ] chars, which is
#: exactly one match of this regex (leading space-or-start consumed, trailing
#: space left unconsumed by the lookahead so adjacent alpha-free tokens each
#: match — the _STOPWORD_RE construction). One codegen'd regexp_count pass
#: replaces the interpreted per-element HOF filter in gopher_quality_flags.
_ALPHA_FREE_RE = "(^| )[^a-z ]+(?=( |$))"


def stopword_hits(text: Column) -> Column:
    """Number of tokens of ``text`` that are STOPWORDS members — single
    codegen'd regexp_count pass (see ``_STOPWORD_RE``)."""
    return F.regexp_count(text, F.lit(_STOPWORD_RE)).cast("bigint")


def shingles_from_words(words: Column, n: int = 3, sep: str = "|") -> Column:
    """Distinct word n-gram shingles from a PRE-MATERIALIZED words array.

    ``words`` must be a real column (not an inline split(...) expression):
    higher-order functions run interpreted, so an inlined split would be
    re-evaluated for every element_at — measured ~10x slower. Callers do
    ``.withColumn("words", F.split(text, " "))`` first.
    """
    positions = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        sep, *[F.element_at(words, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(positions, gram))


def shingles(text: Column, n: int = 3, sep: str = "|") -> Column:
    """Distinct word n-gram shingles of a text column (convenience form —
    prefer ``shingles_from_words`` on hot paths, see its docstring)."""
    return shingles_from_words(F.split(text, " "), n=n, sep=sep)


def shingle_hashes(shingle_arr: Column) -> Column:
    """One xxhash64 per shingle — the single expensive hash pass; the MinHash
    permutation family and SimHash bit-votes below reuse these hashes."""
    return F.transform(shingle_arr, lambda s: F.xxhash64(s))


def _permutation_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j odd, b_j) constants for the linear hash family.

    31-bit constants so a_j * (h & mask31) + b_j stays < 2^62 — no long
    overflow, which matters because Spark 4 runs ANSI mode (overflow throws).
    """
    import random

    rng = random.Random(0x5EED)
    return [
        ((rng.getrandbits(31) | 1), rng.getrandbits(31)) for _ in range(num_hashes)
    ]


def minhash_permutations(h: Column, num_hashes: int = 64) -> list[Column]:
    """The MinHash permutation family applied to one shingle-hash column.

    Classic construction: ONE strong hash per shingle (``shingle_hashes``),
    then cheap universal-family permutations
    h_j = (a_j * (h & mask31) + b_j) mod (2^31 - 1) — num_hashes
    multiply-add-mods instead of num_hashes full string hashes per shingle.
    The mod is essential: without it a_j*h+b_j is MONOTONE in h, every
    "permutation" picks the same argmin shingle and the signature
    degenerates to one hash function.

    Returned as plain column expressions so callers build the signature as
    ``explode(hashes) -> groupBy(doc).agg(min(perm_j)...)`` — a codegen'd
    partially-aggregated hash aggregate. (The per-row alternative,
    64 x array_min(transform(...)), runs interpreted — higher-order
    functions get no whole-stage codegen — and measured ~20x slower.)
    31-bit constants keep a_j * (h & mask31) + b_j < 2^62: no long overflow,
    which matters because Spark 4 runs ANSI mode (overflow throws).
    """
    mask31 = (1 << 31) - 1
    mersenne = (1 << 31) - 1
    return [
        F.pmod(
            F.lit(a).cast("long") * h.bitwiseAND(F.lit(mask31)) + F.lit(b),
            F.lit(mersenne),
        )
        for a, b in _permutation_constants(num_hashes)
    ]


def simhash_vote_aggs(h: Column, bits: int = 64) -> list[Column]:
    """Per-bit SimHash vote aggregates (+1/-1 per shingle hash, summed).

    Used as ``explode(hashes) -> groupBy(doc).agg(*votes)`` — codegen'd hash
    aggregation, same rationale as ``minhash_permutations``.
    """
    return [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"vote_{j}")
        for j in range(bits)
    ]


def simhash_from_votes(bits: int = 64) -> Column:
    """Assemble the SimHash long from the ``vote_j`` aggregate columns."""
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(
            F.col(f"vote_{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return fp


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters: h = (h*31 + code) % 1e9+7.

    Oracle-reproducible (DuckDB list_reduce computes the same fold). For the
    pure at-scale path prefer xxhash64(text) — one JVM call — but it has no
    cross-engine twin; this one is the verifiable fingerprint.
    """
    # split to a char array FIRST: indexing the string with substr inside
    # the transform re-scans the whole string per position — O(len^2)
    # interpreted work (measured 15 s -> 0.6 s on the sf0.1 cleaning census)
    chars = F.when(F.length(text) > 0, F.split(text, "")).otherwise(
        F.array().cast("array<string>")
    )
    codes = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda h, c: (h * 31 + c) % FINGERPRINT_MOD,
    )
