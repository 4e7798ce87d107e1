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


def shingles(text: Column, n: int = 3, sep: str = "|") -> Column:
    """Distinct word n-gram shingles of the text, as an array column.

    A narrow per-row expression (no explode/shuffle); n-1 short docs yield [].
    """
    words = F.split(text, " ")
    positions = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        sep, *[F.element_at(words, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(positions, gram))


def minhash_signature(shingle_arr: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature as array<long>.

    Hash family: xxhash64(seed_j, shingle) — deterministic, JVM-side. The
    whole signature is a per-row narrow expression; empty shingle sets get
    Long.MAX sentinels (never collide into a band match).
    """
    def hash_with_seed(j: int):
        # NB: a plain `lambda s, j=j` would be seen by PySpark as a 2-arg
        # lambda and j would get bound to the array INDEX — closure instead.
        return lambda s: F.xxhash64(F.lit(j), s)

    sigs = [
        F.coalesce(
            F.array_min(F.transform(shingle_arr, hash_with_seed(j))),
            F.lit((1 << 63) - 1 - j),
        )
        for j in range(num_hashes)
    ]
    return F.array(*sigs)


def simhash64(shingle_arr: Column) -> Column:
    """64-bit SimHash of a shingle set (xxhash64 bit-vote), as a long."""
    def bit_sum(j: int) -> Column:
        vote = lambda s: F.when(  # noqa: E731
            F.shiftright(F.xxhash64(s), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))
        return F.aggregate(shingle_arr, F.lit(0), lambda acc, s: acc + vote(s))

    fp = F.lit(0).cast("long")
    for j in range(64):
        fp = fp + F.when(bit_sum(j) > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
    return fp


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters: h = (h*31 + code) % 1e9+7.

    Oracle-reproducible (DuckDB list_reduce computes the same fold). For the
    pure at-scale path prefer xxhash64(text) — one JVM call — but it has no
    cross-engine twin; this one is the verifiable fingerprint.
    """
    positions = F.when(
        F.length(text) > 0, F.sequence(F.lit(1), F.length(text))
    ).otherwise(F.array().cast("array<int>"))
    codes = F.transform(
        positions, lambda i: F.ascii(F.substr(text, i, F.lit(1))).cast("bigint")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda h, c: (h * 31 + c) % FINGERPRINT_MOD,
    )
