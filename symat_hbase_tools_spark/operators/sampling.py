"""Deterministic, partitioning-independent sampling.

``df.sample(fraction, seed)`` is seed-deterministic only for a FIXED
partitioning — repartition the input and the sample changes, which breaks
reproducibility across cluster layouts. At 100 TB the correct tool is
consistent hash sampling: a row is in the sample iff a hash of its key
lands under the cut-off. Properties that matter at scale:

  * layout-independent: same rows sampled on 1 or 1000 executors;
  * coordinated: the same key samples identically across tables/runs
    (joinable samples);
  * narrow: a filter, no shuffle, fully pushable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_sample(df: DataFrame, key_cols: list[str], fraction: float, seed: int = 42) -> DataFrame:
    """Keep rows whose key-hash bucket falls below fraction."""
    cut = int(fraction * _BUCKETS)
    bucket = F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols]), _BUCKETS)
    return df.filter(bucket < cut)


def stratified_hash_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample a dominant language)."""
    cut: Column = F.lit(0)
    for value, frac in fractions.items():
        cut = F.when(F.col(strata_col) == value, int(frac * _BUCKETS)).otherwise(cut)
    bucket = F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns]), _BUCKETS)
    return df.filter(bucket < cut)


# -- cross-engine-portable variant ------------------------------------------
# xxhash64 above is the fast path but is Spark-specific. When the sample
# membership itself must be reproducible in OTHER engines (an oracle check, a
# downstream DuckDB/Trino consumer re-deriving the same split), hash with md5
# — every engine agrees on md5 — and compare the leading hex digits against a
# fixed-width hex cutoff. Still a narrow, pushable filter; md5 costs more CPU
# than xxhash64 but the plan shape (no shuffle, layout-independent) is the
# same.

_HEX_WIDTH = 8  # 16^8 buckets: cutoff resolution ~2e-10


def _md5_cut(fraction: float) -> str:
    return format(min(int(fraction * 16**_HEX_WIDTH), 16**_HEX_WIDTH - 1), f"0{_HEX_WIDTH}x")


def portable_sample(
    df: DataFrame, key_cols: list[str], fraction: float, seed: int = 42
) -> DataFrame:
    """Sample whose membership any md5-capable engine reproduces exactly.

    Keeps rows where the first 8 hex chars of md5(seed \\x1f key...) sort
    below the fraction's hex cutoff; fixed-width lexicographic comparison of
    lowercase hex equals numeric comparison, so DuckDB's
    ``substr(md5(concat_ws(chr(31), ...)), 1, 8) < '<cut>'`` selects the
    identical row set.
    """
    hexval = F.md5(F.concat_ws("\x1f", F.lit(str(seed)), *[F.col(c) for c in key_cols]))
    return df.filter(F.substring(hexval, 1, _HEX_WIDTH) < F.lit(_md5_cut(fraction)))


def portable_stratified_sample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum portable sampling (same md5 scheme, CASE over cutoffs)."""
    cut: Column = F.lit(_md5_cut(default_fraction))
    for value, frac in fractions.items():
        cut = F.when(F.col(strata_col) == value, F.lit(_md5_cut(frac))).otherwise(cut)
    hexval = F.md5(F.concat_ws("\x1f", F.lit(str(seed)), *[F.col(c) for c in key_cols]))
    return df.filter(F.substring(hexval, 1, _HEX_WIDTH) < cut)
