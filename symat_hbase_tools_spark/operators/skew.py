"""Skew-handling utilities for hot keys.

At 100 TB a handful of hot keys (a viral document source, a null-ish default
row key) can pin a single reducer. Two standard remedies, both implemented
declaratively:

  * AQE skew-join splitting is ON by default in session.py
    (``spark.sql.adaptive.skewJoin.enabled``) — the zero-code path that
    splits oversized shuffle partitions at runtime.
  * Explicit salting below — for aggregations whose single hot GROUP BY key
    AQE cannot split (AQE splits join partitions, not aggregation keys),
    and for joins against engines/versions without AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: per-(key, salt) partial, then per-key final.

    ``aggs`` run in phase 1 (per key+salt), ``final_aggs`` re-combine the
    phase-1 columns per key (e.g. phase1 count -> phase2 sum). Spark's own
    partial aggregation already does this per-TASK; explicit salting helps
    when a single key's partials are still too large for one reducer
    (huge collect_list/collect_set states, percentile buffers, ...).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salt_buckets)
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*aggs)
    return phase1.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    big gets a random-ish salt in [0, B); small is exploded B ways so every
    (key, salt) pair finds its match. The hot key's rows spread over B
    reducers at the cost of replicating the small side B times — only worth
    it when the small side is small and AQE is unavailable; prefer
    broadcast() when the small side fits in memory.
    """
    b = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), salt_buckets)
    big_salted = big.withColumn("_salt", b)
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return big_salted.join(small_replicated, [key, "_salt"], how).drop("_salt")
