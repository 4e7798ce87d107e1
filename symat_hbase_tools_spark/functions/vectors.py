"""Vector column functions over ArrayType(FloatType) embeddings.

All JVM-side built-in higher-order functions (zip_with/aggregate) — no Python
in the similarity hot path. Arithmetic is promoted to double with a strict
sequential left-fold, so the result is reproducible across engines (the
DuckDB oracle computes the same fold within ~1 ulp; outputs are rounded to 6
decimals before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot(a, b) / (norm(a) * norm(b))
