"""Table profiling: per-column completeness / cardinality / range stats.

The data-quality census every pipeline runs before trusting a new drop of
data (the Deequ/Great-Expectations analyzer shape): for each column —
non-null count, exact distinct count, min and max rendered as strings.

Two passes, each scale-safe:

  1. a NARROW wide-aggregate (count/min/max per column, one output row, no
     distinct anywhere) — single scan, pure map-side combine;
  2. distinct cardinalities via melt -> (column, value) partial-dedup
     aggregate. Spark rewrites a single-distinct-per-group aggregate into
     two exchanges keyed on (column, value): the first pre-deduplicates
     map-side, so the shuffle carries unique values per column, not rows.
     This is exactly the plan a 6-way ``count(DISTINCT ...)`` wide
     aggregate would Expand into — but melting makes the fan-out explicit
     and keeps ONE distinct aggregate, avoiding the N-branch Expand shape.

At 100 TB you would swap pass 2 for ``approx_count_distinct`` and fuse both
passes into one scan (the tolerance-oracle pattern of
``approx_distinct_parts``); the exact formulation here is what the oracle
can mirror bit-for-bit.

Renderers keep min/max comparisons on NATIVE types (a lexicographic min of
"10" < "9" would be wrong) and render only the final value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _render(col: Column, kind: str) -> Column:
    if kind == "money":
        return F.format_string("%.2f", col)
    if kind == "date":
        return F.date_format(col, "yyyy-MM-dd")
    return col.cast("string")


def profile(df: DataFrame, renderers: dict[str, str]) -> DataFrame:
    """Profile ``df``'s columns. ``renderers`` maps column -> render kind
    ('string' | 'long' | 'money' | 'date') used for the min/max output."""
    cols = list(renderers)

    wide = df.agg(
        F.count(F.lit(1)).alias("__n_rows"),
        *[F.count(F.col(c)).alias(f"__nn_{c}") for c in cols],
        *[_render(F.min(F.col(c)), renderers[c]).alias(f"__min_{c}") for c in cols],
        *[_render(F.max(F.col(c)), renderers[c]).alias(f"__max_{c}") for c in cols],
    )
    stack_expr = ", ".join(
        f"'{c}', __nn_{c}, __min_{c}, __max_{c}" for c in cols
    )
    narrow = wide.select(
        "__n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS (column_name, n_nonnull, min_repr, max_repr)"
        ),
    )

    melted = df.select(
        F.expr(
            "stack({n}, {args}) AS (column_name, value_repr)".format(
                n=len(cols),
                args=", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols),
            )
        )
    )
    distinct = melted.groupBy("column_name").agg(
        F.count_distinct(F.col("value_repr")).alias("n_distinct")
    )

    return narrow.join(F.broadcast(distinct), "column_name").select(
        "column_name",
        F.col("__n_rows").alias("n_rows"),
        "n_nonnull",
        "n_distinct",
        "min_repr",
        "max_repr",
    )


#: FK edges of the star schema: (child table, child key, parent table, parent key)
FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_integrity(load, edges=FK_EDGES) -> DataFrame:
    """Foreign-key violation census across a star schema — the referential
    half of the data-quality gate (``profile`` is the per-column half).

    For each FK edge: child row count, orphan count (child keys with no
    parent), and null-key count. One row per edge.

    Scale shape per edge: the parent side is reduced to DISTINCT keys
    FIRST — a vocab-sized build input, so Catalyst/AQE picks a broadcast
    join for every dimension that fits (nation/region always; customer up
    to the broadcast threshold) and a shuffle join beyond, exactly the
    right call per edge. The orphan count is a LEFT JOIN + conditional sum
    rather than an anti-join so child count and orphan count come from ONE
    pass per edge. Null child keys are counted separately (SQL FK
    semantics: NULL references are not violations).

    ``load`` is a table-name -> DataFrame loader so the census runs on any
    catalog (tests inject corrupted frames).
    """
    reports = []
    for child, ckey, parent, pkey in edges:
        c = load(child).select(F.col(ckey).alias("__ck"))
        p = load(parent).select(F.col(pkey).alias("__pk")).distinct()
        joined = c.join(p, c["__ck"] == p["__pk"], "left")
        reports.append(
            joined.agg(
                F.lit(f"{child}.{ckey}->{parent}.{pkey}").alias("relationship"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    (F.col("__ck").isNotNull() & F.col("__pk").isNull()).cast("long")
                ).alias("n_orphans"),
                F.sum(F.col("__ck").isNull().cast("long")).alias("n_null_keys"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
