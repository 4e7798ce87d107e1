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


#: group-cardinality threshold below which :func:`group_mad` routes to the
#: pure-JVM two-pass form: with a handful of groups, the whole reduce side
#: is a few kilobytes and the fused kernel's cost is ENTIRELY the Python
#: worker round-trip (Arrow serialization + worker dispatch, a ~0.2 s
#: constant) — the two extra JVM stages are microseconds at that size.
#: Above the threshold the fused kernel's halved stage count wins.
MAD_JVM_DISPATCH_MAX_GROUPS = 64


def group_mad(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: float = 1.4826,
    expected_groups: int | None = None,
) -> DataFrame:
    """Median absolute deviation per group — the robust spread statistic
    (MAD; scale 1.4826 makes it a consistent sigma estimator under
    normality). Outlier gates built on mean/stddev saturate on the very
    outliers they should catch; MAD is the data-quality alternative every
    serious profiling pass ships.

    ONE shuffle, one kernel (round-9 rewrite): values shuffle once on the
    group key into a cogrouped Arrow kernel that sorts each group's
    vector a single time and reads BOTH percentiles off it — the median
    directly, the deviation median after one |x - m| pass over the
    already-sorted array. The previous composition ran two sort-based
    ``percentile`` aggregates with a broadcast join between them: two
    scans, two shuffles, and each percentile buffer carried the full
    value list anyway (exact percentile has no map-side reduction), so
    the fused kernel moves the SAME bytes through half the stages. It
    remains the parity witness in ``group_mad_twopass``.

    Interpolation is the ``lower + (upper - lower) * frac`` form that
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both use, in
    float64 — bit-identical output to the two-pass form (tested),
    INCLUDING null semantics: NULL values are excluded from both
    percentiles (``percentile`` / ``quantile_cont`` ignore NULLs) but
    still counted in ``n`` (``count(lit(1))`` counts every row); an
    all-NULL group yields NULL median/mad with its row count intact.
    Caveat (documented, not fixable at the Arrow boundary): a genuine
    float NaN in the input is indistinguishable from NULL once the batch
    lands in a float64 pandas column, so NaN inputs are treated as NULL
    here, whereas Spark's percentile sorts NaN greatest — callers with
    NaN-bearing columns should pre-filter ``isnan``.

    ``expected_groups``: callers that KNOW the group cardinality is tiny
    (e.g. TPC-H order priority: 5 values) pass it; at or below
    :data:`MAD_JVM_DISPATCH_MAX_GROUPS` the call routes to the pure-JVM
    :func:`group_mad_twopass` — no Python worker at all, which beats the
    fused kernel's Arrow/worker constant when the reduce side is
    kilobytes. The hint is advisory (wrong values change performance,
    never results — the two forms are bit-parity tested).

    Scale posture: identical to the sort-aggregate form — exact per-group
    medians fundamentally gather each group's values at one reducer
    (percentile's partial buffers did too); group count drives
    parallelism. For data-scale group cardinality or groups too big for
    one task, the honest alternative is the equi-depth
    percentile-histogram pattern, not this statistic.
    Output: group, n, median, mad (scaled), mad_raw.
    """
    if (
        expected_groups is not None
        and expected_groups <= MAD_JVM_DISPATCH_MAX_GROUPS
    ):
        return group_mad_twopass(df, group_col, value_col, scale)

    import numpy as np
    import pandas as pd

    def _interp_median(sorted_vals: "np.ndarray") -> float:
        n = len(sorted_vals)
        pos = (n - 1) * 0.5
        lo = int(pos)
        frac = pos - lo
        lower = float(sorted_vals[lo])
        if frac == 0.0:
            return lower
        return lower + (float(sorted_vals[lo + 1]) - lower) * frac

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        raw = pdf["_v"].to_numpy(dtype=np.float64)  # NULL arrives as NaN
        n_all = len(raw)  # count(lit(1)) semantics: NULLs count in n
        v = raw[~np.isnan(raw)]  # percentile semantics: NULLs excluded
        if v.size == 0:
            # all-NULL group: percentile/quantile_cont return NULL
            return pd.DataFrame(
                {
                    "_g": [pdf["_g"].iloc[0]],
                    "n": [n_all],
                    "median": [None],
                    "mad": [None],
                    "mad_raw": [None],
                }
            )
        v.sort()
        med = _interp_median(v)
        dev = np.abs(v - med)
        dev.sort()
        mad_raw = _interp_median(dev)
        return pd.DataFrame(
            {
                "_g": [pdf["_g"].iloc[0]],
                "n": [n_all],
                "median": [med],
                "mad": [mad_raw * scale],
                "mad_raw": [mad_raw],
            }
        )

    g_type = df.schema[group_col].dataType.simpleString()
    return (
        df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy("_g")
        .applyInPandas(
            kernel,
            schema=(
                f"_g {g_type}, n long, median double, "
                "mad double, mad_raw double"
            ),
        )
        .withColumnRenamed("_g", group_col)
    )


def group_mad_twopass(
    df: DataFrame, group_col: str, value_col: str, scale: float = 1.4826
) -> DataFrame:
    """The pre-round-9 two-pass composition of :func:`group_mad`, kept as
    the bit-parity witness for the fused kernel: per-group exact median
    via ``percentile(0.5)``, broadcast the medians back, aggregate the
    deviation percentile the same way. Two scans + two sort-aggregate
    shuffles — same bytes moved, twice the stages."""
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    return (
        dev.groupBy(group_col, "n", "_med")
        .agg(F.percentile("_adev", F.lit(0.5)).alias("mad_raw"))
        .select(
            group_col,
            "n",
            F.col("_med").alias("median"),
            (F.col("mad_raw") * F.lit(scale)).alias("mad"),
            "mad_raw",
        )
    )


#: PSI severity conventions: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
#: action required (the credit-scoring thresholds the metric comes from)
PSI_BUCKETS = 10


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = PSI_BUCKETS,
) -> DataFrame:
    """Population Stability Index per group between a baseline and a
    current snapshot — THE train/serve drift gate for feature pipelines.

    PSI = sum over value-buckets of (p_cur - p_base) * ln(p_cur / p_base),
    with buckets cut at the BASELINE's equi-depth quantiles (the standard
    construction: buckets are defined once on the reference window).

    Scale shape: bucket cutpoints come from ONE percentile(array)
    aggregate per group on the baseline (broadcast back — cutpoint table
    is groups x buckets, dimension-sized); both snapshots then bucket
    map-side with n_buckets-1 summed comparisons (same codegen shape as
    the equi-depth histogram) and aggregate counts per (group, bucket).
    Zero-count buckets get a 0.5-count smoothing (Laplace-style) so the
    log stays finite — deterministic and mirrored in the oracle.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = base.groupBy(group_col).agg(
        F.percentile(value_col, F.array(*[F.lit(q) for q in qs])).alias("_cs")
    )

    def bucketed(df):
        j = df.join(F.broadcast(cuts), group_col)
        b = None
        for i in range(n_buckets - 1):
            term = (F.col(value_col) > F.col("_cs").getItem(i)).cast("int")
            b = term if b is None else b + term
        return j.groupBy(group_col, b.alias("bucket")).agg(
            F.count(F.lit(1)).alias("_n")
        )

    bb = bucketed(base).select(group_col, "bucket", F.col("_n").alias("n_base"))
    cb = bucketed(current).select(group_col, "bucket", F.col("_n").alias("n_cur"))
    # full outer on (group, bucket): a bucket may be empty on either side
    per = (
        bb.join(cb, [group_col, "bucket"], "full_outer")
        .withColumn("n_base", F.coalesce("n_base", F.lit(0)))
        .withColumn("n_cur", F.coalesce("n_cur", F.lit(0)))
    )
    tot = per.groupBy(group_col).agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    p = per.join(F.broadcast(tot), group_col).select(
        group_col,
        "bucket",
        ((F.col("n_base") + F.lit(0.5)) / (F.col("tb") + F.lit(0.5) * n_buckets)).alias("pb"),
        ((F.col("n_cur") + F.lit(0.5)) / (F.col("tc") + F.lit(0.5) * n_buckets)).alias("pc"),
    )
    return (
        p.groupBy(group_col)
        .agg(
            F.sum((F.col("pc") - F.col("pb")) * F.log(F.col("pc") / F.col("pb"))).alias("psi"),
            F.count(F.lit(1)).alias("n_buckets_used"),
        )
    )


#: Benford expected first-digit probabilities: log10(1 + 1/d). Stored as
#: exact rational strings of the double values both engines compute from
#: the same log10 calls — the oracle recomputes them identically.
def benford_census(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit (Benford's law) census of a positive money/metric
    column — the classic fraud / synthetic-data / unit-mixup detector: a
    column of organically-grown magnitudes follows P(d) = log10(1+1/d);
    a flat or spiked distribution flags fabricated or clipped data.

    Exactness: the value fixes to integer CENTS first (round(x*100) — one
    exact-rounded float op), and the leading digit is the first character
    of the bigint's decimal string — integer-to-string is canonical in
    both engines, where double-to-string repr is not, and no float log
    touches the digit path (log10 at exact power-of-ten boundaries is
    implementation-ulp territory). Counts are exact bigints; deviation
    and chi2 combine identical bigints with the same log10(1+1/d)
    constants both engines evaluate — bit-stable.

    Scale shape: one map-only digit projection + one 9-group partial
    aggregate; a broadcast one-row total joins back. At any scale: one
    tiny exchange.

    Output per digit 1-9: (digit, n, share, benford_p, deviation) plus
    the chi2 contribution; callers sum chi2 across digits against the
    15.5 (alpha=0.05, 8 dof) threshold.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    digits = (
        df.filter(F.col(value_col) > 0)
        .select(cents.alias("c"))
        .filter(F.col("c") >= 1)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("n_total"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    share = F.col("n").cast("double") / F.col("n_total")
    expected = F.col("n_total") * p
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            share.alias("share"),
            p.alias("benford_p"),
            (share - p).alias("deviation"),
            (
                (F.col("n") - expected) * (F.col("n") - expected) / expected
            ).alias("chi2_term"),
        )
    )


#: candidate functional dependencies for the FD-violation census over the
#: orders table: one that must HOLD (the key determines everything) and two
#: plausible-but-false analyst assumptions worth disproving with numbers.
ORDERS_FD_CANDIDATES = (
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderdate", "o_orderstatus"),
)


def fd_violations(df: DataFrame, candidates=ORDERS_FD_CANDIDATES) -> DataFrame:
    """Functional-dependency violation census — the data-quality check that
    answers "does X determine Y in this table?" with exact counts instead
    of a belief (the Deequ/profiling-family companion to
    ``referential_integrity``: that checks edges BETWEEN tables, this
    checks determinism WITHIN one).

    Per candidate FD X -> Y: distinct X values, X values mapping to more
    than one Y (the violators), the worst fan-out max |Y per X|, and the
    verdict. An FD holds iff n_violating_lhs = 0.

    Scale shape: one partial-aggregated groupBy per candidate on (X) with
    count_distinct(Y) — each is a single exact-distinct aggregate over two
    columns only (column pruning reaches the scan), reduced to a 1-row
    summary before the union; K candidates = K cheap passes, never a
    cross-column Expand blowup. All counts exact integers.
    """
    outs = []
    for lhs, rhs in candidates:
        per_lhs = df.groupBy(lhs).agg(F.count_distinct(rhs).alias("n_rhs"))
        outs.append(
            per_lhs.agg(
                F.lit(f"{lhs} -> {rhs}").alias("fd"),
                F.count(F.lit(1)).alias("n_lhs"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                    "n_violating_lhs"
                ),
                F.max("n_rhs").alias("max_fanout"),
                (F.max("n_rhs") == 1).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def duplicate_payments(df: DataFrame) -> DataFrame:
    """Potential duplicate-transaction census — the payments-audit staple:
    a customer with MULTIPLE orders on one day is the double-entry review
    queue; ``n_distinct_amounts < n_orders`` auto-confirms an
    identical-amount pair (the classic double-charge signature). One row
    per suspect (customer, day) group with the member keys (sorted,
    bounded by the group) so the auditor acts without a second scan.

    Scale shape: one partial-aggregated groupBy on the natural composite
    key; suspect groups are tiny, so the collected key list per row is
    bounded. Amounts compare as exact integer cents — float equality
    would be engine-dependent.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        df.select("o_custkey", "o_orderdate", "o_orderkey", cents.alias("pc"))
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct(F.col("pc")).alias("n_distinct_amounts"),
            F.sum("pc").alias("total_cents"),
            F.array_join(
                F.sort_array(F.collect_list("o_orderkey")), ","
            ).alias("order_keys"),
        )
        .filter(F.col("n_orders") >= 2)
    )


#: business-rule constraint suite for the lineitem table (Deequ-style
#: check census; each rule is a boolean SQL predicate over one row)
LINEITEM_CONSTRAINTS = (
    ("discount_in_range", "l_discount >= 0.00 AND l_discount <= 0.10"),
    ("tax_in_range", "l_tax >= 0.00 AND l_tax <= 0.08"),
    ("quantity_in_range", "l_quantity >= 1 AND l_quantity <= 50"),
    ("positive_price", "l_extendedprice > 0"),
    ("returnflag_domain", "l_returnflag IN ('A', 'N', 'R')"),
    ("linestatus_domain", "l_linestatus IN ('O', 'F')"),
    ("shipdate_bounds", "l_shipdate >= DATE'1992-01-01' AND l_shipdate <= DATE'1998-12-31'"),
)


def constraint_check(df: DataFrame, constraints=LINEITEM_CONSTRAINTS) -> DataFrame:
    """Business-rule constraint census — Deequ's `Check` shape: each rule
    is a row-level boolean predicate; the census reports per rule the
    violation count and the verdict. NULL predicate results count as
    violations (a rule that cannot be evaluated did not pass — the
    conservative audit posture).

    Scale shape: ONE pass over the table computing all rules as
    conditional sums in a single partial aggregate (no per-rule scan, no
    Expand); the output is K rows assembled from the 1-row aggregate via
    a stack() unpivot — constant-size, driver-free.
    """
    aggs = []
    for name, pred in constraints:
        ok = F.expr(pred)
        aggs.append(
            F.sum(F.when(F.coalesce(ok, F.lit(False)), 0).otherwise(1)).alias(
                f"v_{name}"
            )
        )
    one = df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{name}', v_{name}" for name, _ in constraints
    )
    return one.selectExpr(
        f"stack({len(constraints)}, {stack_args}) AS (rule, n_violations)",
        "n_rows",
    ).select(
        "rule",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passes"),
    )
