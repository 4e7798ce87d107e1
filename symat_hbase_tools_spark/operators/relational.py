"""Relational operator surface over the driver's TPC-H-ish tables.

The reference has no relational layer (SURVEY.md §2.5) — this is the engine's
general query surface: filters, projections, equi/broadcast joins, group-by
aggregates, windows, top-k, set ops, JSON/date functions. Everything is
built-in DataFrame API so Catalyst gets pushdown/pruning/join-selection and
Tungsten gets whole-stage codegen; there is deliberately not a single Python
UDF in this module.

Oracle determinism notes (every query here is hash-compared against DuckDB):
  * Sums of 2-decimal doubles are order-dependent in IEEE double. Every money
    aggregate therefore accumulates exact integer micros in hi/lo-split longs
    — exact, order-free, and on the codegen hash-agg fast path — then
    assembles the double once per group. ``money_sum`` / ``money_sum_expr``.
  * Sums of integral doubles (l_quantity) are exact in double; summed as-is.
  * Averages are explicit exact-sum / count so both engines divide the same
    two numbers.
  * Timestamps never appear raw in output — rendered 'yyyy-MM-dd' or as epoch
    seconds (BIGINT) so ns-vs-us precision can't skew the hash.
  * Every ORDER BY that feeds a LIMIT or window rank carries a unique-key
    tiebreak so the selected row *set* is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from symat_hbase_tools_spark.sources.tables import load_table

#: gap that splits two events of one user into separate sessions (8 h, in µs)
SESSION_GAP_US = 8 * 3600 * 1_000_000


#: money expressions carry <= 6 decimals (price 2, discounted 4, charged 6),
#: so integer MICROS represent them exactly
_MICROS = 1_000_000
#: hi/lo split keeps each long sum in range past 1e10 rows per group (sf100+)
_SPLIT = 1_000_000_000


def money_sum_expr(expr: F.Column) -> F.Column:
    """Order-independent exact sum of a money expression (unaliased).

    Accumulates integer micros in plain longs — the codegen hash-aggregate
    fast path. (The previous DECIMAL(18,6) formulation promotes to a
    precision-28 BigDecimal accumulator, measured ~3x slower per sum at
    sf0.1.) The micros split hi/lo at 1e9 so group sums stay in-range past
    1e10 rows per group under ANSI mode; pmod keeps the hi*split+lo identity
    exact for negative money (acctbal). Both engines round the same double
    to the same micros and add the same integers — bit-identical results.
    """
    m = F.round(expr * _MICROS).cast("long")
    lo = F.pmod(m, F.lit(_SPLIT).cast("long"))
    hi = ((m - lo) / _SPLIT).cast("long")  # exact: numerator is a multiple of the split
    return (
        F.sum(hi).cast("double") * float(_SPLIT) + F.sum(lo).cast("double")
    ) / float(_MICROS)


def money_sum(expr: F.Column, alias: str) -> F.Column:
    """Order-independent sum of a money expression (see module docstring)."""
    return money_sum_expr(expr).alias(alias)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-by with 8 aggregates.

    Plan check: filter + 11->7 column pruning pushed to the parquet scan, one
    partial-aggregated exchange on (returnflag, linestatus) — 6 groups, so the
    reduce side is trivial at any scale.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (money_sum_expr(F.col("l_extendedprice")) / n).alias("avg_price"),
            (money_sum_expr(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, group, top-10 by revenue (orderkey tiebreak)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join; dims broadcast, facts shuffle once."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


def orders_stats_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footer-only COUNT/MIN/MAX over orders — parquet AGGREGATE pushdown.

    With `spark.sql.parquet.aggregatePushdown` and the DSv2 parquet
    source, partial-aggregate-free COUNT(*)/MIN/MAX compile into the
    BatchScan itself (`PushedAggregation: [COUNT(*), MIN(...), MAX(...)]`
    — plan-asserted in tests/test_plans.py): the scan answers from
    row-group footer statistics and reads NO data pages. At 100 TB this
    is the difference between a metadata round-trip and a full-table
    scan for the "table profile header" queries every catalog UI issues.
    The v2-source switch is scoped to plan construction (the resolved
    relation keeps its source after the conf is restored) because the
    rest of the engine stays on v1 parquet (bucketing, insertInto).
    """
    import os

    v1_before = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    agg_before = spark.conf.get("spark.sql.parquet.aggregatePushdown", None)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        # numeric + integer stats only: one timestamp_ntz min/max in the
        # list makes the source reject the WHOLE pushdown (unsupported
        # pushdown type — verified at sf0.001, whose o_orderdate is ntz)
        # and silently plan a full scan
        out = orders.agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
        )
        # force the FULL query execution pipeline (analysis + optimization
        # + physical planning) while the pushdown confs are active — the
        # V2ScanRelationPushDown rule reads them lazily at first plan
        # access, which without this happens after the finally block and
        # silently plans an unpushed aggregate
        out._jdf.queryExecution().executedPlan()  # noqa: SLF001
        return out
    finally:
        # conf.get(key, None) returns None when the key was never SET in
        # the session (even though a server-side default exists): restore
        # means UNSET in that case, or the "" override leaks session-wide
        # and silently flips every later parquet read to the v2 source
        # (which cannot serve bucketed scans)
        if v1_before is not None:
            spark.conf.set("spark.sql.sources.useV1SourceList", v1_before)
        else:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        if agg_before is not None:
            spark.conf.set("spark.sql.parquet.aggregatePushdown", agg_before)
        else:
            spark.conf.unset("spark.sql.parquet.aggregatePushdown")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume per ship year.

    The nation pair predicate lands on the two BROADCAST nation dims (n1
    via supplier, n2 via customer), so the lineitem fact stream is
    filtered by two broadcast-hash probes and shuffles once for the final
    aggregate; the OR-of-two-pairs condition is applied post-join where
    both nation names are in hand (Catalyst cannot push a cross-dim OR
    into either scan)."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    a, b = "NATION_3", "NATION_7"
    pair_ok = (
        (F.col("supp_nation") == a) & (F.col("cust_nation") == b)
    ) | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


def top_parts_per_brand(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k per group: revenue rank of parts within brand (window + filter)."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_part = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.col("p_partkey"))
    return (
        per_part.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def customer_order_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead window: per-customer order-to-order price delta."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        # raw double subtraction of identical inputs — bit-identical in DuckDB
        (F.col("o_totalprice") - prev).alias("price_delta"),
    )


def segment_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregates per market segment (incl. a semi-joined one)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).groupBy("c_mktsegment").agg(F.countDistinct("c_custkey").alias("n_buyers"))
    base = customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )
    return base.join(buyers, "c_mktsegment", "left").fillna(0, ["n_buyers"])


def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the 100 TB path for distinct counts.

    Tolerance-oracle form: HLL sketch values are engine-specific, so the
    query emits the EXACT count (hash-comparable with DuckDB) plus a boolean
    asserting the sketch landed within 5x its configured rsd (0.01 → 5%
    bound, a ~5-sigma margin; measured deviation on this data is ~0.7%).
    A sketch drift past the bound flips the boolean and fails the driver's
    hash compare — converting what was a rows-only check into a verified
    bounded-error row. (The exact twin for value consumers is
    ``segment_distinct_counts``; at 100 TB you'd run the sketch alone.)
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.01)
                - F.countDistinct("l_partkey")
            )
            <= 0.05 * F.countDistinct("l_partkey")
        ).alias("approx_within_bound"),
    )


def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface: anti join (orders with no lineitem) + status counts."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction over the events stream table (batch view)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.countDistinct("user_id").alias("n_users"),
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregate (batch twin of the streaming query)."""
    events = load_table(spark, sf_dir, "events")
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch")
    return events.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum(F.col("value"), "sum_value"),
    )


def events_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once -> exactly-once ingest dedup (batch twin).

    Simulates redelivery by unioning the stream with a copy of itself
    arriving 1 second later (same event_id — the idempotency key), then
    keeps the FIRST delivery per key: one window over (event_id), ordered
    by arrival time. The streaming twin is
    ``streaming.events.dedup_within_watermark`` (dropDuplicatesWithinWatermark),
    whose state store holds only the watermark horizon of keys — the
    standard Kafka-consumer idempotency pattern. Output aggregates so the
    oracle is insensitive to row order: per event_type, surviving count and
    exact value sum, which equal the ORIGINAL stream's (proof every
    duplicate died).
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select("event_id", "ts", "event_type", "value")
    # redelivery via ONE explode of (ts, ts+1s) per row instead of a Union
    # of the scan with itself (round 15, guide §2.4): Spark does not dedupe
    # common subplans, so the Union form scanned events twice to emit the
    # same rows this single pass emits. Row set identical.
    redelivered = base.select(
        "event_id",
        F.explode(
            F.array(F.col("ts"), F.col("ts") + F.expr("INTERVAL 1 SECOND"))
        ).alias("ts"),
        "event_type",
        "value",
    )
    w = Window.partitionBy("event_id").orderBy("ts")
    deduped = (
        redelivered.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum(F.col("value"), "sum_value"),
    )


def orders_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month; for each
    (cohort, months-since-first) cell, how many distinct customers ordered.

    Shape: one agg for first-order month (partial agg on o_custkey), join
    back (broadcast — cohort table is |customers|, prunable to two
    columns), then the retention agg on (cohort, offset). At 100 TB
    both aggs are partial-agg shuffles on narrow keys; nothing driver-side.
    """
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    first = orders.groupBy("o_custkey").agg(F.min(month).alias("cohort_month"))
    return (
        orders.join(first, "o_custkey")
        .select(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
            (
                (F.year(month) - F.year("cohort_month")) * 12
                + (F.month(month) - F.month("cohort_month"))
            )
            .cast("bigint")
            .alias("months_out"),
            "o_custkey",
        )
        .groupBy("cohort", "months_out")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


def customer_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-window surface: decile (ntile), percent_rank, cume_dist
    over account balance — computed from the DISTRIBUTED global rank
    (plans/ranking.py: range repartition + per-partition offsets), not a
    partition-less window, because the input here is the RAW customer
    table: a single-task sort over it is exactly the plan that dies at
    100x scale. With the unique (c_acctbal, c_custkey) tie-break all
    three window functions are pure expressions of (rank, n) and the
    output is bit-identical to the window form (parity-tested)."""
    from symat_hbase_tools_spark.plans.ranking import (
        cume_dist_from_rank,
        global_order_rank,
        ntile_from_rank,
        percent_rank_from_rank,
    )

    customer = load_table(spark, sf_dir, "customer")
    ranked, n = global_order_rank(
        customer.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        "rk",
    )
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        ntile_from_rank(F.col("rk"), n, 10).alias("decile"),
        percent_rank_from_rank(F.col("rk"), n).alias("pct_rank"),
        cume_dist_from_rank(F.col("rk"), n).alias("cume"),
    )


def fuzzy_name_pairs(
    spark: SparkSession, sf_dir: str, max_distance: int = 1
) -> DataFrame:
    """Edit-distance fuzzy matching: supplier-name pairs within levenshtein
    <= max_distance. Blocked by name length (|len(a)-len(b)| <= d is a
    necessary condition), which turns the quadratic all-pairs scan into a
    banded self-join — the standard blocking trick; at corpus scale the
    block key would also include a cheap prefix/phonetic bucket."""
    supplier = load_table(spark, sf_dir, "supplier")
    a = supplier.select(
        F.col("s_suppkey").alias("k1"),
        F.col("s_name").alias("n1"),
        F.length("s_name").alias("l1"),
    )
    b = supplier.select(
        F.col("s_suppkey").alias("k2"),
        F.col("s_name").alias("n2"),
        F.length("s_name").alias("l2"),
    )
    return (
        a.join(b, (F.col("k1") < F.col("k2")) & (F.abs(F.col("l1") - F.col("l2")) <= max_distance))
        .withColumn("distance", F.levenshtein("n1", "n2").cast("bigint"))
        .filter(F.col("distance") <= max_distance)
        .select("k1", "k2", "n1", "n2", "distance")
    )


def events_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join: events enriched with
    the customer dimension (broadcast), aggregated per segment/type."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        events.join(F.broadcast(dim), "user_id", "left")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value"), "sum_value"),
        )
    )


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming interval join: purchases matched to the
    same user's clicks in the preceding hour. Comparisons run at microsecond
    precision on both engines (Spark ts is already micro-truncated; the
    oracle compares epoch_us), so the matched row set is identical."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


def nation_customer_supplier_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface: INTERSECT / EXCEPT over nation keys.

    Output: one row per nation key with its membership class
    ('both' | 'customers_only' | 'suppliers_only').
    """
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    c_set, s_set = customer.distinct(), supplier.distinct()
    both = c_set.intersect(s_set).withColumn("membership", F.lit("both"))
    c_only = c_set.subtract(s_set).withColumn("membership", F.lit("customers_only"))
    s_only = s_set.subtract(c_set).withColumn("membership", F.lit("suppliers_only"))
    return both.unionByName(c_only).unionByName(s_only)


def events_sliding_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming 6h/1h sliding window (each event falls in
    6 windows — modeled by exploding the 6 window starts per event)."""
    events = load_table(spark, sf_dir, "events")
    hour0 = F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
    starts = F.explode(
        F.transform(F.sequence(F.lit(0), F.lit(5)), lambda i: hour0 - i * 3600)
    )
    return (
        events.select(starts.alias("window_start"), "event_type")
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def part_name_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: regexp extraction, casing, substring stats.

    brand_num extracted from 'Brand#NN'; per (brand_num, first word of name):
    counts, distinct types, max upper-cased name.
    """
    part = load_table(spark, sf_dir, "part")
    brand_num = F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int")
    first_word = F.substring_index("p_name", " ", 1)
    return (
        part.groupBy(brand_num.alias("brand_num"), first_word.alias("first_word"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_type").alias("n_types"),
            F.max(F.upper("p_name")).alias("max_name_upper"),
            F.sum(F.length("p_name")).alias("total_name_len"),
        )
    )


def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface: month truncation, extraction, day-of-week."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice"), "total_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(
                F.when(F.dayofweek("o_orderdate").isin(1, 7), 1).otherwise(0)
            ).alias("weekend_orders"),
        )
    )


def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): per-group, per-status subtotal, grand total.

    One expand + hash aggregate; at scale rollup multiplies shuffle rows by
    the number of grouping sets (3 here) — acceptable for low-cardinality
    dimension rollups, which is their use case.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice"), "total_price"),
    )


def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the Q1 grouping — all 4 grouping sets in one pass."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("sum_qty"),
    )


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority with one column per status."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .fillna(0, ["O", "F", "P"])
    )


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (median, p90).

    Exact percentile requires a per-group sort — fine for bounded groups.
    The unbounded-scale twin is ``price_percentiles_approx`` (KLL-sketch
    based, mergeable, single pass).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
    )


def price_percentiles_exact_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per return flag via distributed rank
    selection — the 100 TB path for exact percentiles.

    ``F.percentile`` buffers each group's values in ONE aggregation state
    (a per-group sort): exact but reducer-memory-bound at data scale. Here
    the values are globally ranked by (flag, price) with the distributed
    rank machinery (plans/ranking.py — range repartition + O(partitions)
    driver offsets), per-group positions derive from broadcast (min rank,
    count) per flag, and only the 2-4 boundary rows per (group,
    percentile) survive the filter; interpolation mirrors Spark's
    (n-1)*p linear rule exactly, so the output equals ``price_percentiles``
    bit-for-bit (same oracle).
    """
    from symat_hbase_tools_spark.plans.ranking import global_order_rank

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    ranked, _n = global_order_rank(
        lineitem, [F.col("l_returnflag"), F.col("l_extendedprice")], "rk"
    )
    groups = ranked.groupBy("l_returnflag").agg(
        F.min("rk").alias("rk0"), F.count(F.lit(1)).alias("n_g")
    )
    j = ranked.join(F.broadcast(groups), "l_returnflag").withColumn(
        "pos0", F.col("rk") - F.col("rk0")
    )
    cols = {}
    cond = F.lit(False)
    for name, p in (("p50", 0.5), ("p90", 0.9)):
        # Spark percentile: position (n-1)*p, linear interpolation
        pos = (F.col("n_g") - 1) * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        cond = cond | (F.col("pos0") == lo) | (F.col("pos0") == hi)
        frac = pos - lo
        v_lo = F.max(F.when(F.col("pos0") == F.floor((F.col("n_g") - 1) * F.lit(p)), F.col("l_extendedprice")))
        v_hi = F.max(F.when(F.col("pos0") == F.ceil((F.col("n_g") - 1) * F.lit(p)), F.col("l_extendedprice")))
        cols[name] = (p, v_lo, v_hi)
    boundary = j.filter(cond)
    agg = boundary.groupBy("l_returnflag", "n_g").agg(
        *[v_lo.alias(f"{name}_lo") for name, (p, v_lo, _) in cols.items()],
        *[v_hi.alias(f"{name}_hi") for name, (p, _, v_hi) in cols.items()],
    )
    out_cols = []
    for name, (p, _, _) in cols.items():
        # mirror quantile_cont / Spark percentile's interpolation form
        # (1-frac)*lo + frac*hi — the algebraically-equal lo+frac*(hi-lo)
        # differs in the last ulp and fails the bit-exact oracle compare
        pos = (F.col("n_g") - 1) * F.lit(p)
        frac = pos - F.floor(pos)
        out_cols.append(
            (
                (F.lit(1.0) - frac) * F.col(f"{name}_lo")
                + frac * F.col(f"{name}_hi")
            ).alias(name)
        )
    return agg.select("l_returnflag", *out_cols)


def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles — the 100 TB path (no per-group sort, one
    mergeable sketch pass).

    Tolerance-oracle form: sketch outputs are engine-specific, so the query
    emits the EXACT interpolated percentiles (hash-comparable with DuckDB's
    quantile_cont) plus booleans asserting each approx value is within 0.5%
    relative error of exact (measured deviation at accuracy=10000 is
    <=0.03%). Sketch drift flips the boolean and fails the driver's hash
    compare — a verified bounded-error row instead of rows-only.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")

    def ok(p: float, name: str) -> F.Column:
        exact = F.percentile("l_extendedprice", F.lit(p))
        approx = F.percentile_approx("l_extendedprice", F.lit(p), F.lit(10000))
        return (F.abs(approx - exact) <= 0.005 * exact).alias(name)

    return lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
        ok(0.5, "p50_within_bound"),
        ok(0.9, "p90_within_bound"),
    )


def asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the user's most recent signup
    at-or-before it.

    Spark has no native ASOF JOIN; when both sides share a partition key the
    idiomatic formulation is a per-key ordered window with a running
    last-non-null — one shuffle on user_id, no range explosion. (For keyless
    as-of joins, bucketize the time axis and equi-join buckets.)
    """
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    signup_us = F.when(F.col("event_type") == "signup", us)
    return (
        events.withColumn("last_signup_us", F.max(signup_us).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            us.alias("purchase_us"),
            "last_signup_us",
            (us - F.col("last_signup_us")).alias("us_since_signup"),
        )
    )


def q13_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join count, then a histogram of the counts.

    Two aggregations, both partial; the left anti-preserving outer join keeps
    customers with zero orders in the c_count=0 bucket.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: the max-acctbal customer of every nation.

    Spark formulation: window max + filter (one shuffle on nation); the
    DuckDB oracle uses the literal correlated subquery — same semantics,
    engine-appropriate plans. Ties (two customers at the nation max) are all
    returned, matching the correlated form.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return (
        customer.withColumn("max_bal", F.max("c_acctbal").over(w))
        .filter(F.col("c_acctbal") == F.col("max_bal"))
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between customer/supplier nation pairs
    per year (two nation dimensions joined from one broadcast table)."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n1 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"))
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated-min subquery).

    No partsupp table in the driver schema, so unit supply cost is derived
    from lineitem: min(l_extendedprice / l_quantity) per (part, supplier).
    Decorrelated as a window-min over the grouped costs, not a self-join:
    the fact-sized exchange ships partially-aggregated (part, supplier)
    rows, and the window's second exchange only moves that already-tiny
    grouped set — two exchanges total, one of them negligible at any scale.
    Ties at the per-part min are all returned (matches the correlated form).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    costs = (
        lineitem.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    return (
        costs.withColumn(
            "min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part.filter(F.col("p_size") < 15)), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("s_name").alias("supplier"),
            "s_acctbal",
            "unit_cost",
        )
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: target nation's share of AMERICA-region order volume
    per year — a conditional-aggregate ratio over a star join.

    Customer side restricts to region AMERICA (semi via broadcast inner);
    supplier side tags each row with its nation for the CASE split. The ratio
    divides two order-free DECIMAL sums, so the double result is identical
    across engines and row orders.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n_cust = nation.select(F.col("n_nationkey").alias("cn_key"), "n_regionkey")
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (money_sum_expr(target) / money_sum_expr(volume)).alias("mkt_share")
        )
    )


def heavy_hitter_users(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Exact heavy hitters: top-k users by event count (tiebreak user_id)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(k)
    )


def sketch_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch surface (Apache DataSketches, built into Spark 4):
    per event type, HLL distinct-user estimates and KLL value quantiles next
    to their exact twins.

    This is the 100 TB statistics path: one bounded-size sketch per
    partition merged map-side — group cardinality and quantiles without
    per-key shuffles or sorts. Sketch estimates are engine-specific, so the
    query is a rows-only check; the exact columns are gated via the exact
    operators (segment_distinct_counts, price_percentiles).
    """
    events = load_table(spark, sf_dir, "events")
    hll = F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
    # k=800: KLL compaction is RANDOMIZED (run-to-run nondeterministic), and
    # at the default k=200 the observed value-space median error on this
    # data reached 1.8% — a coin flip against a 2% bound (one sf0.1 sweep
    # DID flake it, round 6). k=800 quarters the rank error: observed worst
    # 0.46% over repeated runs, giving the 2% bound a real 4x margin while
    # the sketch stays KB-sized and mergeable.
    kll = F.expr(
        "kll_sketch_get_quantile_double(kll_sketch_agg_double(value, 800), 0.5)"
    )
    exact_users = F.countDistinct("user_id")
    exact_p50 = F.expr("percentile(value, 0.5)")
    return events.groupBy("event_type").agg(
        exact_users.alias("exact_users"),
        exact_p50.alias("exact_p50_value"),
        # tolerance-oracle booleans (DuckDB side emits TRUE): HLL within 5%
        # of exact (default lgK=12 → ~1.6% rse, measured 0.4% here; 3+ sigma
        # margin), KLL median within 2% of the exact interpolated median.
        # Sketch drift past either bound fails the driver's hash compare.
        (F.abs(hll - exact_users) <= 0.05 * exact_users).alias("hll_within_bound"),
        (F.abs(kll - exact_p50) <= 0.02 * F.abs(exact_p50)).alias(
            "kll_within_bound"
        ),
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap > 8h starts a new session (lag + count)."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull(), 0).when(us - prev > SESSION_GAP_US, 1).otherwise(0)
    return (
        events.select("user_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(
            (F.sum("is_new") + 1).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-subquery priority count, decorrelated as a
    left-semi join whose condition spans both sides (late-shipment orders).

    No commit/receipt dates in the driver schema, so "late" means a lineitem
    shipped more than 60 days after the order date. The semi join keeps each
    order at most once regardless of how many lineitems qualify — exactly the
    EXISTS semantics; the fact table shuffles once on the join key.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a fraction of the global
    total (scalar-subquery HAVING).

    The scalar total is a second aggregation over the same grouped result —
    Catalyst plans it as a 1-row broadcast cross join, so the fact scans once,
    the grouped set scans twice (it is |part|-sized, negligible), and no
    per-row correlated evaluation ever happens. DECIMAL sums keep the
    threshold comparison bit-identical across engines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy("l_partkey").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "part_value")
    )
    avg_value = per_part.agg(
        (
            F.sum(F.col("part_value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("t")
    )
    return (
        per_part.join(F.broadcast(avg_value))
        .filter(F.col("part_value") > F.col("t") * 1.5)
        .select("l_partkey", "part_value")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share per year — a conditional
    CASE aggregate ratio over a broadcast part join. Both sums are exact
    integer-micros (order-free), divided once per group, so the double
    ratio is identical across engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            (F.lit(100.0) * money_sum_expr(promo) / money_sum_expr(revenue)).alias(
                "promo_revenue_pct"
            )
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity lineitems, where "small"
    is relative to the part's own average quantity (correlated AVG).

    Decorrelated in two map-reduce passes over the brand-restricted fact
    slice: the broadcast part filter shrinks lineitem first, the per-part
    average is a partial-aggregated shuffle on l_partkey, and the filtered
    fact joins back to that tiny aggregate (AQE picks broadcast). The
    correlated subquery never executes per-row. Average compares as exact
    decimal-sum / count on both engines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    li = lineitem.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (money_sum(F.col("l_extendedprice"), "s"))
        )
        .select((F.col("s") / 7.0).alias("avg_yearly"))
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING-subquery IN), joined back to customer and order dimensions.

    The heavy lineitem aggregation happens FIRST (partial agg on the natural
    join key, no pre-join blowup); only the few qualifying orderkeys flow
    into the joins, which AQE turns into broadcasts at any realistic
    selectivity. Integral quantity sums are exact in double.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice"),
            "sum_qty",
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning both
    join sides (brand x size x quantity bands).

    The per-side conjuncts (partkey equality, the brand/size/quantity range
    unions) are pushed below the join by Catalyst — the scan reads only rows
    that can satisfy SOME disjunct; the residual cross-side disjunction
    evaluates post-join inside codegen. One broadcast join, one scalar agg.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disjunct = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(disjunct)
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (scalar AVG subquery + NOT EXISTS anti join), grouped by nation.

    The scalar average broadcasts as a 1-row cross join; the anti join
    against date-filtered orders is the NOT EXISTS — the date predicate is
    pushed into the orders scan before the join, so the anti join probes
    only the recent slice. Threshold comparison uses the same exact
    decimal-sum/count average on both engines. (Every customer in the
    driver data has SOME order, so idleness is defined over 2001+.)
    """
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    pos = customer.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    The whole query is one parquet scan with every predicate pushed
    (shipdate range + discount band + quantity cap all appear in
    PushedFilters) feeding a single global money sum — the cheapest plan
    Spark can produce, and the canonical pushdown litmus test.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy()
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: multi-way star join + profit aggregate by nation/year.

    lineitem joins part (filtered to PROMO — pushed below the join),
    supplier, and nation; profit per line is revenue minus a cost proxy
    (half retail price per unit — the driver schema has no ps_supplycost).
    Join order: the filtered part table and the tiny supplier/nation dims
    all broadcast, so the fact table never shuffles before aggregation.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.5) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(money_sum(profit, "sum_profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.

    Returned lineitems of one quarter's orders, joined back to customer +
    nation; deterministic top-k (revenue desc, custkey asc tie-break) so
    the result set is stable across engines. orders/customer join keys
    shuffle once each; nation broadcasts.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q12_late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class counts of late shipments (the driver
    schema has no l_shipmode, so the classing column is l_linestatus).

    "Late" reuses the q4 definition (shipped >60 days after the order
    date). One fact-dimension join on the order key, then a two-bucket
    conditional count — CASE-inside-SUM, the classic Q12 idiom.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the max
    (scalar MAX subquery over a revenue view).

    Decorrelated as a window max over the aggregated view — one extra
    exchange over a supplier-cardinality table (tiny next to the fact
    scan), instead of running the view twice. Revenue equality is exact:
    both engines compute the identical money-sum double.
    """
    revenue = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    # argmax via broadcast-singleton join, NOT a partition-less window max:
    # the window form funnels the whole supplier-revenue aggregate through
    # one partition (SF x 10k rows — 10^9 at SF100k); the broadcast of the
    # 1-row max costs nothing and keeps the filter map-side.
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    top = revenue.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("mx")
    ).drop("mx")
    supplier = load_table(spark, sf_dir, "supplier")
    return top.join(
        F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "total_revenue")


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute group
    with NOT-IN exclusions (lineitem stands in for partsupp).

    The exclusion predicates prune the broadcast part side before the
    join; countDistinct adds the usual expand+two-phase aggregate, keyed
    by (brand, type, size) — low cardinality, no skew concern.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of SMALL parts in
    1996 (nested-IN subqueries decorrelated to semi joins).

    Inner block: per (part, supplier) shipped quantity over the year,
    kept when > 100 units and the part is SMALL-type. Outer: suppliers
    appearing in the kept set — a semi join, preserving IN semantics
    (each supplier once however many qualifying parts it has).
    """
    small_parts = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100.0)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.join(
            shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        ).select("s_suppkey", "s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who single-handedly held up finished
    multi-supplier orders — EXISTS plus NOT-EXISTS correlated subqueries,
    decorrelated to one semi and one anti join on the order key.

    "Late" reuses the q4 definition (shipped >60 days after order date).
    A lineitem counts when: its order is status 'F'; SOME other supplier
    shipped on the same order (semi join); NO other supplier was late on
    it (anti join). Orders counted distinct per supplier.
    """
    orders_f = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    late = lineitem.join(
        orders_f, F.col("l_orderkey") == F.col("o_orderkey")
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    l1 = late.select("l_orderkey", "l_suppkey", "o_orderdate")
    others = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    with_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole_late = with_other.join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


def price_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate surface: stddev / covariance / correlation of
    quantity vs extended price per return flag.

    Built-in stddev/corr accumulate in double, so their results are
    partition-order-dependent and can drift a ulp between engines. Instead
    the five power sums accumulate EXACTLY as plain longs — quantity is
    integral, price becomes integer cents (2 decimals), and the one sum that
    could overflow a long (sum of squared cents, ~1e14 per row) is carried
    as a hi/lo pair split at 1e9 — then the moments are assembled in double
    from identical integers with the identical expression on both engines:
    bit-identical results. All-long aggregation stays on the codegen hash
    fast path (the DECIMAL(38) formulation ran on BigDecimal, ~3x slower
    than Q1; this runs at Q1 speed). Overflow headroom: sum(lo) < 1e9/row —
    safe past 6e9 rows/group (sf100) under ANSI mode.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    xq = F.col("l_quantity").cast("long")  # integral by construction
    c = F.round(F.col("l_extendedprice") * 100).cast("long")  # exact cents
    cc = c * c
    split = F.lit(1_000_000_000).cast("long")
    g = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xq).alias("sx_i"),
        F.sum(c).alias("sy_c"),
        F.sum(xq * xq).alias("sxx_i"),
        # hi = (cc - cc%split)/split: the numerator is an exact multiple of
        # split, so the double division is exact — no floor-rounding hazard
        F.sum(((cc - cc % split) / split).cast("long")).alias("syy_hi"),
        F.sum(cc % split).alias("syy_lo"),
        F.sum(xq * c).alias("sxy_c"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx_i").cast("double")
    sy = F.col("sy_c").cast("double") / 100.0
    sxx = F.col("sxx_i").cast("double")
    syy = (F.col("syy_hi").cast("double") * 1.0e9 + F.col("syy_lo").cast("double")) / 1.0e4
    sxy = F.col("sxy_c").cast("double") / 100.0
    var_x = (n * sxx - sx * sx) / (n * (n - 1))
    var_y = (n * syy - sy * sy) / (n * (n - 1))
    covar = (n * sxy - sx * sy) / (n * (n - 1))
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    # the large power sums (syy ~ 1e13 at 6 decimals) convert decimal->double
    # with engine-specific last-ulp rounding, so derived moments are rounded
    # to 6 decimals (same convention as the similarity scores); the plain
    # averages divide already-bit-identical sums and stay unrounded.
    return g.select(
        "l_returnflag",
        F.col("n"),
        (sx / n).alias("avg_qty"),
        (sy / n).alias("avg_price"),
        F.round(F.sqrt(var_x), 6).alias("stddev_qty"),
        F.round(F.sqrt(var_y), 6).alias("stddev_price"),
        F.round(covar, 6).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


def customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame surface: per-customer running spend, 3-order moving
    average, first order date — ranking + frame aggregates + first_value in
    ONE window spec (one shuffle on the partition key).

    The running sum accumulates exact integer cents inside the frame (a
    frame-ordered double sum would tie the result to each engine's window
    accumulation strategy); divisions assemble doubles from identical
    integers, so results are bit-identical cross-engine.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    w3 = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("order_index"),
        (F.sum(cents).over(wf).cast("double") / 100.0).alias("running_spend"),
        (
            F.sum(cents).over(w3).cast("double")
            / (F.count(F.lit(1)).over(w3).cast("double") * 100.0)
        ).alias("moving_avg3"),
        F.date_format(F.first("o_orderdate").over(wf), "yyyy-MM-dd").alias(
            "first_order_date"
        ),
    )


def click_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel (batch twin of the streaming LEFT OUTER interval
    join): every click, matched to same-user purchases within the following
    hour — unconverted clicks survive with null purchase columns.

    Comparisons run at microsecond precision on both engines, so the
    matched row set is identical (see purchase_attribution).
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .select(
            "click_id",
            "user_id",
            "purchase_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


def click_conversion_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete conversion ledger (batch twin of the streaming FULL OUTER
    interval join): matched click/purchase pairs, unconverted clicks, and
    purchases with no click in the preceding hour — one FULL OUTER interval
    join. The unmatched-purchase side is what LEFT misses: attribution
    audits need to see revenue with no click trail."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
            "full",
        )
        .select(
            "click_id",
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
            "purchase_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


def heavy_hitters_sketch(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Frequent-items sketch top-k (approx_top_k, Spark 4) — the 100 TB
    heavy-hitter path: one bounded-size sketch per partition merged
    map-side, no per-key shuffle.

    Tolerance-oracle form: the output is the EXACT top-k (count desc,
    user_id tiebreak — deterministic, hash-comparable) with a per-row
    boolean stating the sketch's ACTUAL contract, so it holds at every
    scale: an item whose true count exceeds the sketch's a-priori error
    bound (~n/maxItemsTracked; 4x margin used here — DataSketches'
    ItemsSketch epsilon is ~3.5/maxMapSize) must appear among the
    sketch's top (k+50) with an estimate within that bound; an item BELOW
    the bound carries no guarantee and passes vacuously. The round-6
    formulation asserted est == exact, whose premise (maxItemsTracked >=
    true cardinality) broke on the sf1 probe: 15k distinct users > 10k
    tracked, and the true top count (99 of 1M events) sits under n/M =
    100 — the sketch is THEORY-CORRECT to drop it, so the check, not the
    sketch, was wrong at scale. A bound violation still fails the
    driver's hash compare."""
    events = load_table(spark, sf_dir, "events")
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(k)
    )
    max_items = 10_000
    # ONE row: the sketch and the total count from the same scan; cross-
    # joined (broadcast, 1 row) onto the k exact rows so every row — even
    # one the sketch dropped — sees n_total for its bound. The per-row
    # sketch lookup is a 60-element array filter: interpreted, but over
    # k x (k+50) cells total, driver-scale not data-scale.
    sketch_and_total = events.agg(
        F.expr(f"approx_top_k(user_id, {k + 50}, {max_items})").alias("tk"),
        F.count(F.lit(1)).alias("n_total"),
    )
    joined = exact.crossJoin(F.broadcast(sketch_and_total))
    hit = F.filter("tk", lambda e: e["item"] == F.col("user_id"))
    est = F.when(F.size(hit) > 0, F.element_at(hit, 1)["count"])
    bound = F.lit(4.0) * F.col("n_total") / F.lit(max_items)
    return (
        joined.select(
            "user_id",
            "n_events",
            F.when(F.col("n_events") <= bound, F.lit(True))
            .otherwise(
                # both error directions: a Misra-Gries-style lower-bound
                # count can UNDERestimate, and an arbitrarily low estimate
                # of a tracked heavy item is just as much a bound breach
                # as an overestimate — (est - exact) <= bound alone would
                # pass it
                F.coalesce(
                    F.abs(est - F.col("n_events")) <= bound, F.lit(False)
                )
            )
            .alias("sketch_within_bound"),
        )
        .orderBy(F.desc("n_events"), "user_id")
    )


def orders_equidepth_histogram(
    spark: SparkSession, sf_dir: str, n_buckets: int = 10
) -> DataFrame:
    """Equal-depth (equi-height) histogram of order totals: decile
    cutpoints from the exact interpolated percentile, then a per-bucket
    census — the optimizer-statistics / distribution-report shape (each
    bucket holds ~10% of rows, unlike the fixed-width histograms of
    doc_length_histogram).

    Scale shape: ONE percentile aggregate produces the 9-cut row
    (percentile needs a sort of the value column — the approx-sketch twin
    is the unbounded path, as with price_percentiles_approx), broadcast
    back; bucket assignment is 9 codegen comparisons summed — no
    higher-order functions, no join explosion; then one partial-aggregated
    k-group census with exact money sums.
    """
    orders = load_table(spark, sf_dir, "orders")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE percentile aggregate over the percentage ARRAY — nine separate
    # percentile() aggs each maintain their own sort buffer over the same
    # column (9x the aggregation state and compiled code for identical
    # input); the array form computes all cutpoints from a single buffer
    cut_arr = F.percentile(
        "o_totalprice", F.array(*[F.lit(q) for q in qs])
    ).alias("cs")
    cuts = orders.agg(cut_arr).select(
        *[F.col("cs").getItem(i).alias(f"c{i + 1}") for i in range(len(qs))]
    )
    j = orders.select("o_totalprice").join(F.broadcast(cuts))
    bucket = None
    for i in range(1, n_buckets):
        term = (F.col("o_totalprice") > F.col(f"c{i}")).cast("int")
        bucket = term if bucket is None else bucket + term
    return j.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        money_sum(F.col("o_totalprice"), "sum_total"),
    )


def part_affinity_lift(
    spark: SparkSession, sf_dir: str, min_cooccur: int = 2
) -> DataFrame:
    """Market-basket affinity over order baskets: for every pair of parts
    co-ordered at least ``min_cooccur`` times, the support and LIFT
    (P(a,b) / (P(a) P(b))) — the co-purchase / cross-sell staple, and in
    an LLM-data context the co-occurrence association mining shape
    (PMI over baskets is ln(lift)).

    Exactness: all counts are exact bigints; support and lift are single
    divisions of exact bigint PRODUCTS (n_ab * n_orders vs n_a * n_b,
    both far inside int64 at any per-basket-bounded workload) — both
    engines divide identical integers, bit-stable.

    Scale shape: baskets reduce to DISTINCT (order, part) first; the
    pair generation is a SELF-JOIN ON THE ORDER KEY — candidate volume
    is sum over orders of items^2, bounded by the basket-size cap (TPC-H
    ~7), NOT corpus^2; the pair aggregate is partial map-side. Per-part
    counts are a vocab-sized table broadcast back twice. One data-scale
    shuffle on the pair key.

    Output: (part_a, part_b, n_ab, n_a, n_b, support, lift), part_a <
    part_b.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # basket-count total as a LAZY broadcast one-row subplan (an eager
    # .count() here would run a job at plan-construction time — the
    # lsh_topk_df n_rows=None lesson)
    tot = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_cooccur)
    )
    part_counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    ca = part_counts.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    cb = part_counts.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.col("n_orders")).alias(
                "support"
            ),
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


def customer_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue classification of customers — the classic
    inventory-analysis cut (class A carries the first 80% of revenue, B
    the next 15%, C the tail) a revenue-ops owner runs before tiering
    service levels.

    Exactness: per-customer revenue is an exact integer-cents sum; the
    running revenue is a distributed prefix sum under the TOTAL order
    (cents desc, custkey) — plans/ranking.ordered_prefix_sum, the same
    no-single-partition-window machinery as the split-point byte tape —
    and the 80/95 class cuts are INTEGER comparisons (cum*5 <= total*4,
    cum*20 <= total*19: small multipliers so the products stay in int64
    headroom far past this corpus), so the boundary customer lands in the
    same class on every engine. INCLUSIVE cumulative semantics: a
    customer belongs to A iff the running total THROUGH them is within
    80% of grand revenue.

    Scale shape: one partial-aggregated per-customer pass, the prefix-sum
    machinery over the REDUCED (customers-sized) table, a 1-row grand
    total broadcast, and a 3-group census.
    """
    from symat_hbase_tools_spark.plans.ranking import ordered_prefix_sum

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev_cents"))
    cum = ordered_prefix_sum(
        per_cust,
        [F.desc("rev_cents"), F.col("o_custkey")],
        "rev_cents",
        out_col="cum_cents",
    )
    total = per_cust.agg(F.sum("rev_cents").alias("total_cents"))
    classed = cum.crossJoin(F.broadcast(total)).select(
        "o_custkey",
        "rev_cents",
        F.when(F.col("cum_cents") * 5 <= F.col("total_cents") * 4, "A")
        .when(F.col("cum_cents") * 20 <= F.col("total_cents") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "total_cents",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_cents").alias("revenue_cents"),
        (
            F.sum("rev_cents").cast("double") / F.first("total_cents")
        ).alias("revenue_share"),
    )
