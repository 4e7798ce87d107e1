"""Skew-utility tests: salted aggregation and salted join must equal their
unsalted equivalents while spreading hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_matches_plain(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", i * 1.0) for i in range(9000)] + [
        (f"k{i % 50}", i * 1.0) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        (r["k"], r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = salted_aggregate(
        df,
        ["k"],
        aggs=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
        final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
    )
    assert {(r["k"], r["n"], r["s"]) for r in salted.collect()} == plain


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(5000)] + [(f"k{i}", i) for i in range(100)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"S{i}") for i in range(100)], "k string, tag string"
    )
    plain = {(r["k"], r["v"], r["tag"]) for r in big.join(small, "k").collect()}
    salted = {(r["k"], r["v"], r["tag"]) for r in salted_join(big, small, "k").collect()}
    assert salted == plain


def test_salted_join_left(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    small = spark.createDataFrame([("a", "A")], "k string, tag string")
    got = {(r["k"], r["tag"]) for r in salted_join(big, small, "k", how="left").collect()}
    assert got == {("a", "A"), ("b", None)}


def test_part_affinity_lift_matches_python(spark):
    """Basket-affinity counts and lift vs a python recomputation; the
    self-join must be order-key-bounded (no cartesian) and the part-count
    tables broadcast."""
    from collections import Counter
    from itertools import combinations

    from symat_hbase_tools_spark.operators.relational import part_affinity_lift
    from symat_hbase_tools_spark.plans.explain import plan_string
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    df = part_affinity_lift(spark, SF_DIR)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2, plan
    got = {
        (r["part_a"], r["part_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["support"], r["lift"])
        for r in df.collect()
    }
    baskets: dict = {}
    for r in load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect():
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n_orders = len(baskets)
    pair_c: Counter = Counter()
    part_c: Counter = Counter()
    for parts in baskets.values():
        part_c.update(parts)
        pair_c.update(combinations(sorted(parts), 2))
    want = {
        p: (
            c,
            part_c[p[0]],
            part_c[p[1]],
            c / n_orders,
            c * n_orders / (part_c[p[0]] * part_c[p[1]]),
        )
        for p, c in pair_c.items()
        if c >= 2
    }
    assert got == want and len(got) > 0
    # lift sanity: a pair co-ordered as often as independence predicts has
    # lift ~1; every emitted pair beats the min-support floor
    assert all(v[0] >= 2 for v in got.values())
