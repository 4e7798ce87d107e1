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
