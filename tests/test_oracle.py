"""Local mirror of the driver's t2 gate: every queries() entry that has an
oracle_sql() twin runs on both engines over the same parquet; row count,
column names, and values must match EXACTLY (the driver hashes values, so a
1-ulp float drift is a failure — the queries are designed for bit-equality,
see symat_hbase_tools_spark/entry.py docstring)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


# ONE canonicalization shared with the sweep gate — two copies is how the
# round-5 compare-vs-driver-hash divergence happened (numeric-class
# sensitivity: int64 vs HUGEINT->float64 vs DECIMAL must all FAIL across
# classes even where Python == says equal)
from tools.sf_sweep import canon_cell, canon_rows  # noqa: E402


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_query_has_callable():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    s_rows, s_cols = canon_rows(spark_pdf)
    d_rows, d_cols = canon_rows(duck_pdf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)} rows"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_still_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_entry_has_oracle_paired_check_twin(name):
    """Mechanical link: every rows-only entry must map to a check query
    that IS oracle-paired (round-10 verdict #7) — a rename or removal of a
    check twin can't silently orphan its rows-only op."""
    from symat_hbase_tools_spark.entry import ROWS_ONLY_CHECK_TWINS

    assert name in ROWS_ONLY_CHECK_TWINS, (
        f"{name} is rows-only but has no declared check twin"
    )
    twin = ROWS_ONLY_CHECK_TWINS[name]
    assert twin in QUERIES, f"{name}: twin {twin} not in queries()"
    assert twin in ORACLES, f"{name}: twin {twin} is not oracle-paired"


def test_check_twin_map_has_no_stale_entries():
    """The twin map must not keep rows for entries that are no longer
    rows-only (gained an oracle) or no longer exist."""
    from symat_hbase_tools_spark.entry import ROWS_ONLY_CHECK_TWINS

    rows_only = set(QUERIES) - set(ORACLES)
    assert set(ROWS_ONLY_CHECK_TWINS) == rows_only


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_price_quantity_stats_close_to_builtin(spark):
    """The decimal-power-sum moments must agree with Spark's built-in
    stddev/covar/corr to float tolerance (they differ only in summation
    order / final rounding)."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.operators.relational import price_quantity_stats
    from symat_hbase_tools_spark.sources.tables import load_table

    got = {r["l_returnflag"]: r for r in price_quantity_stats(spark, SF_DIR).collect()}
    ref = {
        r["l_returnflag"]: r
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.stddev("l_quantity").alias("sd_q"),
            F.stddev("l_extendedprice").alias("sd_p"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
            F.corr("l_quantity", "l_extendedprice").alias("cr"),
        )
        .collect()
    }
    for flag, r in got.items():
        b = ref[flag]
        assert abs(r["stddev_qty"] - b["sd_q"]) < 1e-5
        assert abs(r["stddev_price"] - b["sd_p"]) < 1e-4
        assert abs(r["covar_qty_price"] - b["cv"]) < 1e-4
        assert abs(r["corr_qty_price"] - b["cr"]) < 1e-6
