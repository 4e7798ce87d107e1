"""Bucketed-layout tests: the co-located path must plan ZERO exchanges for
row-keyed maintenance operations (diff, repair) — the 100 TB property the
module exists for."""

from __future__ import annotations

import pytest

from symat_hbase_tools_spark.operators.diff import cells_diff
from symat_hbase_tools_spark.operators.repair import repair_changeset
from symat_hbase_tools_spark.sources.bucketed import read_bucketed, write_bucketed
from symat_hbase_tools_spark.sources.cells import customer_cells


@pytest.fixture(scope="module")
def bucketed_pair(spark, customer):
    auth = customer_cells(customer)
    # bucket on the FULL coordinate key: Spark requires co-partitioning on
    # all join keys by default (spark.sql.requireAllClusterKeysForCoPartition)
    coord = ["row", "family", "qualifier"]
    write_bucketed(auth, "t_bk_auth", coord, n_buckets=8)
    write_bucketed(auth, "t_bk_replica", coord, n_buckets=8)
    yield read_bucketed(spark, "t_bk_auth"), read_bucketed(spark, "t_bk_replica")
    spark.sql("DROP TABLE IF EXISTS t_bk_auth")
    spark.sql("DROP TABLE IF EXISTS t_bk_replica")


def test_diff_on_bucketed_tables_is_exchange_free(spark, bucketed_pair):
    a, r = bucketed_pair
    plan = cells_diff(a, r)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_repair_on_bucketed_tables_is_exchange_free(spark, bucketed_pair):
    """repair = two visible-view aggregations + full-outer join + filter —
    all satisfied by the write-time (row, family, qualifier) bucketing, so
    not one exchange."""
    a, r = bucketed_pair
    plan = repair_changeset(a, r, 999_999)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_diff_result_matches_unbucketed(spark, customer, bucketed_pair):
    a, r = bucketed_pair
    assert cells_diff(a, r).count() == 0  # identical snapshots
    assert repair_changeset(a, r, 999_999).count() == 0
