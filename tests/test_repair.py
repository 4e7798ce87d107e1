"""Replica-repair operator tests (CopyRow generalized to table scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.kv import visible_cells
from symat_hbase_tools_spark.operators.repair import (
    repair,
    repair_changeset,
    repair_counters,
    repair_visible,
)
from symat_hbase_tools_spark.sources.cells import CELL_TS, customer_cells

REPAIR_TS = CELL_TS + 9000


def _views(df):
    return {
        (bytes(r["row"]), r["family"], bytes(r["qualifier"]), bytes(r["value"]))
        for r in df.select("row", "family", "qualifier", "value").collect()
    }


def _replica(cells):
    qual = F.decode("qualifier", "UTF-8")
    custkey = F.regexp_extract(F.decode("row", "UTF-8"), r"cust#(\d+)", 1).cast("long")
    tampered = F.when(
        (qual == "c_acctbal") & (custkey % 7 == 0), F.encode(F.lit("XX"), "UTF-8")
    ).otherwise(F.col("value"))
    replica = cells.withColumn("value", tampered).filter(
        ~((qual == "c_name") & (custkey % 11 == 0))
    )
    bogus = (
        cells.filter((qual == "c_name") & (custkey % 13 == 0))
        .withColumn("qualifier", F.encode(F.lit("c_bogus"), "UTF-8").cast("binary"))
    )
    return replica.unionByName(bogus)


def test_repair_restores_authoritative_view(spark, customer):
    auth = customer_cells(customer)
    repaired, changeset = repair(auth, _replica(auth), REPAIR_TS)
    assert _views(visible_cells(repaired)) == _views(visible_cells(auth))
    # repairs are NEW versions — replica history under repair_ts is intact
    n_hist = repaired.filter(F.col("ts") < REPAIR_TS).count()
    assert n_hist == _replica(auth).count()


def test_changeset_tags_and_counters(spark, customer):
    auth = customer_cells(customer)
    cs = repair_changeset(auth, _replica(auth), REPAIR_TS)
    tags = {r["change"]: r["n"] for r in cs.groupBy("change").agg(F.count("*").alias("n")).collect()}
    n = customer.count()
    assert tags["restore"] == customer.filter(F.col("c_custkey") % 7 == 0).count()
    assert tags["missing"] == customer.filter(F.col("c_custkey") % 11 == 0).count()
    assert tags["extraneous"] == customer.filter(F.col("c_custkey") % 13 == 0).count()
    row = repair_counters(cs).collect()[0]
    assert (row["restored"], row["backfilled"], row["deleted"]) == (
        tags["restore"],
        tags["missing"],
        tags["extraneous"],
    )
    # every Delete in the changeset carries a null value (a marker, not data)
    assert cs.filter((F.col("type") == "Delete") & F.col("value").isNotNull()).count() == 0


def test_repair_visible_equals_apply_then_resolve(spark, customer):
    """Merge-on-read apply (repair_visible) and append-then-re-resolve
    (repair + visible_cells) are the same read — row-for-row, and the
    repaired view equals the authoritative one."""
    auth = customer_cells(customer)
    fixed = repair_visible(auth, _replica(auth), REPAIR_TS)
    repaired, _ = repair(auth, _replica(auth), REPAIR_TS)
    assert _views(fixed) == _views(visible_cells(repaired))
    assert _views(fixed) == _views(visible_cells(auth))
    # changed coordinates surface at repair_ts; untouched ones keep their ts
    changed = fixed.filter(F.col("ts") == REPAIR_TS).count()
    n7 = customer.filter(F.col("c_custkey") % 7 == 0).count()
    n11 = customer.filter(F.col("c_custkey") % 11 == 0).count()
    assert changed == n7 + n11


def test_repair_is_idempotent(spark, customer):
    auth = customer_cells(customer)
    repaired, _ = repair(auth, _replica(auth), REPAIR_TS)
    second = repair_changeset(auth, repaired, REPAIR_TS + 1000)
    assert second.count() == 0
