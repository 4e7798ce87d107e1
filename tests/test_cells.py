"""Cell-layer tests: encoding, point get, key-only scan, projection,
latest-version-wins, wide codec — SURVEY.md §2.1 operators on FIXTURES.md §B
fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators import kv
from symat_hbase_tools_spark.plans.explain import (
    assert_read_schema_only,
    plan_string,
)
from symat_hbase_tools_spark.sources.cells import (
    CELL_TS,
    CUSTOMER_QUALIFIERS,
    customer_cells,
    customer_cells_versioned,
    cells_to_wide,
)


def test_cells_shape(spark, customer):
    cells = customer_cells(customer)
    n_cust = customer.count()
    assert cells.count() == n_cust * len(CUSTOMER_QUALIFIERS)
    assert [f.name for f in cells.schema.fields] == [
        "row",
        "family",
        "qualifier",
        "ts",
        "type",
        "value",
    ]
    # encoding is a narrow map: no shuffle in the plan
    assert "Exchange" not in plan_string(cells, "simple")


def test_point_get(spark, customer):
    cells = customer_cells(customer)
    got = kv.point_get(cells, b"cust#00000042").collect()
    assert len(got) == len(CUSTOMER_QUALIFIERS)
    by_q = {bytes(r["qualifier"]).decode(): bytes(r["value"]).decode() for r in got}
    ref = customer.filter(F.col("c_custkey") == 42).collect()[0]
    assert by_q["c_name"] == ref["c_name"]
    assert by_q["c_nationkey"] == str(ref["c_nationkey"])
    assert by_q["c_acctbal"] == "%.2f" % ref["c_acctbal"]
    assert all(r["ts"] == CELL_TS for r in got)


def test_point_get_missing_row_is_empty(spark, customer):
    cells = customer_cells(customer)
    assert kv.point_get(cells, b"cust#99999999").count() == 0


def test_keyonly_scan(spark, customer):
    cells = customer_cells(customer)
    keys = kv.keyonly_scan(cells)
    assert keys.count() == customer.count()
    assert keys.columns == ["row"]


def test_keyonly_scan_prunes_columns(spark, customer, tmp_path):
    # write cells to parquet so ReadSchema pruning is observable
    path = str(tmp_path / "cells")
    customer_cells(customer).write.parquet(path)
    keys = kv.keyonly_scan(spark.read.parquet(path))
    assert_read_schema_only(keys, {"row"})


def test_column_projection(spark, customer):
    cells = customer_cells(customer)
    proj = kv.column_projection(cells, ["c_name", "c_acctbal"])
    assert proj.count() == customer.count() * 2
    quals = {bytes(r["qualifier"]).decode() for r in proj.select("qualifier").distinct().collect()}
    assert quals == {"c_name", "c_acctbal"}


def test_list_families(spark, customer):
    assert kv.list_families(customer_cells(customer)) == ["cf"]


def test_latest_cells(spark, customer):
    versioned = customer_cells_versioned(customer, n_versions=3)
    assert versioned.count() == customer.count() * len(CUSTOMER_QUALIFIERS) * 3
    latest = kv.latest_cells(versioned)
    assert latest.count() == customer.count() * len(CUSTOMER_QUALIFIERS)
    sample = latest.filter(F.col("row") == F.lit(b"cust#00000042")).collect()
    assert all(r["ts"] == CELL_TS + 2000 for r in sample)
    # latest version carries the plain (un-suffixed) value
    assert all(not bytes(r["value"]).decode().endswith("@v0") for r in sample)
    assert all(not bytes(r["value"]).decode().endswith("@v1") for r in sample)


def test_latest_cells_maxby_matches_packed_reference(spark, customer):
    """The production max_by formulation and the packed-binary-max semantic
    reference pick identical winners — including on crafted ties (equal ts
    Put-vs-Delete resolves to Delete; equal (ts, type) resolves on unsigned
    value bytes)."""
    versioned = customer_cells_versioned(customer, n_versions=3)
    ties = spark.createDataFrame(
        [
            # equal ts, Delete beats Put
            (b"tie#1", "cf", b"q", 100, "Put", b"aaa"),
            (b"tie#1", "cf", b"q", 100, "Delete", None),
            # equal (ts, type): higher unsigned value bytes win
            (b"tie#2", "cf", b"q", 100, "Put", b"\x01"),
            (b"tie#2", "cf", b"q", 100, "Put", b"\xff"),
            (b"tie#2", "cf", b"q", 99, "Put", b"zzz"),
        ],
        schema="row binary, family string, qualifier binary, ts long, type string, value binary",
    )
    both = versioned.unionByName(ties)

    def canon(df):
        # the packed reference can't represent a NULL value (it round-trips
        # through coalesce(value, b'')), so compare with NULL canonicalized
        return sorted(
            (
                bytes(r["row"]),
                r["family"],
                bytes(r["qualifier"]),
                r["ts"],
                r["type"],
                b"" if r["value"] is None else bytes(r["value"]),
            )
            for r in df.collect()
        )

    got = canon(kv.latest_cells(both))
    ref = canon(kv.latest_cells_packed(both))
    assert got == ref
    winners = {t[0]: t for t in got if t[0].startswith(b"tie#")}
    assert winners[b"tie#1"][4] == "Delete"
    assert winners[b"tie#2"][4:] == ("Put", b"\xff")


def test_cells_to_wide_roundtrip(spark, customer):
    versioned = customer_cells_versioned(customer, n_versions=3)
    wide = cells_to_wide(versioned, list(CUSTOMER_QUALIFIERS))
    assert wide.count() == customer.count()
    ref = customer.filter(F.col("c_custkey") == 7).collect()[0]
    row = wide.filter(F.col("row") == F.lit(b"cust#00000007")).collect()[0]
    assert row["c_name"] == ref["c_name"]
    assert row["c_nationkey"] == str(ref["c_nationkey"])
    assert row["c_mktsegment"] == ref["c_mktsegment"]
    assert row["c_acctbal"] == "%.2f" % ref["c_acctbal"]


def test_snapshot_as_of_returns_historical_state(spark, customer):
    from symat_hbase_tools_spark.operators.kv import snapshot_as_of
    from symat_hbase_tools_spark.sources.cells import CELL_TS, customer_cells_versioned

    versioned = customer_cells_versioned(customer)
    from pyspark.sql import functions as F

    snap = snapshot_as_of(versioned, CELL_TS + 1000)
    assert snap.count() == customer.count() * 4
    vals = snap.select(F.decode("value", "UTF-8").alias("v"))
    assert vals.filter(~F.col("v").endswith("@v1")).count() == 0


def test_region_stats_census_identities(spark, customer):
    """Region census invariants over the customer cells fixture: rows and
    cells reconcile with the fixture's totals, byte shares sum to 1,
    every max_row_bytes is attained by some row, and recomputing one
    prefix's totals from the raw cells matches exactly."""
    from symat_hbase_tools_spark.operators import kv
    from symat_hbase_tools_spark.sources.cells import customer_cells

    cells = customer_cells(customer)
    out = kv.region_stats(cells).collect()
    n_rows_total = sum(r["n_rows"] for r in out)
    n_cells_total = sum(r["n_cells"] for r in out)
    assert n_rows_total == cells.select("row").distinct().count()
    assert n_cells_total == cells.count()
    assert abs(sum(r["byte_share"] for r in out) - 1.0) < 1e-12
    grand = sum(r["total_bytes"] for r in out)
    for r in out:
        assert r["byte_share"] == r["total_bytes"] / grand
        assert r["max_row_bytes"] * r["n_rows"] >= r["total_bytes"]
    # spot-recompute one prefix from raw cells
    target = out[0]["prefix"]
    rows = [
        (
            bytes(r["row"]).decode(),
            len(bytes(r["row"])) + len(r["family"]) + len(bytes(r["qualifier"]))
            + len(bytes(r["value"])) + 8,
        )
        for r in cells.collect()
        if bytes(r["row"]).decode()[:10] == target
    ]
    per_row: dict = {}
    for k, b in rows:
        per_row[k] = per_row.get(k, 0) + b
    want = next(r for r in out if r["prefix"] == target)
    assert want["n_rows"] == len(per_row)
    assert want["n_cells"] == len(rows)
    assert want["total_bytes"] == sum(per_row.values())
    assert want["max_row_bytes"] == max(per_row.values())


def test_region_stats_null_value_cells_keep_key_overhead(spark):
    """Delete-type cells (NULL value, legal per CELLS_SCHEMA) must still
    contribute their key/family/qualifier/timestamp overhead: a row made
    ONLY of delete cells gets real row_bytes, not NULL (ADVICE r10)."""
    from symat_hbase_tools_spark.operators import kv
    from symat_hbase_tools_spark.sources.cells import CELLS_SCHEMA, CELL_TS

    rows = [
        (b"del#row-01", "f", b"q1", CELL_TS, "Delete", None),
        (b"del#row-01", "f", b"q2", CELL_TS, "Delete", None),
        (b"put#row-02", "f", b"q1", CELL_TS, "Put", b"hello"),
    ]
    cells = spark.createDataFrame(rows, CELLS_SCHEMA)
    out = {r["prefix"]: r for r in kv.region_stats(cells).collect()}
    # key(10) + family(1) + qualifier(2) + ts(8) = 21 per delete cell
    assert out["del#row-01"]["total_bytes"] == 42
    assert out["del#row-01"]["max_row_bytes"] == 42
    assert out["del#row-01"]["n_cells"] == 2
    assert out["put#row-02"]["total_bytes"] == 21 + 5
    total = 42 + 26
    assert abs(out["del#row-01"]["byte_share"] - 42 / total) < 1e-12


def test_split_points_tape_semantics(spark, customer):
    """Byte-tape region assignment: regions partition the rows in key
    order, every region starts where the tape crosses a target multiple,
    and no region exceeds target + its last row's bytes (a row straddles
    only the boundary it starts before)."""
    from symat_hbase_tools_spark.operators import kv
    from symat_hbase_tools_spark.sources.cells import customer_cells

    target = 4096
    cells = customer_cells(customer.limit(150))
    out = sorted(
        kv.split_points(cells, target_bytes=target).collect(),
        key=lambda r: r["region_seq"],
    )
    assert out[0]["region_seq"] == 0
    # regions are consecutive and non-empty
    assert [r["region_seq"] for r in out] == list(range(len(out)))
    assert all(r["n_rows"] >= 1 for r in out)
    # totals conserve: sum of region bytes/rows == table bytes/rows
    per_prefix = kv.region_stats(cells, prefix_len=100).collect()
    assert sum(r["region_bytes"] for r in out) == sum(
        p["total_bytes"] for p in per_prefix
    )
    assert sum(r["n_rows"] for r in out) == len(per_prefix)
    # split keys ascend in key order and region 0 starts at the table start
    keys = [r["split_key"] for r in out]
    assert keys == sorted(keys)
    assert keys[0] == min(p["prefix"] for p in per_prefix)
    # start-based assignment: a region's bytes are < target + max_row_bytes
    max_row = max(p["max_row_bytes"] for p in per_prefix)
    assert all(r["region_bytes"] < target + max_row for r in out)


def test_split_points_single_fat_row_gets_own_region(spark):
    """A row bigger than the target cannot be split (HBase rows are
    atomic): it owns its region alone and the tape advances past it."""
    from symat_hbase_tools_spark.operators import kv
    from symat_hbase_tools_spark.sources.cells import CELLS_SCHEMA, CELL_TS

    rows = [(f"r{i}".encode(), "f", b"q", CELL_TS, "Put", b"x" * 10) for i in range(1, 5)]
    rows.append((b"r2-fat", "f", b"q", CELL_TS, "Put", b"y" * 500))
    cells = spark.createDataFrame(rows, CELLS_SCHEMA)
    out = {r["region_seq"]: r for r in kv.split_points(cells, target_bytes=64).collect()}
    # key order: r1, r2, r2-fat, r3, r4 — r1+r2 fill region 0 (2*(2+1+1+8+10)=44
    # bytes then r2-fat starts at 44 < 64 in region 0... recompute: each small
    # row = 2+1+1+10+8 = 22; fat = 6+1+1+500+8 = 516.
    # tape: r1@0, r2@22, r2-fat@44 (region 0), r3@560 (region 8), r4@582 (region 9)
    assert out[0]["n_rows"] == 3 and out[0]["region_bytes"] == 44 + 516
    assert out[8]["n_rows"] == 1 and out[8]["split_key"] == "r3"
    assert out[9]["n_rows"] == 1 and out[9]["split_key"] == "r4"


def test_merge_candidates_filter_and_adjacency(spark):
    """Merge advisor: only ADJACENT prefix pairs whose combined bytes fit
    the target qualify; a fat region poisons both pairs it touches."""
    from symat_hbase_tools_spark.operators import kv
    from symat_hbase_tools_spark.sources.cells import CELLS_SCHEMA, CELL_TS

    rows = []
    # four regions by 1-char prefix: a,b small; c fat; d small
    for pfx, n_rows, val in (("a", 2, 10), ("b", 2, 10), ("c", 2, 500), ("d", 2, 10)):
        for i in range(n_rows):
            rows.append(
                (f"{pfx}{i}".encode(), "f", b"q", CELL_TS, "Put", b"x" * val)
            )
    cells = spark.createDataFrame(rows, CELLS_SCHEMA)
    # per small region: 2 cells x (2+1+1+10+8) = 44 bytes; fat: 2 x 512 = 1024
    out = {
        (r["prefix_a"], r["prefix_b"]): r["combined_bytes"]
        for r in kv.merge_candidates(cells, target_bytes=100, prefix_len=1).collect()
    }
    assert out == {("a", "b"): 88}
    # raising the target admits the fat region's pairs too
    out2 = {
        (r["prefix_a"], r["prefix_b"])
        for r in kv.merge_candidates(cells, target_bytes=2000, prefix_len=1).collect()
    }
    assert out2 == {("a", "b"), ("b", "c"), ("c", "d")}


def test_salt_roundtrip_and_balance(spark, customer):
    """salt_cells: one deterministic salt byte per key; unsalt is the
    exact inverse; all versions of a key share its salt; the census
    predicts the salted layout's balance."""
    import pyspark.sql.functions as F

    from symat_hbase_tools_spark.operators import kv
    from symat_hbase_tools_spark.sources.cells import customer_cells

    cells = customer_cells(customer.limit(120))
    salted = kv.salt_cells(cells, n_salts=16)
    # round-trip identity (full cell rows)
    back = kv.unsalt_cells(salted)
    assert back.exceptAll(cells).count() == 0
    assert cells.exceptAll(back).count() == 0
    # every key maps to exactly one salt (versions stay together)
    one_salt = (
        salted.select(F.expr("substring(row, 1, 1)").alias("s"),
                      F.expr("substring(row, 2, 2147483647)").alias("k"))
        .groupBy("k").agg(F.count_distinct("s").alias("ns"))
    )
    assert one_salt.filter(F.col("ns") != 1).count() == 0
    # census totals conserve rows
    census = kv.salt_census(cells, n_salts=16)
    tot = census.agg(F.sum("n_rows")).collect()[0][0]
    assert tot == 120
    # salts actually spread (more than 4 distinct buckets on 120 keys)
    assert census.count() > 4


def test_salt_cells_rejects_bad_n_salts(spark, customer):
    import pytest as _pytest

    from symat_hbase_tools_spark.operators import kv
    from symat_hbase_tools_spark.sources.cells import customer_cells

    with _pytest.raises(ValueError):
        kv.salt_cells(customer_cells(customer.limit(5)), n_salts=0)


def test_salt_split_points_one_region_per_salt(spark, customer):
    """salt_split_points boundaries route EVERY salted row into the region
    of its own salt byte — the balance-by-construction layout the round-12
    A/B motivates (quantile boundaries read balance 2.0; these read the
    salt distribution itself)."""
    import pytest
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.operators.kv import salt_cells, salt_split_points
    from symat_hbase_tools_spark.sources.cells import customer_cells

    bounds = salt_split_points(16)
    assert bounds == [bytes([i]) for i in range(1, 16)]
    salted = salt_cells(customer_cells(customer), n_salts=16)
    # region of a row under these boundaries == its salt byte
    region = F.lit(15)
    for i in range(14, -1, -1):
        region = F.when(F.col("row") < F.lit(bounds[i]), i).otherwise(region)
    got = salted.select(
        (F.conv(F.hex(F.expr("substring(row, 1, 1)")), 16, 10).cast("int")).alias("salt"),
        region.alias("region"),
    )
    assert got.filter(F.col("salt") != F.col("region")).count() == 0
    with pytest.raises(ValueError):
        salt_split_points(1)
    with pytest.raises(ValueError):
        salt_split_points(257)


def test_snapshot_manifest_localizes_tampering(spark, customer):
    """The verification contract: manifests of two copies agree everywhere;
    tamper ONE cell's value in the replica and exactly that prefix's
    content_sum moves while its counts/bytes stay reconcilable — the
    region-localization a full diff would buy at shuffle cost."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.operators.kv import snapshot_manifest
    from symat_hbase_tools_spark.sources.cells import customer_cells

    cells = customer_cells(customer)
    snap = lambda df: {  # noqa: E731
        r["prefix"]: (r["n_rows"], r["n_cells"], r["total_bytes"], r["content_sum"])
        for r in df.collect()
    }
    a = snap(snapshot_manifest(cells))
    assert a == snap(snapshot_manifest(cells))  # identical copies agree

    qual = F.decode("qualifier", "UTF-8")
    key = F.decode("row", "UTF-8")
    tampered = cells.withColumn(
        "value",
        F.when(
            (key == "cust#00000042") & (qual == "c_name"),
            F.encode(F.lit("TAMPERED"), "UTF-8").cast("binary"),
        ).otherwise(F.col("value")),
    )
    b = snap(snapshot_manifest(tampered))
    moved = [p for p in a if a[p][3] != b[p][3]]
    assert moved == ["cust#00000"]  # the one prefix holding the tampered row
    # counts still agree (same cells, different bytes in one value)
    assert all(a[p][:2] == b[p][:2] for p in a)
