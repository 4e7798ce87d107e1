"""Audit tests — golden semantics modeled on the reference's worked example
(/root/reference/README.md:62-81: 5-row table, 2 corrupted, exact TSV) plus
the counters triple (CorruptRowsMR.java:62-66)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.audit import (
    CorruptCellError,
    audit,
    audit_probe,
    counters_of,
    normalize_error,
    write_report_tsv,
)
from symat_hbase_tools_spark.sources.cells import (
    CORRUPT_MOD,
    CORRUPT_REMAINDER,
    customer_cells,
)


def expected_corrupt_keys(customer):
    rows = customer.filter(
        F.col("c_custkey") % CORRUPT_MOD == CORRUPT_REMAINDER
    ).select("c_custkey").collect()
    return {"cust#%08d" % r["c_custkey"] for r in rows}


def test_audit_counters_and_report(spark, customer):
    cells = customer_cells(customer, with_corrupt_marker=True)
    report, counters = audit(cells)
    want = expected_corrupt_keys(customer)
    got = {r["row_key"] for r in report.collect()}
    assert got == want
    c = counters_of(counters)
    assert c.total == customer.count()
    assert c.failed == len(want)
    assert c.success == c.total - c.failed


def test_audit_error_format(spark, customer):
    cells = customer_cells(customer, with_corrupt_marker=True)
    report, _ = audit(cells)
    r = report.orderBy("row_key").limit(1).collect()[0]
    # `SimpleName, message: <first line>` — multi-line detail dropped (T4)
    assert r["error"] == f"CorruptCellError, message: corrupt marker present for row {r['row_key']}"


def test_probe_path_matches_declarative(spark, customer):
    """The reference-shaped mapInPandas probe must produce identical rows."""
    cells = customer_cells(customer, with_corrupt_marker=True)
    declarative = {(r["row_key"], r["error"]) for r in audit(cells)[0].collect()}
    probed = {(r["row_key"], r["error"]) for r in audit_probe(cells).collect()}
    assert probed == declarative


def test_clean_table_audit(spark, customer):
    cells = customer_cells(customer, with_corrupt_marker=False)
    report, counters = audit(cells)
    assert report.count() == 0
    c = counters_of(counters)
    assert c == (customer.count(), customer.count(), 0)


def test_normalize_error():
    assert (
        normalize_error(CorruptCellError("boom\nsecond line"))
        == "CorruptCellError, message: boom"
    )
    assert normalize_error(ValueError("a\r\nb")) == "ValueError, message: a"
    assert normalize_error(ValueError("a\rb")) == "ValueError, message: a"
    assert normalize_error(ValueError("")) == "ValueError, message: n/a"
    assert normalize_error(ValueError()) == "ValueError, message: n/a"
    assert normalize_error(ValueError("   ")) == "ValueError, message: n/a"


def test_tsv_sink(spark, customer, tmp_path):
    cells = customer_cells(customer, with_corrupt_marker=True)
    report, _ = audit(cells)
    out = str(tmp_path / "report")
    write_report_tsv(report, out)
    assert glob.glob(out + "/_SUCCESS")
    lines = []
    for f in glob.glob(out + "/part-*"):
        with open(f) as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    want = expected_corrupt_keys(customer)
    assert len(lines) == len(want)
    for ln in lines:
        key, error = ln.split("\t")
        assert key in want
        assert error.startswith("CorruptCellError, message: ")
