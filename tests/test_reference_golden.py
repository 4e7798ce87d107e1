"""Golden reproduction of the reference README's worked example.

/root/reference/README.md:62-81 shows CorruptRowsMR on a 5-row table ``t1``
finding two corrupt rows, with the exact report lines:

  r2<TAB>CorruptHFileException, message: org.apache...CorruptHFileException: ...
  r4<TAB>DoNotRetryIOException, message: org.apache...DoNotRetryIOException: ...

and the _SUCCESS + part-file output layout. This module reproduces that run
end to end through the engine's probe path (operators/audit.py):

  * a 5-row cells table keyed r1..r5, r2 and r4 carrying the corruption
    marker (the parquet model of an unreadable HFile);
  * a fault-injecting prober that raises exceptions with the README's
    exact class names and messages (the shape a real HBase GET produces —
    the wrapped-cause string IS the message's first line);
  * byte-exact asserts on the TSV part files (CorruptRowsMR.java:150-163
    formatting: ``toStringBinary(key) \\t SimpleName, message: <line 1>``)
    and on the TOTAL/SUCCESS/FAILED counter triple (lines 62-66).

Also covers the toStringBinary render of NON-printable keys through the
same report path (the README keys are printable; Bytes.toStringBinary
escaping is what the reference would print for arbitrary keys).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators.audit import (
    audit,
    audit_probe,
    counters_of,
    write_report_tsv,
)
from symat_hbase_tools_spark.sources.cells import CELLS_SCHEMA, CELL_TS

# The README's example output, verbatim (the two report lines, minus the
# trailing newline the text sink adds per line).
_HOST = "hdfs://mszalay-d-1.mszalay-d.root.hwx.site:8020"
R2_MESSAGE = (
    "org.apache.hadoop.hbase.io.hfile.CorruptHFileException: Problem reading "
    f"HFile Trailer from file {_HOST}/hbase/mobdir/data/ns/t1/"
    "191cac2efaa0f9d81b4e7ac04632b38a/cf/d41d8cd98f00b204e9800998ecf8427e"
    "20220624418abfb9aac048f68ff98f11f90b5815_133444ba82a35b136b728a71b9fd463e"
)
R4_MESSAGE = (
    "org.apache.hadoop.hbase.DoNotRetryIOException: java.io.FileNotFoundException: "
    f"File does not exist: {_HOST}/hbase/archive/data/ns/t1/"
    "191cac2efaa0f9d81b4e7ac04632b38a/cf/d41d8cd98f00b204e9800998ecf8427e"
    "202206247560aef1b417438a8b0826f43e0919df_133444ba82a35b136b728a71b9fd463e"
)
README_LINES = [
    f"r2\tCorruptHFileException, message: {R2_MESSAGE}",
    f"r4\tDoNotRetryIOException, message: {R4_MESSAGE}",
]


def _make_readme_prober(r2_message: str, r4_message: str):
    """A prober raising the README's exact exceptions for r2/r4 —
    multi-line messages so the first-line normalization
    (CorruptRowsMR.java:153-158) is what produces the golden bytes, not a
    pre-trimmed input.

    Returned as a CLOSURE with ``type()``-built exception classes: the
    test module is not importable on executors, so any module-level
    function/class here would fail cloudpickle's by-reference lookup;
    the closure (and its captured strings) pickles by value.
    """

    def prober(row_key: str, is_corrupt: bool) -> None:
        if not is_corrupt:
            return
        if row_key == "r2":
            raise type("CorruptHFileException", (Exception,), {})(
                r2_message
                + "\n\tat org.apache.hadoop.hbase.io.hfile.HFile.openReader(HFile.java:559)"
            )
        if row_key == "r4":
            raise type("DoNotRetryIOException", (Exception,), {})(
                r4_message
                + "\r\n\tat org.apache.hadoop.hbase.regionserver.HRegion.get(HRegion.java:7284)"
            )
        raise AssertionError(f"unexpected corrupt row {row_key!r}")

    return prober


def _t1_cells(spark):
    """The README's 5-row table: one data cell per row r1..r5, plus the
    corruption marker on r2 and r4 (FIXTURES.md §B.3 models an unreadable
    HFile as a marker qualifier the probe trips on)."""
    rows = []
    for i in range(1, 6):
        key = f"r{i}".encode()
        rows.append((key, "cf", b"q1", CELL_TS, "Put", f"value-{i}".encode()))
        if i in (2, 4):
            rows.append((key, "cf", b"corrupt", CELL_TS, "Put", b"1"))
    return spark.createDataFrame(rows, CELLS_SCHEMA)


def test_readme_worked_example_exact_bytes(spark, tmp_path):
    cells = _t1_cells(spark)
    report = audit_probe(cells, prober=_make_readme_prober(R2_MESSAGE, R4_MESSAGE))
    outdir = str(tmp_path / "corrupt-rows")
    write_report_tsv(report, outdir)

    # Output layout: _SUCCESS + part files (README `hdfs dfs -ls` shows both).
    assert os.path.exists(os.path.join(outdir, "_SUCCESS"))
    parts = sorted(glob.glob(os.path.join(outdir, "part-*")))
    assert parts, "no part files written"

    # Byte-exact report: every line is `key \t SimpleName, message: <first
    # line>` — concatenated part contents must equal the README lines.
    lines = []
    for p in parts:
        with open(p, "rb") as fh:
            content = fh.read()
        assert content == b"" or content.endswith(b"\n")
        lines.extend(content.decode("utf-8").splitlines())
    assert sorted(lines) == README_LINES

    # Counter triple (CorruptRowsMR.java:62-66): 5 total, 3 success, 2 failed.
    _, counters = audit(cells)
    assert counters_of(counters) == (5, 3, 2)


def test_readme_example_declarative_probe_agreement(spark):
    """The declarative (100 TB) audit path flags the same keys the probe
    path reports — r2 and r4, nothing else."""
    report, _ = audit(_t1_cells(spark))
    assert sorted(r.row_key for r in report.collect()) == ["r2", "r4"]


def test_report_keys_are_byte_string_escaped(spark):
    """Non-printable key bytes reach the report in the reference's
    Bytes.toStringBinary render (uppercase \\xNN, backslash escaped) —
    CorruptRowsMR.java:163 prints every reported key through it."""
    key = b"r\x00\x09-key\\\x7f"
    cells = spark.createDataFrame(
        [
            (key, "cf", b"q1", CELL_TS, "Put", b"v"),
            (key, "cf", b"corrupt", CELL_TS, "Put", b"1"),
            (b"ok-row", "cf", b"q1", CELL_TS, "Put", b"v"),
        ],
        CELLS_SCHEMA,
    )
    report, counters = audit(cells)
    assert [r.row_key for r in report.collect()] == ["r\\x00\\x09-key\\x5C\\x7F"]
    assert counters_of(counters) == (2, 1, 1)
    probe = audit_probe(cells)
    assert [r.row_key for r in probe.collect()] == ["r\\x00\\x09-key\\x5C\\x7F"]
