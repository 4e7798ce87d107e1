"""Byte-string codec golden tests (SURVEY.md §5.3).

Golden vectors follow HBase Bytes.toStringBinary/toBytesBinary public
semantics (printable ASCII minus backslash verbatim, uppercase \\xNN
otherwise) — the escaping used for every key the reference prints/parses.
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from symat_hbase_tools_spark.functions.bytes_binary import (
    to_bytes_binary,
    to_string_binary,
)

GOLDEN = [
    (b"", ""),
    (b"abc", "abc"),
    (b"cust#00000042", "cust#00000042"),
    (b"\x00", "\\x00"),
    (b"\t", "\\x09"),
    (b"\n", "\\x0A"),
    (b"\xff", "\\xFF"),
    (b"a\x00b", "a\\x00b"),
    (b"key\nwith\nnewlines", "key\\x0Awith\\x0Anewlines"),
    (b"\\", "\\x5C"),  # backslash is escaped, not emitted verbatim
    (b" ~", " ~"),  # boundary printables 0x20 and 0x7E
    (b"\x1f\x7f", "\\x1F\\x7F"),  # just outside the printable range
]


def test_to_string_binary_golden():
    for raw, escaped in GOLDEN:
        assert to_string_binary(raw) == escaped, raw


def test_to_bytes_binary_golden():
    for raw, escaped in GOLDEN:
        assert to_bytes_binary(escaped) == raw, escaped


def test_bogus_escape_skipped():
    # HBase skips a \x with non-hex digits (drops the backslash, keeps going)
    assert to_bytes_binary("\\xZZ") == b"xZZ"
    assert to_bytes_binary("a\\x4") == b"ax4"  # truncated escape at end


def test_none_passthrough():
    assert to_string_binary(None) is None
    assert to_bytes_binary(None) is None


@given(st.binary(max_size=64))
def test_roundtrip(raw: bytes):
    assert to_bytes_binary(to_string_binary(raw)) == raw


def test_spark_udfs(spark):
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.functions.bytes_binary import (
        to_bytes_binary_col,
        to_string_binary_col,
    )

    df = spark.createDataFrame([(raw,) for raw, _ in GOLDEN if raw], "b binary")
    out = df.select(
        to_bytes_binary_col(to_string_binary_col(F.col("b"))).alias("rt"), "b"
    ).collect()
    for r in out:
        assert bytes(r["rt"]) == bytes(r["b"])


def test_expr_matches_python_all_bytes_and_random(spark):
    """The JVM-side to_string_binary_expr must render byte-for-byte like
    the pure-Python to_string_binary: all 256 single bytes, the full
    0..255 run, empty, NULL, and a seeded random fuzz batch — one Spark
    job for the whole corpus."""
    import random

    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.functions.bytes_binary import (
        to_string_binary,
        to_string_binary_expr,
    )

    rng = random.Random(0xB17E5)
    vals = (
        [bytes([i]) for i in range(256)]
        + [bytes(range(256)), b"", None, b"r2", b"back\\slash"]
        + [
            bytes(rng.randrange(256) for _ in range(rng.randrange(48)))
            for _ in range(128)
        ]
    )
    df = spark.createDataFrame([(v,) for v in vals], "b binary")
    got = [r[0] for r in df.select(to_string_binary_expr(F.col("b"))).collect()]
    assert got == [to_string_binary(v) for v in vals]
