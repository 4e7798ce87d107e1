"""HBase-shell byte-string codecs (the engine's T2/T3 scalar functions).

Replicates the public semantics of HBase ``Bytes.toStringBinary`` /
``Bytes.toBytesBinary`` used by the reference for every key it prints or
parses (/root/reference/src/main/java/org/apache/symat/CopyRow.java:104,
CorruptRowsMR.java:138,142,163):

  * ``to_string_binary``: printable ASCII (0x20..0x7E) except backslash is
    emitted verbatim; every other byte becomes ``\\xNN`` with UPPERCASE hex.
  * ``to_bytes_binary``: inverse parse; a ``\\x`` followed by two hex digits
    decodes to one byte, a ``\\x`` with bogus digits is skipped (HBase
    semantics), any other character contributes its low byte.

Two surfaces:
  * pure-Python functions (driver-side key handling, golden tests);
  * Arrow-vectorized pandas UDFs for column-at-a-time use. These only run on
    the small audit-report/key paths — the hot analytic paths never call them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEX = "0123456789ABCDEF"
_HEX_DIGITS = set("0123456789abcdefABCDEF")


def to_string_binary(b: bytes | bytearray | None) -> str | None:
    """bytes -> HBase-shell escaped string (uppercase \\xNN escapes)."""
    if b is None:
        return None
    out = []
    for ch in bytes(b):
        if 0x20 <= ch <= 0x7E and ch != 0x5C:  # printable ASCII minus backslash
            out.append(chr(ch))
        else:
            out.append("\\x")
            out.append(_HEX[ch >> 4])
            out.append(_HEX[ch & 0xF])
    return "".join(out)


def to_bytes_binary(s: str | None) -> bytes | None:
    """HBase-shell escaped string -> bytes (inverse of to_string_binary)."""
    if s is None:
        return None
    out = bytearray()
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n and s[i + 1] == "x":
            if i + 3 < n and s[i + 2] in _HEX_DIGITS and s[i + 3] in _HEX_DIGITS:
                out.append(int(s[i + 2 : i + 4], 16))
                i += 4
            else:
                # bogus escape: HBase skips the backslash and continues
                i += 1
        else:
            out.append(ord(ch) & 0xFF)
            i += 1
    return bytes(out)


def to_string_binary_expr(col) -> "F.Column":
    """Pure built-in-expression ``Bytes.toStringBinary`` — no Python worker.

    hex() the binary, split into byte pairs, render each pair: printable
    ASCII (0x20..0x7E, backslash excepted) becomes the character itself,
    everything else ``\\xNN`` with uppercase hex (hex() is already upper).
    Used where the render must ride a distributed plan (the audit report's
    row keys — the reference prints every reported key through
    toStringBinary, CorruptRowsMR.java:163); hypothesis-parity-tested
    against the pure-Python ``to_string_binary`` in test_codecs.py.
    Stays JVM-side: one regexp + split + array HOF per value, applied
    post-aggregation (once per ROW, not per cell) on the audit path.
    """
    pairs = F.filter(
        F.split(F.regexp_replace(F.hex(col), "(..)", "$1,"), ","),
        lambda p: p != F.lit(""),
    )
    def render(p):
        code = F.conv(p, 16, 10).cast("int")
        printable = code.between(0x20, 0x7E) & (code != 0x5C)
        return F.when(printable, F.char(code)).otherwise(
            F.concat(F.lit("\\x"), p)
        )
    return F.array_join(F.transform(pairs, render), "")


@F.pandas_udf(T.StringType())
def to_string_binary_col(s: pd.Series) -> pd.Series:
    return s.map(to_string_binary)


@F.pandas_udf(T.BinaryType())
def to_bytes_binary_col(s: pd.Series) -> pd.Series:
    return s.map(to_bytes_binary)
