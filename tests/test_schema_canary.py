"""Schema-drift canary: the driver regenerates testdata between rounds and
has already shipped two different physical encodings for ``events.ts``
(int64 epoch-nanos, then parquet timestamp[us]/TIMESTAMP_NTZ). Round 1 was
gated entirely by that drift. These tests pin the ``load_table`` contract —
whatever the physical type, consumers always see a UTC TimestampType ``ts``
plus exact epoch-nanos ``ts_ns`` — and verify the values against the parquet
bytes via pyarrow, independent of Spark's reader path.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from symat_hbase_tools_spark.sources.tables import load_table, normalize_events
from tests.conftest import SF_DIR


def test_events_ts_contract(events):
    schema = {f.name: f.dataType for f in events.schema.fields}
    assert isinstance(schema["ts"], T.TimestampType), schema["ts"]
    assert isinstance(schema["ts_ns"], T.LongType), schema["ts_ns"]
    # ts_ns is exact nanos for ts at microsecond resolution
    bad = events.filter(
        (F.unix_micros("ts") * F.lit(1000) > F.col("ts_ns"))
        | (F.col("ts_ns") - F.unix_micros("ts") * F.lit(1000) >= 1000)
    ).count()
    assert bad == 0


def test_events_ts_matches_parquet_bytes(spark):
    """Ground truth from pyarrow: Spark's normalized epoch-micros must equal
    what the parquet physically stores, for any of the known encodings."""
    path = os.path.join(SF_DIR, "events.parquet")
    tbl = pq.read_table(path, columns=["event_id", "ts"])
    col = tbl.column("ts")
    typ = str(col.type)
    import pyarrow.compute as pc

    ids = tbl.column("event_id").to_pylist()
    if typ == "int64":  # legacy epoch nanos
        want_us = {i: v // 1000 for i, v in zip(ids, col.to_pylist())}
    elif typ.startswith("timestamp"):
        unit = col.type.unit
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]
        raw = pc.cast(col, "int64").to_pylist()
        if unit == "ns":
            want_us = {i: v // 1000 for i, v in zip(ids, raw)}
        else:
            want_us = {i: v * scale for i, v in zip(ids, raw)}
    else:
        raise AssertionError(f"unexpected physical type for events.ts: {typ}")

    got = {
        r["event_id"]: r["us"]
        for r in load_table(spark, SF_DIR, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    assert got == want_us


def test_normalize_events_all_encodings(spark):
    """normalize_events yields identical (ts, ts_ns) from every encoding."""
    base = spark.createDataFrame(
        [(1, 1706637110232387000), (2, 1577836800000000123)],
        "event_id bigint, ts bigint",
    )
    from_ns = normalize_events(base)
    from_ntz = normalize_events(
        base.select(
            "event_id",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz").alias("ts"),
        )
    )
    from_ts = normalize_events(
        base.select("event_id", F.timestamp_micros(F.expr("ts div 1000")).alias("ts"))
    )
    us = lambda df: {
        r["event_id"]: (r["us"], r["ts_ns"] // 1000)
        for r in df.select(
            "event_id", F.unix_micros("ts").alias("us"), "ts_ns"
        ).collect()
    }
    a, b, c = us(from_ns), us(from_ntz), us(from_ts)
    assert {k: v[0] for k, v in a.items()} == {k: v[0] for k, v in b.items()}
    assert b == c
    # legacy path keeps sub-microsecond nanos exactly
    assert a[1] == (1706637110232387, 1706637110232387)


def test_documents_schema_contract(spark):
    """Pin the documents contract the text/dedup surface assumes: doc_id is
    integral, text/lang/source strings, n_chars integral and equal to
    length(text). A silent driver-side regeneration that changes any of
    these should fail HERE, not as 40 cryptic oracle mismatches."""
    docs = load_table(spark, SF_DIR, "documents")
    schema = {f.name: f.dataType for f in docs.schema.fields}
    assert isinstance(schema["doc_id"], (T.LongType, T.IntegerType)), schema
    assert isinstance(schema["text"], T.StringType), schema
    assert isinstance(schema["lang"], T.StringType), schema
    assert isinstance(schema["source"], T.StringType), schema
    assert isinstance(schema["n_chars"], (T.LongType, T.IntegerType)), schema
    bad = docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0, "n_chars out of sync with text"
    assert docs.filter(F.col("doc_id").isNull() | F.col("text").isNull()).count() == 0


def test_embeddings_schema_contract(spark):
    """Pin the embeddings contract the similarity surface assumes: vec_id
    integral, embedding a non-null fixed-dimension float/double array,
    label integral. as_double() tolerates float vs double, but a dimension
    change or nulls would silently skew every recall/centroid number."""
    emb = load_table(spark, SF_DIR, "embeddings")
    schema = {f.name: f.dataType for f in emb.schema.fields}
    assert isinstance(schema["vec_id"], (T.LongType, T.IntegerType)), schema
    assert isinstance(schema["embedding"], T.ArrayType), schema
    assert isinstance(
        schema["embedding"].elementType, (T.FloatType, T.DoubleType)
    ), schema
    assert isinstance(schema["label"], (T.LongType, T.IntegerType)), schema
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert len(dims) == 1, f"ragged embedding dims: {dims}"
    assert emb.filter(
        F.col("embedding").isNull() | F.exists("embedding", lambda x: x.isNull())
    ).count() == 0
