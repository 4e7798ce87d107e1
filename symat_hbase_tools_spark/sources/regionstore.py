"""Region-store: an executable key-range-pushdown relation for cell tables.

SURVEY.md §4.1 identified exactly one justified custom Spark extension: a
DataSourceV2 relation that turns row-key predicates (``row >= start AND
row < stop``) into HBase scan ranges. Against a live cluster that relation
is the ``hbase-spark`` connector (sources/hbase.py); this module is the
same contract implemented on the **Python DataSource API** (Spark 4.1,
``pyspark.sql.datasource``) over an HBase-shaped on-disk layout, so the
pushdown semantics are real and unit-testable in this image:

  * the store is range-partitioned into N **regions** by row key — the
    analogue of HBase region splits, which is where per-region parallelism
    comes from (TableInputFormat inheritance,
    /root/reference/src/main/java/org/apache/symat/CorruptRowsMR.java:68);
  * ``partitions()`` emits one Spark input partition per region — the
    analogue of one map task per region split;
  * ``pushFilters()`` consumes row-key comparisons (=, <, <=, >, >=, IN)
    and **prunes regions** whose [start, stop) span cannot match — the
    analogue of an HBase scan with start/stop row: unprobed regions are
    never opened, which is the entire point at 100 TB (a point get touches
    1 region of 10^5, not all of them);
  * consumed filters are applied exactly at read time (Arrow-side), so
    Spark does not need to re-filter; everything else (ts, family, value
    predicates) is returned as residual for Spark to evaluate.

Row keys are arbitrary bytes. Python ``bytes`` comparison, Arrow
``binary`` comparison, and Spark ``BinaryType`` ordering are all unsigned
lexicographic — the same total order HBase scans in — so range semantics
agree across all three layers.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

FORMAT_NAME = "regionstore"

#: canonical cells schema as DDL (must stay in lockstep with cells.CELLS_SCHEMA)
CELLS_DDL = (
    "row binary, family string, qualifier binary, ts bigint, type string, value binary"
)
_COLUMNS = ["row", "family", "qualifier", "ts", "type", "value"]

META_FILE = "_regions.json"


# ---------------------------------------------------------------------------
# per-region Bloom filters (HBase per-storefile ROW blooms)


def _bloom_hashes(key: bytes, m: int, k: int) -> list[int]:
    """k bit positions for a row key via double hashing over one md5.

    h_i = (h1 + i*h2) mod m — the standard Kirsch-Mitzenmacher scheme: one
    real hash per key however many probe functions, identical on the
    build side (executors) and probe side (driver planning).
    """
    import hashlib

    d = hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_size_bits(n_keys: int, bits_per_key: int) -> int:
    return max(64, ((n_keys * bits_per_key + 7) // 8) * 8)


def _bloom_contains(bloom: bytes, key: bytes, k: int) -> bool:
    m = len(bloom) * 8
    return all(bloom[p >> 3] & (1 << (p & 7)) for p in _bloom_hashes(key, m, k))


BLOOM_BITS_PER_KEY = 10
BLOOM_K = 7  # ~1% false-positive rate at 10 bits/key


# ---------------------------------------------------------------------------
# writer (bulk load): range-partition cells into region files


def write_region_store(cells: DataFrame, path: str, n_regions: int = 8) -> list[dict]:
    """Range-partition a cells DataFrame into ``n_regions`` region files.

    Split points are row-key quantiles — the same policy as HBase pre-split
    bulk loads. Only the n_regions-1 boundary keys ever reach the driver;
    the data itself is written by executors, one sorted file per region
    (``repartitionByRange`` + sortWithinPartitions — the bulk-load shuffle).
    Returns the region metadata list (start/stop hex per region).

    Each region also gets a ROW Bloom filter (HBase per-storefile bloom
    semantics): built distributed — one applyInPandas task per region over
    its distinct keys — and stored in the metadata. Point reads probe the
    bloom during planning, so a GET for an absent key opens no region at
    all even when the key range matches (the "ghost read" HBase blooms
    exist to kill).
    """
    keys = cells.select("row").distinct()
    # Boundary keys via Spark's RangePartitioner (repartitionByRange:
    # reservoir-sampled split points, fully distributed) + one min per
    # range partition — never an ntile over a partition-less window, which
    # funnels EVERY distinct key through one task (the exact
    # single-partition-window class the round-4 sweep removed from query
    # paths; a 100 TB bulk load has billions of distinct keys). Sampled
    # quantiles are precisely HBase's own pre-split policy; the region
    # assignment below derives from whatever bounds come back, so the
    # store is self-consistent regardless of sampling variance. Only
    # n_regions-1 boundary keys ever reach the driver.
    ranged = keys.repartitionByRange(n_regions, "row")
    bounds = [
        bytes(r["lo"])
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.min("row").alias("lo"))
        .orderBy("pid")
        .collect()
    ][1:]  # first region starts at -infinity

    regions = []
    # sampling (or a tiny key set) may yield fewer than n_regions-1 distinct
    # bounds; the store is whatever the bounds say, not the requested count
    n_regions = len(bounds) + 1
    for i in range(n_regions):
        start = bounds[i - 1] if i > 0 else None
        stop = bounds[i] if i < len(bounds) else None
        regions.append(
            {
                "region": i,
                "start": start.hex() if start is not None else None,
                "stop": stop.hex() if stop is not None else None,
            }
        )

    # assign each cell its region id with a range expression (broadcastable
    # boundary list, narrow per-row compute), then shuffle once on region id
    # and write each region sorted by (row, family, qualifier, ts desc-like)
    rid = F.lit(0)
    for i, b in enumerate(bounds):
        rid = rid + F.when(F.col("row") >= F.lit(b), 1).otherwise(0)
    os.makedirs(path, exist_ok=True)
    with_region = cells.withColumn("_region", rid.cast("int"))
    from symat_hbase_tools_spark.sources.bloom import with_row_bloom

    (
        with_row_bloom(
            with_region.repartition(n_regions, "_region")
            .sortWithinPartitions("row", "family", "qualifier", "ts")
            .write.mode("overwrite")
        )
        .partitionBy("_region")
        .parquet(os.path.join(path, "regions"))
    )

    # ROW bloom per region, built where the keys live: one pandas task per
    # region sees its distinct keys and emits (region, bloom bytes) — only
    # n_regions tiny rows reach the driver, never the keys.
    def build_bloom(pdf):
        import pandas as pd

        n = len(pdf)
        m = _bloom_size_bits(n, BLOOM_BITS_PER_KEY)
        bits = bytearray(m // 8)
        for key in pdf["row"]:
            for p in _bloom_hashes(bytes(key), m, BLOOM_K):
                bits[p >> 3] |= 1 << (p & 7)
        return pd.DataFrame(
            {"_region": [int(pdf["_region"].iloc[0])], "n_keys": [n],
             "bloom": [bytes(bits).hex()]}
        )

    blooms = {
        r["_region"]: (r["n_keys"], r["bloom"])
        for r in with_region.select("_region", "row")
        .distinct()
        .groupBy("_region")
        .applyInPandas(build_bloom, schema="_region int, n_keys long, bloom string")
        .collect()
    }
    for reg in regions:
        n_keys, bloom_hex = blooms.get(reg["region"], (0, "00" * 8))
        reg["n_keys"] = n_keys
        reg["bloom"] = bloom_hex
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(regions, f)
    return regions


# ---------------------------------------------------------------------------
# reader: per-region partitions, key-range pushdown, region pruning


@dataclass(frozen=True)
class _KeyRange:
    """Accumulated row-key restriction: [lo, hi) ∪ point-set semantics."""

    lo: bytes | None = None  # inclusive
    hi: bytes | None = None  # exclusive
    hi_inclusive: bool = False
    points: frozenset[bytes] | None = None  # from = / IN

    def is_empty(self) -> bool:
        if self.points is not None and not self.points:
            return True
        if self.lo is not None and self.hi is not None:
            if self.hi_inclusive:
                return self.lo > self.hi
            return self.lo >= self.hi
        return False


class RegionPartition(InputPartition):
    def __init__(self, region_dir: str, rng: _KeyRange):
        self.region_dir = region_dir
        self.rng = rng


def _intersects(start: bytes | None, stop: bytes | None, rng: _KeyRange) -> bool:
    """Does region [start, stop) intersect the pushed key restriction?"""
    if rng.points is not None:
        return any(
            (start is None or p >= start) and (stop is None or p < stop)
            for p in rng.points
        )
    if rng.lo is not None and stop is not None and rng.lo >= stop:
        return False
    if rng.hi is not None and start is not None:
        if rng.hi_inclusive:
            if rng.hi < start:
                return False
        elif rng.hi <= start:
            return False
    return True


def _as_bytes(v) -> bytes:
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        return v.encode("utf-8")
    raise TypeError(f"row-key filter value of unsupported type {type(v)}")


class RegionStoreReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("regionstore requires .option('path', <store dir>)")
        with open(os.path.join(self.path, META_FILE)) as f:
            self.regions = json.load(f)
        self.rng = _KeyRange()

    # -- pushdown ----------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume row-key comparisons; everything else is residual.

        Consumed filters are applied EXACTLY in read() (Arrow compute on the
        binary column), so Spark plans no re-evaluation for them — mirroring
        a connector turning them into HBase scan start/stop rows.
        """
        lo, hi, hi_inc, points = None, None, False, None
        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("row",):
                yield f
                continue
            try:
                if isinstance(f, EqualTo):
                    p = frozenset([_as_bytes(f.value)])
                    points = p if points is None else points & p
                elif isinstance(f, In):
                    p = frozenset(_as_bytes(v) for v in f.value)
                    points = p if points is None else points & p
                elif isinstance(f, GreaterThanOrEqual):
                    v = _as_bytes(f.value)
                    lo = v if lo is None else max(lo, v)
                elif isinstance(f, GreaterThan):
                    # bytes have a successor in unsigned lex order: v + 0x00
                    v = _as_bytes(f.value) + b"\x00"
                    lo = v if lo is None else max(lo, v)
                elif isinstance(f, LessThan):
                    v = _as_bytes(f.value)
                    if hi is None or v < hi or (v == hi and hi_inc):
                        hi, hi_inc = v, False
                elif isinstance(f, LessThanOrEqual):
                    v = _as_bytes(f.value)
                    if hi is None or v < hi:
                        hi, hi_inc = v, True
                else:
                    yield f
            except TypeError:
                yield f
        self.rng = _KeyRange(lo=lo, hi=hi, hi_inclusive=hi_inc, points=points)

    # -- planning ----------------------------------------------------------
    def partitions(self) -> list[RegionPartition]:
        """One partition per region SURVIVING key-range + bloom pruning.

        Point lookups (=, IN) additionally probe each candidate region's
        ROW bloom: a region whose bloom rejects every sought key is never
        opened — HBase's bloom-filter GET short-circuit. Range scans skip
        the bloom (it answers membership, not ranges).
        """
        if self.rng.is_empty():
            return []
        out = []
        for r in self.regions:
            start = bytes.fromhex(r["start"]) if r["start"] else None
            stop = bytes.fromhex(r["stop"]) if r["stop"] else None
            if not _intersects(start, stop, self.rng):
                continue
            if self.rng.points is not None and r.get("bloom"):
                bloom = bytes.fromhex(r["bloom"])
                in_region = [
                    p
                    for p in self.rng.points
                    if (start is None or p >= start) and (stop is None or p < stop)
                ]
                if not any(_bloom_contains(bloom, p, BLOOM_K) for p in in_region):
                    continue
            out.append(
                RegionPartition(
                    os.path.join(self.path, "regions", f"_region={r['region']}"),
                    self.rng,
                )
            )
        return out

    # -- execution ---------------------------------------------------------
    def read(self, partition: RegionPartition):
        import pyarrow.dataset as ds

        if partition is None:  # planner pruned every region: nothing to read
            return
        dataset = ds.dataset(partition.region_dir, format="parquet")
        rng = partition.rng
        expr = None

        def _and(a, b):
            return b if a is None else a & b

        row_field = ds.field("row")
        if rng.points is not None:
            expr = _and(expr, row_field.isin(list(rng.points)))
        if rng.lo is not None:
            expr = _and(expr, row_field >= rng.lo)
        if rng.hi is not None:
            expr = _and(
                expr, (row_field <= rng.hi) if rng.hi_inclusive else (row_field < rng.hi)
            )
        scanner = dataset.scanner(columns=_COLUMNS, filter=expr)
        for batch in scanner.to_batches():
            if batch.num_rows:
                yield batch


class RegionStoreDataSource(DataSource):
    """``spark.read.format("regionstore").option("path", dir)`` relation."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return CELLS_DDL

    def reader(self, schema) -> RegionStoreReader:
        return RegionStoreReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register the regionstore format on a session."""
    spark.dataSource.register(RegionStoreDataSource)


def read_region_store(spark: SparkSession, path: str) -> DataFrame:
    register(spark)
    return spark.read.format(FORMAT_NAME).option("path", path).load()
