"""The cell layer: HBase-semantics long-format cells as a DataFrame.

The reference's fundamental abstraction is the versioned HBase cell
(row key / family / qualifier / timestamp / type / value — enumerated by the
cell rebuild at /root/reference/src/main/java/org/apache/symat/CopyRow.java:128-136).
Spark mapping (SURVEY.md §1.2): one DataFrame row per cell:

    cells(row BINARY, family STRING, qualifier BINARY, ts LONG,
          type STRING, value BINARY)

Spark's BinaryType ordering is unsigned lexicographic, so ``orderBy("row")``
reproduces HBase scan order exactly.

Derivation from the driver's relational tables is a deterministic pure
function (FIXTURES.md §B): the whole encode is built-in column expressions
(format_string/encode/explode) — no Python UDF — so at 100 TB it stays inside
whole-stage codegen and the narrow explode adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CELLS_SCHEMA = T.StructType(
    [
        T.StructField("row", T.BinaryType(), False),
        T.StructField("family", T.StringType(), False),
        T.StructField("qualifier", T.BinaryType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("value", T.BinaryType(), True),
    ]
)

#: fixed base cell timestamp (2024-01-01T00:00:00Z epoch millis) — keeps every
#: derived fixture deterministic so the DuckDB oracle can inline it.
CELL_TS = 1_704_067_200_000

#: customer row-key render — 'cust#%08d' % c_custkey
CUSTOMER_KEY_FMT = "cust#%08d"

#: qualifiers encoded for the customer cell fixtures; values rendered as
#: canonical strings (doubles via '%.2f' so Spark and DuckDB agree bit-for-bit)
CUSTOMER_QUALIFIERS = ("c_acctbal", "c_mktsegment", "c_name", "c_nationkey")

#: deterministic "corruption" marker — ~2% of customer rows (FIXTURES.md §B.3)
CORRUPT_MOD, CORRUPT_REMAINDER = 50, 7


def customer_value_columns(prefix: str = "") -> dict[str, str]:
    """Canonical string renderings of the encoded customer columns, as SQL
    expression strings (see ``encode_table_as_cells`` for why strings)."""
    return {
        "c_acctbal": f"format_string('%.2f', {prefix}c_acctbal)",
        "c_mktsegment": f"{prefix}c_mktsegment",
        "c_name": f"{prefix}c_name",
        "c_nationkey": f"cast({prefix}c_nationkey as string)",
    }


def encode_table_as_cells(
    df: DataFrame,
    key_expr: str,
    value_cols: dict[str, str],
    family: str = "cf",
    ts: int = CELL_TS,
) -> DataFrame:
    """Encode a relational table into the canonical cells schema.

    One cell per (row, qualifier); pure built-in expressions (array of structs
    + explode) so the plan is a narrow map — no shuffle, codegen throughout.
    Expressions arrive as SQL STRINGS and the whole struct array is built by
    ONE ``F.expr`` parse: the Column-object formulation cost ~8 py4j
    round-trips per struct entry at plan-construction time (~0.3-0.5 s per
    fixture on wide tables) for an identical analyzed plan.
    """
    entries = ", ".join(
        f"struct('{q}' AS q, encode(cast(({v}) AS string), 'UTF-8') AS v)"
        for q, v in sorted(value_cols.items())
    )
    return df.select(
        F.expr(f"encode(cast(({key_expr}) AS string), 'UTF-8')").alias("row"),
        F.explode(F.expr(f"array({entries})")).alias("cell"),
    ).select(
        "row",
        F.lit(family).alias("family"),
        F.encode(F.col("cell.q"), "UTF-8").cast("binary").alias("qualifier"),
        F.lit(ts).cast("long").alias("ts"),
        F.lit("Put").alias("type"),
        F.col("cell.v").cast("binary").alias("value"),
    )


#: SQL rendering of the customer row key
_CUSTOMER_KEY_SQL = f"format_string('{CUSTOMER_KEY_FMT}', c_custkey)"


def customer_cells(customer: DataFrame, with_corrupt_marker: bool = False) -> DataFrame:
    """cells_customer / cells_corrupt fixtures (FIXTURES.md §B.1, §B.3)."""
    cells = encode_table_as_cells(customer, _CUSTOMER_KEY_SQL, customer_value_columns())
    if not with_corrupt_marker:
        return cells
    marker = customer.filter(
        F.col("c_custkey") % CORRUPT_MOD == CORRUPT_REMAINDER
    ).select(
        F.encode(F.format_string(CUSTOMER_KEY_FMT, F.col("c_custkey")), "UTF-8").alias("row"),
        F.lit("cf").alias("family"),
        F.encode(F.lit("corrupt"), "UTF-8").cast("binary").alias("qualifier"),
        F.lit(CELL_TS).cast("long").alias("ts"),
        F.lit("Put").alias("type"),
        F.encode(F.lit("1"), "UTF-8").cast("binary").alias("value"),
    )
    return cells.unionByName(marker)


def customer_cells_versioned(customer: DataFrame, n_versions: int = 3) -> DataFrame:
    """cells_versioned fixture: n versions per cell at ts = CELL_TS + 1000*i.

    The LATEST version (i = n-1) carries the plain value; older versions carry
    ``<value>@v<i>`` so latest-version-wins reads are easy to assert.

    Built as ONE scan + one explode over an n_versions * n_qualifiers struct
    array (not n_versions unioned unpivots — that plan scans the source once
    per version, ~2x slower measured, and at 100 TB means n full passes).
    The struct array is one ``F.expr`` parse — see ``encode_table_as_cells``
    for the plan-construction rationale.
    """
    vals = customer_value_columns()
    entries = []
    for i in range(n_versions):
        for q, v in sorted(vals.items()):
            rendered = (
                f"concat(cast(({v}) AS string), '@v{i}')"
                if i < n_versions - 1
                else f"cast(({v}) AS string)"
            )
            entries.append(
                f"struct('{q}' AS q, encode({rendered}, 'UTF-8') AS v, "
                f"CAST({CELL_TS + 1000 * i} AS long) AS ts)"
            )
    return customer.select(
        F.expr(f"encode(cast(({_CUSTOMER_KEY_SQL}) AS string), 'UTF-8')").alias("row"),
        F.explode(F.expr("array(" + ", ".join(entries) + ")")).alias("cell"),
    ).select(
        "row",
        F.lit("cf").alias("family"),
        F.encode(F.col("cell.q"), "UTF-8").cast("binary").alias("qualifier"),
        F.col("cell.ts").alias("ts"),
        F.lit("Put").alias("type"),
        F.col("cell.v").cast("binary").alias("value"),
    )


#: deterministic delete-marker selector for the cells_with_deletes fixture
DELETE_MOD, DELETE_REMAINDER = 25, 3


def customer_cells_with_deletes(customer: DataFrame) -> DataFrame:
    """cells fixture with HBase delete markers: for every customer with
    c_custkey % 25 == 3 a ``type='Delete'`` cell at ts CELL_TS+1000 masks the
    ``c_acctbal`` qualifier (CopyRow.java:135 carries cell type through;
    delete-marker-wins is standard HBase read semantics)."""
    base = customer_cells(customer)
    markers = customer.filter(
        F.col("c_custkey") % DELETE_MOD == DELETE_REMAINDER
    ).select(
        F.encode(F.format_string(CUSTOMER_KEY_FMT, F.col("c_custkey")), "UTF-8").alias("row"),
        F.lit("cf").alias("family"),
        F.encode(F.lit("c_acctbal"), "UTF-8").cast("binary").alias("qualifier"),
        F.lit(CELL_TS + 1000).cast("long").alias("ts"),
        F.lit("Delete").alias("type"),
        F.lit(None).cast("binary").alias("value"),
    )
    return base.unionByName(markers)


def customer_cells_versioned_with_deletes(customer: DataFrame) -> DataFrame:
    """Versioned fixture (3 versions/cell) plus delete markers: customers
    with c_custkey % 25 == 3 get a ``Delete`` on ``c_acctbal`` at
    CELL_TS + 5000, above every Put version — the full compaction scenario
    (shadowed versions AND deleted data)."""
    base = customer_cells_versioned(customer)
    markers = customer.filter(
        F.col("c_custkey") % DELETE_MOD == DELETE_REMAINDER
    ).select(
        F.encode(F.format_string(CUSTOMER_KEY_FMT, F.col("c_custkey")), "UTF-8").alias("row"),
        F.lit("cf").alias("family"),
        F.encode(F.lit("c_acctbal"), "UTF-8").cast("binary").alias("qualifier"),
        F.lit(CELL_TS + 5000).cast("long").alias("ts"),
        F.lit("Delete").alias("type"),
        F.lit(None).cast("binary").alias("value"),
    )
    return base.unionByName(markers)


def cells_to_wide(cells: DataFrame, qualifiers: list[str]) -> DataFrame:
    """cells -> wide table, latest-version-wins per (row, qualifier).

    Scale note: implemented as ONE hash aggregation with ``max_by(value, ts)``
    per qualifier — partial (map-side) aggregation applies, unlike the naive
    window row_number()==1 formulation which needs a full sort per partition.
    """
    q_str = F.decode(F.col("qualifier"), "UTF-8")
    v_str = F.decode(F.col("value"), "UTF-8")
    aggs = [
        F.max_by(F.when(q_str == q, v_str), F.when(q_str == q, F.col("ts"))).alias(q)
        for q in qualifiers
    ]
    return cells.filter(F.col("type") == "Put").groupBy("row").agg(*aggs)
