"""Physical-plan inspection helpers.

Used by tests to assert the *plan shape*, not just results: filters pushed to
the parquet scan, column pruning in ReadSchema, broadcast joins for dims,
no stray exchanges. This is how "would this survive 100×?" gets checked
mechanically on every CI run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm  # noqa: SLF001 — classic-mode plan access
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)  # noqa: SLF001


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = plan_string(df)
    assert "PushedFilters" in plan, plan
    assert fragment in plan, f"expected pushed filter {fragment!r} in plan:\n{plan}"


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Assert the parquet scan reads no more than `columns` (column pruning)."""
    import re

    plan = plan_string(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, f"no ReadSchema in plan:\n{plan}"
    read = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
    assert read <= columns, f"scan reads {read - columns} beyond {columns}:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def count_exchanges(df: DataFrame) -> int:
    plan = plan_string(df, mode="simple")
    return plan.count("Exchange")
