"""Physical-plan introspection helpers — make plan shape testable.

The scale contract ("filters push down", "small sides broadcast",
"expressions stay in codegen") is asserted in tests via these helpers
instead of being hoped for. Catalyst's formatted explain output is the
source of truth.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            for field in inner.split(","):
                if ":" in field:
                    cols.append(field.split(":", 1)[0].strip())
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")


def shuffle_count(df: DataFrame) -> int:
    """Exchange operators in the plan (AQE may later coalesce them)."""
    return formatted_plan(df).count("Exchange")
