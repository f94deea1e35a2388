"""Inspect a DataFrame's physical plan as text.

Used by tests/test_plans.py to pin the plan properties that matter at
scale (SURVEY.md §4): predicate pushdown to the parquet scan, column
pruning, broadcast of small join sides, TakeOrderedAndProject for ordered
limits. A regression that silently turns the resume anti-join into a
shuffled sort-merge join, or widens a scan to all columns, fails a test —
not just a benchmark.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists in the plan, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for each scan in the plan."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def uses_broadcast_join(df: DataFrame, join_type: str | None = None) -> bool:
    plan = formatted_plan(df)
    if join_type:
        return bool(re.search(rf"BroadcastHashJoin {join_type}", plan))
    return "BroadcastHashJoin" in plan


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)
