"""Physical-plan introspection helpers — regression-test that Catalyst
produces the plans PLANS.md promises (pushdown, broadcast, pruned scans)."""

from gemini_ocr_batch_spark.plans.checks import (
    formatted_plan,
    pushed_filters,
    read_schemas,
    uses_broadcast_join,
    uses_take_ordered,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "uses_broadcast_join",
    "uses_take_ordered",
]
