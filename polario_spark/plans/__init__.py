from polario_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_join",
]
