from .audit import (
    count_shuffles,
    runtime_exchange_stats,
    plan_fingerprint,
    plan_string,
    pushed_filters,
    uses_take_ordered,
)
from .report import report_sort

__all__ = [
    "count_shuffles",
    "runtime_exchange_stats",
    "plan_fingerprint",
    "plan_string",
    "pushed_filters",
    "uses_take_ordered",
    "report_sort",
]
