from .audit import (
    count_shuffles,
    runtime_exchange_stats,
    plan_fingerprint,
    plan_string,
    pushed_filters,
    uses_take_ordered,
)

__all__ = [
    "count_shuffles",
    "runtime_exchange_stats",
    "plan_fingerprint",
    "plan_string",
    "pushed_filters",
    "uses_take_ordered",
]
