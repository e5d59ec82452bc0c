"""Session-scoped memo registry for trained/cached ANN + dedup artifacts.

Operator modules memoize expensive build products (shingle indexes, LSH
index tables, k-means centroids, PQ codebooks) in module-level dicts keyed
by (applicationId, ...). Those dicts deliberately live for the length of a
bench process, but a long-lived host that cycles SparkSessions -- or
rewrites an sf_dir mid-application -- needs a way to drop dead references
and unpersist the .cache()d DataFrames. Every memo dict registers here and
:func:`clear` is that hook; call it at session teardown (tests' spark
fixture finalizer does).
"""

from __future__ import annotations

from typing import Any

_REGISTRY: list[dict] = []


def register(d: dict) -> dict:
    """Register a memo dict (keys start with applicationId) and return it."""
    _REGISTRY.append(d)
    return d


def _unpersist(value: Any) -> None:
    from pyspark.sql import DataFrame

    # memo values come in several shapes: bare DataFrames, tuples of them,
    # LISTS of per-iteration chain states (graph._rank_chain), and lists
    # of (nodes, edges) tuples (graph.kcore_trajectory) -- walk them all,
    # else clear() silently leaks the nested checkpointed tables
    if isinstance(value, (tuple, list)):
        for v in value:
            _unpersist(v)
        return
    if isinstance(value, DataFrame):
        try:
            value.unpersist()
        except Exception:
            pass  # context already stopped; nothing to release


def clear(app_id: str | None = None) -> int:
    """Evict memo entries (all, or one application's), unpersisting any
    cached DataFrames they hold. Returns the number of entries dropped."""
    n = 0
    for d in _REGISTRY:
        for key in list(d):
            if app_id is not None and key[0] != app_id:
                continue
            _unpersist(d.pop(key))
            n += 1
    return n
