"""Process-lifetime scratch directories for persisted artifacts.

Memoized queries materialize on-disk artifacts (persisted LSH/IVF index
tables, ORC/CSV/JSONL layout twins, reference-layout migration fixtures).
``tempfile.mkdtemp`` alone leaks one directory per process on shared
machines; every scratch dir allocated here is registered for a single
``atexit`` ``shutil.rmtree`` sweep, so artifact lifetime == process
lifetime -- exactly the lifecycle the memo dicts that point at these
paths already have (operators/_memo.py).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def _cleanup() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup)


def scratch_dir(prefix: str) -> str:
    """A fresh temp directory removed automatically at process exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(path)
    return path
