"""Process-level allocator tuning for the driver and Python workers.

Large numpy temporaries (distance blocks, gradient buffers) default to
glibc mmap allocations that are unmapped on free — so every task
re-faults fresh pages. On virtualized hosts (lazy second-stage page
faults) that costs *seconds* per ~32 MB block, dwarfing the actual
math. Raising the mmap/trim thresholds keeps big buffers on the
retained heap: pages fault once per process, then get reused.

Call :func:`tune_malloc` once per process — it is invoked from the
driver session factory and at the top of every Arrow-batched kernel so
Spark's Python workers are covered too. No-ops safely where glibc
``mallopt`` is unavailable.
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_malloc() -> None:
    """Idempotently raise glibc's mmap + trim thresholds to 1 GiB."""
    global _done
    if _done:
        return
    _done = True
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass
