"""Process-level memory tuning for the driver and Python workers.

This host class (lazily-restored VM memory) services PRIVATE anonymous
page faults through a slow path: ~700 µs per 4 KiB page, i.e. ~6 MB/s
of fresh memory, measured — and the cost scales with bytes, so
transparent hugepages don't help. SHARED anonymous mappings fault at
~400+ MB/s (measured 600× faster). Two mitigations, both process-local
and safe everywhere else:

- :func:`tune_malloc`: raise glibc's mmap/trim thresholds so freed
  big buffers stay on the retained heap — each page faults once per
  process instead of once per task.
- :func:`shared_empty`: numpy workspaces backed by MAP_SHARED
  anonymous mmap for the large per-kernel scratch blocks (distance /
  numerator matrices), which takes the slow fault path out of the hot
  loop entirely.

Measured dead end (do NOT revisit): ``-XX:+UseTransparentHugePages``
on the Spark JVM makes a 50M-row groupBy ~25-40x SLOWER here (10.5s →
247-393s, reproduced twice) — the restore path's cost scales with
bytes, so 2 MiB faults restore 512x the data per fault with zero
amortization benefit.

Call :func:`tune_malloc` once per process — it is invoked from the
driver session factory and at the top of every Arrow-batched kernel so
Spark's Python workers are covered too. No-ops safely where glibc
``mallopt`` is unavailable.
"""

from __future__ import annotations

import ctypes
import mmap

import numpy as np

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


def shared_empty(shape, dtype=np.float64) -> np.ndarray:
    """Uninitialized numpy array on a MAP_SHARED anonymous mapping.

    Semantically np.empty; the backing mmap is kept alive via the
    array's ``.base``. Use for large reusable kernel workspaces —
    shared-anon faults bypass this host's slow private-anon restore
    path. Not for data that must survive fork-COW semantics (scratch
    only).
    """
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    dt = np.dtype(dtype)
    nbytes = int(np.prod(shape)) * dt.itemsize
    buf = mmap.mmap(-1, max(1, nbytes))
    return np.frombuffer(buf, dtype=dt, count=int(np.prod(shape))).reshape(shape)
