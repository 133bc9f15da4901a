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


_blas_setter = None
_blas_current: int | None = None


def _resolve_blas_setter():
    """Locate the loaded OpenBLAS's set_num_threads symbol (once)."""
    global _blas_setter
    if _blas_setter is not None:
        return _blas_setter
    import os

    _blas_setter = False  # poison on failure
    try:
        for line in open("/proc/self/maps"):
            path = line.rsplit(None, 1)[-1]
            if not path.startswith("/"):
                continue
            if "openblas" not in os.path.basename(path).lower():
                continue
            lib = ctypes.CDLL(path)
            for sym in (
                "openblas_set_num_threads64_",
                "openblas_set_num_threads",
                "goto_set_num_threads64_",
                "goto_set_num_threads",
            ):
                fn = getattr(lib, sym, None)
                if fn is not None:
                    _blas_setter = fn
                    return _blas_setter
    except Exception:
        pass
    return _blas_setter


def pin_blas_threads(n: int = 1) -> None:
    """Cap this process's OpenBLAS pool (default: serial).

    OpenBLAS sizes its pool to nproc (32 here). Inside a Spark Python
    worker that means every GEMM fans out 32 spin-waiting threads
    while 31 sibling workers do the same — 1024 runnable threads on
    32 cores. Measured on the 50k-row kNN block pass: ~7 s/task for a
    GEMM whose single-threaded time is ~1.3 s; per-task aggregate
    GEMM time dropped 229 s → ~45 s after pinning. One BLAS thread
    per worker is the right shape — the executor already runs one
    task per core. Driver-side code keeps the full pool (the local
    small-input t-SNE path WANTS the 32-way GEMM), which is why this
    is NOT folded into :func:`tune_malloc`.
    """
    global _blas_current
    import os

    if os.environ.get("SPARK_GRAFT_BLAS_PIN", "1") == "0":
        return
    if _blas_current == n:
        return
    fn = _resolve_blas_setter()
    if fn:
        try:
            fn(int(n))
            _blas_current = n
        except Exception:
            pass


def unpin_blas_threads(concurrent_tasks: int = 1, floor: int = 1) -> None:
    """Widen this worker's OpenBLAS pool for NARROW kernels — bounded
    by how many sibling tasks run the same kernel concurrently.

    The pin is process-sticky: a worker that ran a wide pass stays at
    1 BLAS thread, which starves the few-task query-batch GEMMs
    (IVF/PQ/top-k with ~100-query batches) that legitimately want the
    idle cores. Each kernel declares its shape: wide passes call
    ``tune_worker()``, narrow ones call this after ``tune_malloc()``
    (A/B at sf0.1: ann_ivf_pq 4.1 s pinned vs 2.9 s unpinned, while
    the 32-task kNN block pass needs the pin — see
    :func:`pin_blas_threads`).

    ``concurrent_tasks`` is the plan-side partition count of the
    stage the kernel runs in. An unconditional restore-to-nproc here
    would recreate the 32×32 oversubscription the pin exists to fix
    the moment a "narrow" kernel is fed a many-partition input, so
    the pool is sized to the worker's fair share of the cores:
    ``max(1, nproc // min(concurrent_tasks, nproc))`` — 1-partition
    query batch → full pool, 32-partition scan → 1 thread each.

    ``floor``: plan-side partition count OVERSTATES concurrency for
    query-side stages whose input partitions are mostly empty (a
    filtered query batch inherits the table's 32 parquet splits but
    only a few hold rows) — fair-share then runs 1-thread BLAS with
    idle cores. A floor bounds that from below at mild
    oversubscription worst case. MEASURED at sf0.1 (ABBA interleaved,
    ``scripts/ab_blas_floor.py``, SCALE.md r11): floor=4 is a wash on
    ivf_topk (2.41 vs 2.45 s min) and consistently ~11% SLOWER on the
    index query path (0.91 vs 1.01 s — the ~100-row query GEMMs are
    too small to amortize thread-pool churn), so no production kernel
    currently passes a floor; the knob stays for genuinely starved
    shapes found later.
    """
    import os

    cpus = os.cpu_count() or 1
    share = max(1, cpus // max(1, min(int(concurrent_tasks), cpus)))
    share = min(cpus, max(share, int(floor)))
    pin_blas_threads(share)


def tune_worker() -> None:
    """Per-Python-worker setup for WIDE passes (one task per core):
    malloc thresholds + serial BLAS. Call at the top of Arrow-batched
    kernels that fan out cluster-wide; narrow query-batch kernels use
    ``tune_malloc()`` + :func:`unpin_blas_threads` instead.
    """
    tune_malloc()
    pin_blas_threads(1)


_WS_CACHE: dict = {}
_WS_CACHE_MAX = 4


def cached_shared_empty(name: str, shape, dtype=np.float64) -> np.ndarray:
    """Process-cached :func:`shared_empty` workspace.

    First-touch zero-fill of a fresh mmap is real time at 100+ MB per
    task; Spark reuses worker processes across tasks and jobs, so one
    mapping per (name, shape) serves every task the worker ever runs.
    Exact-shape keying keeps every returned array C-contiguous (BLAS
    ``out=`` targets). A small LRU bounds worker memory when one
    worker serves tables of several sizes.
    """
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    key = (name, shape, np.dtype(dtype).str)
    arr = _WS_CACHE.pop(key, None)
    if arr is None:
        arr = shared_empty(shape, dtype)
    _WS_CACHE[key] = arr  # re-insert = move to MRU position
    while len(_WS_CACHE) > _WS_CACHE_MAX:
        _WS_CACHE.pop(next(iter(_WS_CACHE)))
    return arr


def drop_cached_workspaces(prefix: str | None = None) -> int:
    """Release process-cached workspaces (optionally only those whose
    name starts with ``prefix``); returns how many were dropped.

    The cache is by-design sticky across tasks — but a suite that runs
    one kernel family with a huge working set (the t-SNE flagship's
    ~100 MB-per-worker kNN workspace) and then a different numpy-heavy
    family inherits 32 workers × that residency for the rest of the
    session (BENCH r10: ann_ivf_pq_topk measured 9.9 s in-suite vs
    4.63 s isolated — pure memory-pressure tax, not kernel time).
    Dropping the mapping AND ``madvise(MADV_DONTNEED)``-ing its pages
    returns them to the OS immediately; the next user of the same
    (name, shape) just re-faults a fresh shared mapping at the fast
    shared-anon rate. Call cluster-wide via a one-task-per-worker
    ``mapInPandas`` pass (see bench.py's post-flagship release).
    """
    dropped = 0
    for key in list(_WS_CACHE):
        if prefix is not None and not key[0].startswith(prefix):
            continue
        arr = _WS_CACHE.pop(key)
        base = arr
        try:
            while getattr(base, "base", None) is not None and not isinstance(
                base, mmap.mmap
            ):
                base = base.base
            if isinstance(base, mmap.mmap):
                base.madvise(mmap.MADV_DONTNEED)
        except (ValueError, OSError, AttributeError):
            pass
        dropped += 1
    return dropped


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
