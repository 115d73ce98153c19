"""glibc malloc tuning for large-array workloads.

numpy temporaries above glibc's default mmap threshold (128 KB) are
served by fresh ``mmap`` and returned with ``munmap`` — every batch
iteration re-pays soft page faults for the same few hundred MB of
scratch (matmul outputs, partition copies, bool masks).  With 32
concurrent Ray workers the kernel-side fault/zone-lock contention
multiplies per-task wall time ~3-4x (measured on this host: a
100 MB-temp churn loop runs 65.7 s default vs 10.1 s tuned — 6.5x).

``tune_malloc()`` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD to 1 GB
so large blocks come from the sbrk heap and freed memory is RETAINED
for reuse instead of being unmapped.  Cost: each worker process holds
its scratch high-water mark (~hundreds of MB here) instead of
returning it to the OS between batches — the standard time/space trade
for steady-state batch processing.

Called once from ``geografir_ray/__init__`` — every Ray worker that
unpickles a stage function imports the package, so the tuning reaches
all task/actor processes without any runtime_env plumbing.  No-op on
non-glibc platforms.
"""

from __future__ import annotations

_done = False


def tune_malloc() -> bool:
    """Idempotently raise glibc's mmap/trim thresholds. Returns True if
    applied (glibc present and mallopt succeeded)."""
    global _done
    if _done:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)) and bool(
            libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        )
    except Exception:
        return False
    _done = ok
    return ok
