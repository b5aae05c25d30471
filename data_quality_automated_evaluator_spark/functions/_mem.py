"""glibc allocator tuning for numpy-heavy Arrow UDF workers.

The vectorized scoring cores allocate multi-MB temporaries per batch.
glibc serves allocations above M_MMAP_THRESHOLD (default 128 KB) with
mmap and RETURNS them to the OS on free — so every batch re-faults its
temporaries, and under memory pressure (JVM heap + page cache on a busy
executor) 32 concurrent workers serialize on kernel page zeroing /
mmap_sem, turning a 0.5 s batch into seconds, intermittently.

Raising the threshold keeps those blocks in the arena for reuse: pages
fault once per worker process instead of once per batch. Total arena
growth is bounded by the per-batch working set (tens of MB).

No-op (with a pass) on non-glibc platforms.
"""

from __future__ import annotations

import ctypes

_M_MMAP_THRESHOLD = -3
_applied = False


def raise_mmap_threshold(threshold_bytes: int = 64 << 20) -> None:
    """Idempotently set glibc's mmap threshold (default: 64 MB)."""
    global _applied
    if _applied:
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, int(threshold_bytes))
        _applied = True
    except Exception:
        pass
