"""glibc malloc tuning for fault-bound hosts.

On virtualized rigs (measured here: ~27 MB/s first-touch page-fault
throughput, ~100x slower than bare metal) every large fresh allocation —
frame buffers, decode output columns, SNP structs — stalls the pipeline for
seconds.  glibc's default policy makes it worse: allocations above the mmap
threshold are munmap'd on free, so the SAME cost repeats for every
(chromosome, donor-block) task.

``tune_malloc()`` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD so big
buffers come from the main arena and stay there after free: the first task
pays the faults once, every later task reuses warm pages (measured: 2.0s
first touch -> 0.001s on reuse for a 74 MB buffer).  No-op on non-glibc
platforms.  The converter pipelines call this at start; long-running
services amortize the first touch to nothing.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import logging

logger = logging.getLogger(__name__)

# glibc mallopt parameter numbers (malloc.h)
M_TRIM_THRESHOLD = -1
M_MMAP_THRESHOLD = -3

_done = False


def tune_malloc(threshold_bytes: int = 1 << 30) -> bool:
    """Keep freed large buffers in the malloc arena for reuse.

    Returns True when applied (glibc found and mallopt succeeded)."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        ok1 = libc.mallopt(M_MMAP_THRESHOLD, threshold_bytes)
        ok2 = libc.mallopt(M_TRIM_THRESHOLD, threshold_bytes)
        _done = bool(ok1 and ok2)
    except Exception as exc:  # musl/macOS/etc: nothing to tune
        logger.debug("malloc tuning unavailable: %s", exc)
        _done = False
    return _done
