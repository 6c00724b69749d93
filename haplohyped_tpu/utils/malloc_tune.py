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
import threading

logger = logging.getLogger(__name__)

# glibc mallopt parameter numbers (malloc.h)
M_TRIM_THRESHOLD = -1
M_MMAP_THRESHOLD = -3
M_ARENA_MAX = -8

_done = False


def tune_malloc(threshold_bytes: int = (1 << 31) - 1) -> bool:
    """Keep freed large buffers in the malloc arena for reuse.

    The default is INT_MAX (mallopt takes an int): with the old 1 GiB
    threshold, any single allocation >= 1 GiB was served by mmap and
    munmap'd on free — which silently un-did :func:`prefault_arena` for
    exactly the large cohorts it targets (verified: RSS retained 0 bytes
    after a 1.5 GiB prefault vs full retention at 512 MB) — and a freed
    arena top beyond 1 GiB was trimmed back to the OS.  INT_MAX keeps both
    paths in the arena for everything a 32-bit mallopt can express.

    Returns True when applied (glibc found and mallopt succeeded)."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        ok1 = libc.mallopt(M_MMAP_THRESHOLD, threshold_bytes)
        ok2 = libc.mallopt(M_TRIM_THRESHOLD, threshold_bytes)
        # one shared arena: worker threads otherwise allocate from fresh
        # per-thread mmap'd arenas, bypassing every page the main arena
        # prefaulted (allocation is rare and large here, so arena-lock
        # contention is irrelevant)
        libc.mallopt(M_ARENA_MAX, 1)
        _done = bool(ok1 and ok2)
    except Exception as exc:  # musl/macOS/etc: nothing to tune
        logger.debug("malloc tuning unavailable: %s", exc)
        _done = False
    return _done


_prefaulted_bytes = 0
_prefault_lock = threading.Lock()

MADV_HUGEPAGE = 14
_HUGE = 2 << 20


def _libc():
    return ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)


def prefault_arena(nbytes: int, background: bool = True) -> threading.Thread | None:
    """Fault ``nbytes`` of arena pages in NOW (page faults are kernel time,
    so a background thread absorbs them while the caller does real work)
    instead of mid-pipeline when the decode/struct buffers first allocate.

    The region is ``madvise(MADV_HUGEPAGE)``d BEFORE the first touch, so on
    fault-bound virtualized hosts (measured here: 4 KB faults cost ~100x
    bare metal through the hypervisor) the population runs as 2 MB faults —
    512x fewer hypervisor round-trips — independent of the system THP
    setting.  Requires :func:`tune_malloc` first so the touched pages
    survive the free and every later large allocation reuses them
    (measured on this rig: cold 3M-record conversion 3.3-6.5s -> 1.5s).
    Idempotent up to the largest requested size; allocation failure is
    swallowed (the prefault is an optimization, never a requirement)."""
    global _prefaulted_bytes
    with _prefault_lock:
        want = nbytes - _prefaulted_bytes
        if want <= 0:
            return None
        _prefaulted_bytes = nbytes

    # each block stays below the (INT_MAX) mmap threshold so glibc serves
    # it from the brk arena — a single super-threshold malloc would be
    # mmap'd and munmap'd on free, retaining zero pages (the silent no-op
    # ADVICE r3 flagged); all blocks are held live until every one is
    # touched, then freed together, and the raised trim threshold keeps
    # the coalesced top resident
    _BLOCK = 1 << 30

    def _touch(n: int = want) -> None:
        global _prefaulted_bytes
        ptrs: list[tuple[int, int]] = []
        try:
            libc = _libc()
            libc.malloc.restype = ctypes.c_void_p
            left = n
            while left > 0:
                blk = min(left, _BLOCK)
                ptr = libc.malloc(ctypes.c_size_t(blk))
                if not ptr:
                    raise MemoryError
                ptrs.append((ptr, blk))
                left -= blk
            for ptr, blk in ptrs:
                # malloc doesn't touch the pages; advise THP first so the
                # memset below populates them as hugepages
                a0 = (ptr + _HUGE - 1) & ~(_HUGE - 1)
                end = (ptr + blk) & ~(_HUGE - 1)
                if end > a0:
                    libc.madvise(
                        ctypes.c_void_p(a0),
                        ctypes.c_size_t(end - a0),
                        MADV_HUGEPAGE,
                    )
                libc.memset(ctypes.c_void_p(ptr), 0, ctypes.c_size_t(blk))
        except Exception:
            with _prefault_lock:
                _prefaulted_bytes -= n
        finally:
            try:
                for ptr, _ in ptrs:
                    libc.free(ctypes.c_void_p(ptr))
            except Exception:
                pass

    if background:
        t = threading.Thread(target=_touch, daemon=True, name="hh-prefault")
        t.start()
        return t
    _touch()
    return None


def enable_thp() -> bool:
    """Best-effort system-wide THP enable (benchmark/CLI entry points only
    — a library should not flip host-global knobs).  Covers allocations the
    arena prefault can't reach (h5py/Blosc internals).  Returns True when
    the knob was written; silently False without privileges."""
    try:
        with open("/sys/kernel/mm/transparent_hugepage/enabled", "w") as f:
            f.write("always")
        return True
    except OSError:
        return False
