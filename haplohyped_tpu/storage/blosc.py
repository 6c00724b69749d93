"""Blosc HDF5 filter (id 32001) registration.

The reference gets this filter from the ``hdf5plugin`` wheel (imported at
``vcf_to_h5.py:8`` / ``fasta_encoder.py:10``).  Here the filter is first-party
native code (``cpp/blosc_h5_filter.c``) linked against the system c-blosc, and
registered into the already-loaded libhdf5 via ``H5Zregister`` — the same
mechanism hdf5plugin uses, without the dependency.

If the native plugin (or system blosc) is unavailable, writers transparently
fall back to gzip so the pipeline still runs everywhere; artifact-parity tests
assert the Blosc path on machines that have it.
"""

from __future__ import annotations

import ctypes
import glob
import logging
import os
import threading

from haplohyped_tpu.core.constants import (
    BLOSC_FILTER_ID,
    COHORT_COMPRESSION_OPTS,
    REFERENCE_COMPRESSION_OPTS,
)

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_native")
_PLUGIN_PATH = os.path.join(_NATIVE_DIR, "libhh_blosc_h5.so")

_lock = threading.Lock()
_registered: bool | None = None
_plugin_handle = None  # keep the dlopen handle alive


def _find_libhdf5() -> str | None:
    """Locate the libhdf5 shared object h5py bundles (or a system one)."""
    try:
        import h5py

        h5py_dir = os.path.dirname(h5py.__file__)
        for pattern in (
            os.path.join(os.path.dirname(h5py_dir), "h5py.libs", "libhdf5-*.so*"),
            os.path.join(h5py_dir, ".libs", "libhdf5-*.so*"),
        ):
            hits = sorted(glob.glob(pattern))
            hits = [h for h in hits if "hl" not in os.path.basename(h)]
            if hits:
                return hits[0]
    except Exception:  # pragma: no cover
        pass
    for cand in ("libhdf5.so", "libhdf5.so.310", "libhdf5.so.200"):
        try:
            ctypes.CDLL(cand)
            return cand
        except OSError:
            continue
    return None


def register_blosc_filter() -> bool:
    """Register the native Blosc filter with the in-process HDF5 library.

    Idempotent and thread-safe.  Returns True if filter 32001 is usable.
    """
    global _registered, _plugin_handle
    with _lock:
        if _registered is not None:
            return _registered
        _registered = False
        try:
            import h5py

            # Already registered (e.g. hdf5plugin or a prior call)?
            if h5py.h5z.filter_avail(BLOSC_FILTER_ID):
                _registered = True
                return True

            if not os.path.exists(_PLUGIN_PATH):
                logger.warning("blosc HDF5 plugin not built: %s", _PLUGIN_PATH)
                return False

            libhdf5_path = _find_libhdf5()
            if libhdf5_path is None:
                logger.warning("could not locate libhdf5 for filter registration")
                return False

            # Promote libhdf5's symbols to the global namespace so the plugin's
            # undefined H5P*/H5T* references resolve at dlopen time.
            libhdf5 = ctypes.CDLL(libhdf5_path, mode=ctypes.RTLD_GLOBAL)
            _plugin_handle = ctypes.CDLL(_PLUGIN_PATH, mode=ctypes.RTLD_GLOBAL)

            _plugin_handle.H5PLget_plugin_info.restype = ctypes.c_void_p
            info = _plugin_handle.H5PLget_plugin_info()

            libhdf5.H5Zregister.argtypes = [ctypes.c_void_p]
            libhdf5.H5Zregister.restype = ctypes.c_int
            if libhdf5.H5Zregister(info) < 0:
                logger.warning("H5Zregister(blosc) failed")
                return False

            _registered = bool(h5py.h5z.filter_avail(BLOSC_FILTER_ID))
            return _registered
        except Exception as exc:  # pragma: no cover
            logger.warning("blosc filter registration failed: %s", exc)
            return False


def set_blosc_nthreads(n: int) -> None:
    """Set blosc-internal compression threads (the --cxx_threads knob)."""
    if register_blosc_filter() and _plugin_handle is not None:
        _plugin_handle.hh_blosc_set_nthreads(ctypes.c_int(int(n)))


def blosc_available() -> bool:
    return register_blosc_filter()


#: Rows per chunk for large cohort tables.  With the parallel direct-chunk
#: writer (storage/fastwrite.py) write throughput is flat in chunk size
#: (measured 243-260 MB/s from 1.5K to 32K rows on realistic 3M-row
#: structs — the old HDF5-lock serialization, not per-chunk overhead, was
#: the cost), so the choice is governed by random-access reads: 4096 rows
#: (~143 KB) measures 6,052 500-row slices/s vs 280/s at 256K rows, with a
#: slightly better ratio than h5py's ~1.5K-row auto chunks.  Value/dtype/
#: cd_values parity with the reference artifact is unchanged — chunk shape
#: is a private layout detail any HDF5 reader handles transparently.
COHORT_CHUNK_ROWS = 4096


def cohort_compression_kwargs(n_records: int | None = None) -> dict:
    """``h5py.create_dataset`` kwargs for cohort SNP tables.

    Blosc 32001 with the reference's cd_values when available, gzip
    otherwise.  With ``n_records``, picks the measured-fastest explicit
    chunk shape for that row count; without it, h5py auto-chunks.
    """
    if n_records is None or n_records <= 0:
        chunks: bool | tuple = True
    else:
        chunks = (min(COHORT_CHUNK_ROWS, n_records),)
    if register_blosc_filter():
        return {
            "compression": BLOSC_FILTER_ID,
            "compression_opts": COHORT_COMPRESSION_OPTS,
            "chunks": chunks,
        }
    return {"compression": "gzip", "compression_opts": 4, "chunks": chunks}


def reference_compression_kwargs(chunks: bool | tuple = True) -> dict:
    """``h5py.create_dataset`` kwargs for reference one-hot sequences."""
    if register_blosc_filter():
        return {
            "compression": BLOSC_FILTER_ID,
            "compression_opts": REFERENCE_COMPRESSION_OPTS,
            "chunks": chunks,
        }
    return {"compression": "gzip", "compression_opts": 4, "chunks": chunks}
