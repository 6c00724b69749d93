"""ctypes bindings for the native hostio shim (cpp/hostio.cpp)."""

from __future__ import annotations

import ctypes
import logging
import os
import threading

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhh_hostio.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None | bool = None  # None = not tried, False = failed


def _load() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is None:
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.hh_free.argtypes = [ctypes.c_void_p]
                lib.hh_vcf_samples.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_vcf_frame.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_char_p,
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_vcf_frame12.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_char_p,
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_vcf_frame_v2.argtypes = (
                    [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
                    + [ctypes.c_int]
                    + [ctypes.c_int64] * 3
                    + [
                        ctypes.POINTER(ctypes.c_void_p),  # fixed
                        ctypes.POINTER(ctypes.c_void_p),  # gt
                        ctypes.POINTER(ctypes.c_int64),  # n
                        ctypes.POINTER(ctypes.c_int32),  # s
                        ctypes.POINTER(ctypes.c_void_p),  # exc_idx
                        ctypes.POINTER(ctypes.c_void_p),  # exc_pos
                        ctypes.POINTER(ctypes.c_int64),  # n_exc
                        ctypes.POINTER(ctypes.c_void_p),  # run_counts
                        ctypes.POINTER(ctypes.c_void_p),  # run_ids
                        ctypes.POINTER(ctypes.c_int64),  # n_runs
                        ctypes.POINTER(ctypes.c_void_p),  # chroms
                        ctypes.POINTER(ctypes.c_void_p),  # samples
                        ctypes.POINTER(ctypes.c_int64),  # total_seen
                        ctypes.POINTER(ctypes.c_int64),  # blocks_decoded
                    ]
                    + [ctypes.c_char_p, ctypes.c_int]
                )
                lib.hh_vcf_text.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_vcf_index.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_void_p),  # text
                    ctypes.POINTER(ctypes.c_int64),  # text_len
                    ctypes.POINTER(ctypes.c_void_p),  # line_off
                    ctypes.POINTER(ctypes.c_void_p),  # line_len
                    ctypes.POINTER(ctypes.c_int64),  # n_lines
                    ctypes.POINTER(ctypes.c_void_p),  # bounds
                    ctypes.POINTER(ctypes.c_void_p),  # pos
                    ctypes.POINTER(ctypes.c_void_p),  # samples
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_bgzf_open.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_bgzf_open.restype = ctypes.c_void_p
                lib.hh_bgzf_close.argtypes = [ctypes.c_void_p]
                lib.hh_bgzf_uoffset.argtypes = [ctypes.c_void_p, ctypes.c_int64]
                lib.hh_bgzf_uoffset.restype = ctypes.c_int64
                lib.hh_bgzf_coffset.argtypes = [ctypes.c_void_p, ctypes.c_int64]
                lib.hh_bgzf_coffset.restype = ctypes.c_int64
                lib.hh_bgzf_block_at.argtypes = [ctypes.c_void_p, ctypes.c_int64]
                lib.hh_bgzf_block_at.restype = ctypes.c_int64
                lib.hh_bgzf_decode_range.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int,
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_is_bcf.argtypes = [ctypes.c_char_p]
                lib.hh_bcf_samples.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_bcf_parse.argtypes = (
                    [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
                    + [ctypes.POINTER(ctypes.c_void_p)] * 10
                    + [ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_void_p)]
                    + [ctypes.c_char_p, ctypes.c_int]
                )
                lib.hh_bcf_parse_v2.argtypes = (
                    [
                        ctypes.c_char_p,
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.c_int32,
                        ctypes.c_int,
                    ]
                    + [ctypes.POINTER(ctypes.c_void_p)] * 11
                    + [ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_void_p)]
                    + [ctypes.c_char_p, ctypes.c_int]
                )
                lib.hh_fasta_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
                lib.hh_fasta_open.restype = ctypes.c_void_p
                lib.hh_fasta_close.argtypes = [ctypes.c_void_p]
                lib.hh_fasta_nseq.argtypes = [ctypes.c_void_p]
                lib.hh_fasta_name.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_int,
                    ctypes.c_char_p,
                    ctypes.c_int,
                ]
                lib.hh_fasta_length.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
                lib.hh_fasta_length.restype = ctypes.c_int64
                lib.hh_fasta_fetch.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_void_p,
                ]
                lib.hh_fasta_fetch.restype = ctypes.c_int64
                _lib = lib
            except OSError as exc:
                logger.warning("native hostio unavailable (%s); using Python fallback", exc)
                _lib = False
        return _lib if _lib else None


def native_available() -> bool:
    return _load() is not None


#: Count of file decompressions performed by framing calls — lets tests
#: assert the single-pass property of the multi-sample converter (the
#: reference decompresses the whole file once per donor,
#: vcf_to_h5.py:142-152).  Indexed range framings still count as one call
#: here; their block subset is asserted via ``FrameV2.blocks_decoded``.
DECOMPRESS_COUNT = 0


def _count_decompress() -> None:
    global DECOMPRESS_COUNT
    DECOMPRESS_COUNT += 1


def vcf_samples(path: str, threads: int = 1) -> list[str]:
    lib = _load()
    assert lib is not None
    out = ctypes.c_void_p()
    n = ctypes.c_int64()
    err = ctypes.create_string_buffer(512)
    rc = lib.hh_vcf_samples(path.encode(), threads, ctypes.byref(out), ctypes.byref(n), err, 512)
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_vcf_samples failed ({rc})")
    try:
        raw = ctypes.string_at(out.value)
    finally:
        lib.hh_free(out)
    return raw.decode().split("\n") if raw else []


def vcf_frame(
    path: str, sample: str | None, region: str | None, threads: int = 1
) -> tuple[np.ndarray, int]:
    """Frame a VCF natively; returns ((n, 64) uint8, total_lines_seen)."""
    lib = _load()
    assert lib is not None
    out = ctypes.c_void_p()
    n = ctypes.c_int64()
    seen = ctypes.c_int64()
    err = ctypes.create_string_buffer(512)
    _count_decompress()
    rc = lib.hh_vcf_frame(
        path.encode(),
        sample.encode() if sample else None,
        region.encode() if region else None,
        threads,
        ctypes.byref(out),
        ctypes.byref(n),
        ctypes.byref(seen),
        err,
        512,
    )
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_vcf_frame failed ({rc})")
    try:
        nbytes = int(n.value) * 64
        buf = ctypes.string_at(out, nbytes) if nbytes else b""
    finally:
        lib.hh_free(out)
    records = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 64).copy()
    return records, int(seen.value)


def vcf_frame12(
    path: str, sample: str | None, region: str | None, threads: int = 1
) -> tuple[np.ndarray, list[str], int]:
    """Frame a VCF natively into compact 12-byte records.

    Returns ((n, 12) uint8, chrom_table, total_lines_seen).  Raises
    ``ValueError`` if the file has > 255 distinct chroms (callers fall back
    to :func:`vcf_frame`, whose 64-byte layout stores chroms inline).
    """
    lib = _load()
    assert lib is not None
    out = ctypes.c_void_p()
    n = ctypes.c_int64()
    seen = ctypes.c_int64()
    chroms_p = ctypes.c_void_p()
    err = ctypes.create_string_buffer(512)
    _count_decompress()
    rc = lib.hh_vcf_frame12(
        path.encode(),
        sample.encode() if sample else None,
        region.encode() if region else None,
        threads,
        ctypes.byref(out),
        ctypes.byref(n),
        ctypes.byref(seen),
        ctypes.byref(chroms_p),
        err,
        512,
    )
    if rc == 3:
        raise ValueError(err.value.decode())
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_vcf_frame12 failed ({rc})")
    try:
        nbytes = int(n.value) * 12
        buf = ctypes.string_at(out, nbytes) if nbytes else b""
        raw_chroms = ctypes.string_at(chroms_p)
    finally:
        lib.hh_free(out)
        lib.hh_free(chroms_p)
    records = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 12).copy()
    chroms = raw_chroms.decode().split("\n") if raw_chroms else []
    return records, chroms, int(seen.value)


def vcf_frame_v2(
    path: str,
    samples: "list[str] | str | None",
    region: str | None,
    threads: int = 1,
    c_lo: int = -1,
    u_skip: int = 0,
    c_hi: int = -1,
):
    """Frame a VCF natively into the v2 compact layout (one pass, S samples).

    ``samples``: None/[] = no genotypes; ``"*"`` = every header sample; a
    list or a single name = those samples in slot order.  ``c_lo >= 0``
    selects indexed range mode (see hh_vcf_frame_v2).  Returns a
    :class:`~haplohyped_tpu.hostio.frame_format.FrameV2`.  Raises
    ``ValueError`` on > 255 distinct chroms (fall back to vcf_frame).
    """
    from haplohyped_tpu.hostio.frame_format import V2_FIXED_SIZE, FrameV2

    lib = _load()
    assert lib is not None
    if samples is None:
        samples_arg = None
    elif isinstance(samples, str):
        samples_arg = samples.encode()
    else:
        samples_arg = "\n".join(samples).encode() if samples else None

    fixed_p, gt_p = ctypes.c_void_p(), ctypes.c_void_p()
    n, s = ctypes.c_int64(), ctypes.c_int32()
    exc_idx_p, exc_pos_p = ctypes.c_void_p(), ctypes.c_void_p()
    n_exc = ctypes.c_int64()
    run_counts_p, run_ids_p = ctypes.c_void_p(), ctypes.c_void_p()
    n_runs = ctypes.c_int64()
    chroms_p, samples_p = ctypes.c_void_p(), ctypes.c_void_p()
    seen, nblk = ctypes.c_int64(), ctypes.c_int64()
    err = ctypes.create_string_buffer(512)
    _count_decompress()
    rc = lib.hh_vcf_frame_v2(
        path.encode(),
        samples_arg,
        region.encode() if region else None,
        threads,
        c_lo,
        u_skip,
        c_hi,
        ctypes.byref(fixed_p),
        ctypes.byref(gt_p),
        ctypes.byref(n),
        ctypes.byref(s),
        ctypes.byref(exc_idx_p),
        ctypes.byref(exc_pos_p),
        ctypes.byref(n_exc),
        ctypes.byref(run_counts_p),
        ctypes.byref(run_ids_p),
        ctypes.byref(n_runs),
        ctypes.byref(chroms_p),
        ctypes.byref(samples_p),
        ctypes.byref(seen),
        ctypes.byref(nblk),
        err,
        512,
    )
    if rc == 3:
        raise ValueError(err.value.decode())
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_vcf_frame_v2 failed ({rc})")
    try:
        nn, ss, ne, nr = int(n.value), int(s.value), int(n_exc.value), int(n_runs.value)

        def take(p, dtype, count, itemsize):
            if count == 0:
                return np.zeros(count, dtype)
            # single copy out of the malloc'd buffer (string_at would
            # materialize an intermediate bytes object first)
            view = np.ctypeslib.as_array(
                ctypes.cast(p, ctypes.POINTER(ctypes.c_ubyte)),
                shape=(count * itemsize,),
            )
            return view.view(dtype).copy()

        fixed = take(fixed_p, np.uint8, nn * V2_FIXED_SIZE, 1).reshape(
            nn, V2_FIXED_SIZE
        )
        gt = (
            take(gt_p, np.uint8, nn * ss, 1).reshape(nn, ss)
            if ss
            else np.zeros((nn, 0), np.uint8)
        )
        exc_idx = take(exc_idx_p, np.int64, ne, 8)
        exc_pos = take(exc_pos_p, np.uint32, ne, 4)
        run_counts = take(run_counts_p, np.int64, nr, 8)
        run_ids = take(run_ids_p, np.uint8, nr, 1)
        raw_chroms = ctypes.string_at(chroms_p)
        raw_samples = ctypes.string_at(samples_p)
    finally:
        for p in (fixed_p, gt_p, exc_idx_p, exc_pos_p, run_counts_p, run_ids_p,
                  chroms_p, samples_p):
            lib.hh_free(p)
    return FrameV2(
        fixed=fixed,
        gt=gt,
        exc_idx=exc_idx,
        exc_pos=exc_pos,
        run_counts=run_counts,
        run_ids=run_ids,
        chroms=raw_chroms.decode().split("\n") if raw_chroms else [],
        samples=raw_samples.decode().split("\n") if raw_samples else [],
        total_seen=int(seen.value),
        blocks_decoded=int(nblk.value),
    )


class VCFText:
    """Zero-copy view over native-decompressed VCF text + line offsets.

    Holds the malloc'd buffers; numpy arrays are views — keep this object
    alive while using them.  ``close()`` (or GC) frees the native memory.
    """

    def __init__(self, text, line_offsets, line_lengths, samples, _frees):
        self.text: np.ndarray = text  # (T,) uint8
        self.line_offsets: np.ndarray = line_offsets  # (N,) int64
        self.line_lengths: np.ndarray = line_lengths  # (N,) int32
        self.samples: list[str] = samples
        self._frees = _frees

    @property
    def n_lines(self) -> int:
        return int(self.line_offsets.shape[0])

    def close(self):
        lib = _load()
        for p in self._frees:
            if p:
                lib.hh_free(p)
        self._frees = []
        self.text = self.line_offsets = self.line_lengths = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def vcf_text(path: str, threads: int = 1) -> VCFText:
    """Native decompress + data-line indexing (no per-field host work)."""
    lib = _load()
    assert lib is not None
    text_p = ctypes.c_void_p()
    text_len = ctypes.c_int64()
    off_p = ctypes.c_void_p()
    len_p = ctypes.c_void_p()
    n_lines = ctypes.c_int64()
    samples_p = ctypes.c_void_p()
    err = ctypes.create_string_buffer(512)
    _count_decompress()
    rc = lib.hh_vcf_text(
        path.encode(),
        threads,
        ctypes.byref(text_p),
        ctypes.byref(text_len),
        ctypes.byref(off_p),
        ctypes.byref(len_p),
        ctypes.byref(n_lines),
        ctypes.byref(samples_p),
        err,
        512,
    )
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_vcf_text failed ({rc})")
    n = int(n_lines.value)
    t = int(text_len.value)
    text = np.ctypeslib.as_array(
        ctypes.cast(text_p, ctypes.POINTER(ctypes.c_uint8)), shape=(t,)
    )
    offs = np.ctypeslib.as_array(
        ctypes.cast(off_p, ctypes.POINTER(ctypes.c_int64)), shape=(n,)
    )
    lens = np.ctypeslib.as_array(
        ctypes.cast(len_p, ctypes.POINTER(ctypes.c_int32)), shape=(n,)
    )
    raw_samples = ctypes.string_at(samples_p)
    samples = raw_samples.decode().split("\n") if raw_samples else []
    lib.hh_free(samples_p)
    return VCFText(
        text,
        offs,
        lens,
        samples,
        _frees=[text_p.value, off_p.value, len_p.value],
    )


class VCFIndex(VCFText):
    """VCFText plus per-line tab bounds (n, 9) int32 (relative to line
    start) and parsed POS (n,) int64 — the zero-Python-work backing of
    ``hostio.variants.VariantTable``.  Arrays are views over native
    memory; keep this object alive while using them."""

    def __init__(self, text, line_offsets, line_lengths, samples, bounds, pos, _frees):
        super().__init__(text, line_offsets, line_lengths, samples, _frees)
        self.bounds: np.ndarray = bounds  # (n, 9) int32
        self.pos: np.ndarray = pos  # (n,) int64

    def close(self):
        super().close()
        self.bounds = self.pos = None


def vcf_index(path: str, threads: int = 1) -> VCFIndex:
    """Native decompress + line/tab/POS indexing in one threaded pass."""
    lib = _load()
    assert lib is not None
    text_p = ctypes.c_void_p()
    text_len = ctypes.c_int64()
    off_p, len_p = ctypes.c_void_p(), ctypes.c_void_p()
    n_lines = ctypes.c_int64()
    bounds_p, pos_p, samples_p = ctypes.c_void_p(), ctypes.c_void_p(), ctypes.c_void_p()
    err = ctypes.create_string_buffer(512)
    _count_decompress()
    rc = lib.hh_vcf_index(
        path.encode(),
        threads,
        ctypes.byref(text_p),
        ctypes.byref(text_len),
        ctypes.byref(off_p),
        ctypes.byref(len_p),
        ctypes.byref(n_lines),
        ctypes.byref(bounds_p),
        ctypes.byref(pos_p),
        ctypes.byref(samples_p),
        err,
        512,
    )
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_vcf_index failed ({rc})")
    n = int(n_lines.value)
    t = int(text_len.value)
    text = np.ctypeslib.as_array(
        ctypes.cast(text_p, ctypes.POINTER(ctypes.c_uint8)), shape=(t,)
    )
    offs = np.ctypeslib.as_array(
        ctypes.cast(off_p, ctypes.POINTER(ctypes.c_int64)), shape=(n,)
    )
    lens = np.ctypeslib.as_array(
        ctypes.cast(len_p, ctypes.POINTER(ctypes.c_int32)), shape=(n,)
    )
    bounds = np.ctypeslib.as_array(
        ctypes.cast(bounds_p, ctypes.POINTER(ctypes.c_int32)), shape=(n, 9)
    )
    pos = np.ctypeslib.as_array(
        ctypes.cast(pos_p, ctypes.POINTER(ctypes.c_int64)), shape=(n,)
    )
    raw_samples = ctypes.string_at(samples_p)
    samples = raw_samples.decode().split("\n") if raw_samples else []
    lib.hh_free(samples_p)
    return VCFIndex(
        text,
        offs,
        lens,
        samples,
        bounds,
        pos,
        _frees=[text_p.value, off_p.value, len_p.value, bounds_p.value, pos_p.value],
    )


def is_bcf(path: str) -> bool:
    """True if the file is a BCF2 (plain or BGZF-wrapped)."""
    lib = _load()
    if lib is None:
        return False
    return bool(lib.hh_is_bcf(path.encode()))


def bcf_samples(path: str, threads: int = 1) -> list[str]:
    lib = _load()
    assert lib is not None
    out = ctypes.c_void_p()
    n = ctypes.c_int64()
    err = ctypes.create_string_buffer(512)
    rc = lib.hh_bcf_samples(path.encode(), threads, ctypes.byref(out), ctypes.byref(n), err, 512)
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_bcf_samples failed ({rc})")
    try:
        raw = ctypes.string_at(out.value)
    finally:
        lib.hh_free(out)
    return raw.decode().split("\n") if raw else []


def bcf_parse(path: str, sample: str | None, threads: int = 1) -> dict:
    """Parse a BCF into decoded per-record columns + the contig name table."""
    lib = _load()
    assert lib is not None
    ptrs = [ctypes.c_void_p() for _ in range(10)]
    n = ctypes.c_int64()
    contigs_p = ctypes.c_void_p()
    err = ctypes.create_string_buffer(512)
    rc = lib.hh_bcf_parse(
        path.encode(),
        sample.encode() if sample else None,
        threads,
        *[ctypes.byref(p) for p in ptrs],
        ctypes.byref(n),
        ctypes.byref(contigs_p),
        err,
        512,
    )
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_bcf_parse failed ({rc})")
    nn = int(n.value)

    def arr(p, dtype, count):
        if count == 0:
            return np.zeros(0, dtype)
        ct = {
            np.int32: ctypes.c_int32,
            np.uint8: ctypes.c_uint8,
            np.int8: ctypes.c_int8,
        }[dtype]
        return np.ctypeslib.as_array(ctypes.cast(p, ctypes.POINTER(ct)), shape=(count,)).copy()

    out = {
        "rid": arr(ptrs[0], np.int32, nn),
        "start": arr(ptrs[1], np.int32, nn),
        "stop": arr(ptrs[2], np.int32, nn),
        "ref_char": arr(ptrs[3], np.uint8, nn),
        "alt_char": arr(ptrs[4], np.uint8, nn),
        "ref_len": arr(ptrs[5], np.int32, nn),
        "alt_len": arr(ptrs[6], np.int32, nn),
        "phase1": arr(ptrs[7], np.int8, nn),
        "phase2": arr(ptrs[8], np.int8, nn),
        "bcf_flags": arr(ptrs[9], np.uint8, nn),
    }
    raw = ctypes.string_at(contigs_p)
    out["contigs"] = raw.decode().split("\n") if raw else []
    for p in ptrs:
        lib.hh_free(p)
    lib.hh_free(contigs_p)
    return out


def bcf_parse_v2(path: str, want_idx: np.ndarray, threads: int = 1) -> dict:
    """Single-pass multi-sample BCF parse: shared per-record columns plus
    (N, S) genotype matrices for the samples at header indices ``want_idx``
    (slot order).  The BCF twin of :func:`vcf_frame_v2` + decode."""
    lib = _load()
    assert lib is not None
    want = np.ascontiguousarray(want_idx, dtype=np.int32)
    S = int(want.shape[0])
    ptrs = [ctypes.c_void_p() for _ in range(11)]
    n = ctypes.c_int64()
    contigs_p = ctypes.c_void_p()
    err = ctypes.create_string_buffer(512)
    rc = lib.hh_bcf_parse_v2(
        path.encode(),
        want.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        S,
        threads,
        *[ctypes.byref(p) for p in ptrs],
        ctypes.byref(n),
        ctypes.byref(contigs_p),
        err,
        512,
    )
    if rc != 0:
        raise RuntimeError(err.value.decode() or f"hh_bcf_parse_v2 failed ({rc})")
    nn = int(n.value)

    def arr(p, dtype, count):
        if count == 0:
            return np.zeros(0, dtype)
        ct = {
            np.int32: ctypes.c_int32,
            np.uint8: ctypes.c_uint8,
            np.int8: ctypes.c_int8,
        }[dtype]
        return np.ctypeslib.as_array(ctypes.cast(p, ctypes.POINTER(ct)), shape=(count,)).copy()

    out = {
        "rid": arr(ptrs[0], np.int32, nn),
        "start": arr(ptrs[1], np.int32, nn),
        "stop": arr(ptrs[2], np.int32, nn),
        "ref_char": arr(ptrs[3], np.uint8, nn),
        "alt_char": arr(ptrs[4], np.uint8, nn),
        "ref_len": arr(ptrs[5], np.int32, nn),
        "alt_len": arr(ptrs[6], np.int32, nn),
        "snp_flags": arr(ptrs[7], np.uint8, nn),
        "phase1": arr(ptrs[8], np.int8, nn * S).reshape(nn, S),
        "phase2": arr(ptrs[9], np.int8, nn * S).reshape(nn, S),
        "valid": arr(ptrs[10], np.uint8, nn * S).reshape(nn, S),
    }
    raw = ctypes.string_at(contigs_p)
    out["contigs"] = raw.decode().split("\n") if raw else []
    for p in ptrs:
        lib.hh_free(p)
    lib.hh_free(contigs_p)
    return out


class BgzfRangeReader:
    """Streaming BGZF reader: decode block ranges into numpy buffers with
    fused newline offsets — the host half of the pipelined tokenizer."""

    def __init__(self, path: str):
        lib = _load()
        assert lib is not None
        self._lib = lib
        total = ctypes.c_int64()
        nblocks = ctypes.c_int64()
        err = ctypes.create_string_buffer(512)
        self._h = lib.hh_bgzf_open(path.encode(), ctypes.byref(total), ctypes.byref(nblocks), err, 512)
        if not self._h:
            raise RuntimeError(err.value.decode() or "hh_bgzf_open failed")
        self.total_usize = int(total.value)
        self.n_blocks = int(nblocks.value)

    def uoffset(self, i: int) -> int:
        return int(self._lib.hh_bgzf_uoffset(self._h, i))

    def coffset(self, i: int) -> int:
        return int(self._lib.hh_bgzf_coffset(self._h, i))

    def block_at(self, coffset: int) -> int:
        """Block index whose compressed offset contains ``coffset``."""
        return int(self._lib.hh_bgzf_block_at(self._h, coffset))

    def decode_range(
        self, lo: int, hi: int, threads: int, out: np.ndarray, out_off: int = 0
    ) -> np.ndarray:
        """Decode blocks [lo, hi) into ``out[out_off:]``; returns newline
        offsets relative to the range start (int64)."""
        size = self.uoffset(hi) - self.uoffset(lo)
        assert out.shape[0] - out_off >= size
        nl_p = ctypes.c_void_p()
        n_nl = ctypes.c_int64()
        err = ctypes.create_string_buffer(512)
        dst = out[out_off:].ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.hh_bgzf_decode_range(
            self._h, lo, hi, threads, dst, ctypes.byref(nl_p), ctypes.byref(n_nl), err, 512
        )
        if rc != 0:
            raise RuntimeError(err.value.decode() or "hh_bgzf_decode_range failed")
        n = int(n_nl.value)
        if n:
            nl = np.ctypeslib.as_array(
                ctypes.cast(nl_p, ctypes.POINTER(ctypes.c_int64)), shape=(n,)
            ).copy()
        else:
            nl = np.zeros(0, np.int64)
        self._lib.hh_free(nl_p)
        return nl

    def close(self):
        if self._h:
            self._lib.hh_bgzf_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeFasta:
    def __init__(self, path: str):
        lib = _load()
        assert lib is not None
        self._lib = lib
        err = ctypes.create_string_buffer(512)
        self._h = lib.hh_fasta_open(path.encode(), err, 512)
        if not self._h:
            raise RuntimeError(err.value.decode() or "hh_fasta_open failed")

    def names(self) -> list[str]:
        n = self._lib.hh_fasta_nseq(self._h)
        buf = ctypes.create_string_buffer(1024)
        out = []
        for i in range(n):
            self._lib.hh_fasta_name(self._h, i, buf, 1024)
            out.append(buf.value.decode())
        return out

    def length(self, name: str) -> int:
        ln = self._lib.hh_fasta_length(self._h, name.encode())
        if ln < 0:
            raise KeyError(name)
        return int(ln)

    def fetch(self, name: str, start: int, end: int) -> bytes:
        size = max(0, end - start)
        out = ctypes.create_string_buffer(size)
        written = self._lib.hh_fasta_fetch(self._h, name.encode(), start, end, out)
        if written < 0:
            raise KeyError(name)
        return out.raw[: int(written)]

    def close(self):
        if self._h:
            self._lib.hh_fasta_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
