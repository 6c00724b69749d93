"""FASTA access: native shim with a pure-Python fallback.

Replaces the reference's pysam ``FastaFile`` usage (``fasta_encoder.py:86``).
Supports plain and gzipped FASTA; fetches return raw uppercase-preserving
bytes — encoding happens in the device kernels.
"""

from __future__ import annotations

import gzip

from haplohyped_tpu.hostio import native


class _PyFasta:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            head = f.read(2)
        if head == b"\x1f\x8b":
            with gzip.open(path, "rb") as f:
                data = f.read()
        else:
            with open(path, "rb") as f:
                data = f.read()
        self._seqs: dict[str, bytes] = {}
        self._order: list[str] = []
        name = None
        chunks: list[bytes] = []
        for line in data.split(b"\n"):
            line = line.rstrip(b"\r")
            if line.startswith(b">"):
                if name is not None:
                    self._seqs[name] = b"".join(chunks)
                name = line[1:].split(b" ")[0].split(b"\t")[0].decode()
                self._order.append(name)
                chunks = []
            elif line:
                chunks.append(line)
        if name is not None:
            self._seqs[name] = b"".join(chunks)

    def names(self) -> list[str]:
        return list(self._order)

    def length(self, name: str) -> int:
        return len(self._seqs[name])

    def fetch(self, name: str, start: int, end: int) -> bytes:
        seq = self._seqs[name]
        return seq[max(0, start) : min(len(seq), end)]

    def close(self):
        self._seqs = {}


class FastaReader:
    """Uniform FASTA interface: faidx seek-fetch when a ``.fai`` index
    sits next to an uncompressed file (O(range) fetches, samtools-
    compatible — build one with ``haplohyped faidx``), else the native
    shim / Python whole-file fallback."""

    def __init__(self, path: str, use_native: bool | None = None):
        import os

        self.path = path
        if os.path.exists(path + ".fai"):
            with open(path, "rb") as f:
                gz = f.read(2) == b"\x1f\x8b"
            if not gz and self._fai_fresh(path):
                from haplohyped_tpu.hostio.fai import FaidxFasta

                self._impl = FaidxFasta(path)
                return
        if use_native is None:
            use_native = native.native_available()
        if use_native and native.native_available():
            self._impl = native.NativeFasta(path)
        else:
            self._impl = _PyFasta(path)

    @staticmethod
    def _fai_fresh(path: str) -> bool:
        """Cheap staleness guard: a FASTA rewritten after indexing makes
        the seek math serve wrong bases with no error.  Verify the last
        record's computed end offset fits the file size (and that the
        index isn't older than the FASTA); on mismatch fall back to the
        whole-file reader with a warning."""
        import logging
        import os

        from haplohyped_tpu.hostio.fai import read_fai

        try:
            recs = read_fai(path + ".fai")
            if not recs:
                return False
            last = recs[next(reversed(recs))]
            full_lines, rem = divmod(last.length, max(last.linebases, 1))
            # minimal bytes the record's bases need (the final line may
            # legitimately lack its trailing newline)
            if rem:
                end = last.offset + full_lines * last.linewidth + rem
            elif full_lines:
                end = last.offset + (full_lines - 1) * last.linewidth + last.linebases
            else:
                end = last.offset
            fsize = os.path.getsize(path)
            fresh = end <= fsize and os.path.getmtime(path + ".fai") >= os.path.getmtime(path)
            if not fresh:
                logging.getLogger(__name__).warning(
                    ".fai index for %s is stale (indexed end %d vs file "
                    "size %d, or older mtime); using the whole-file reader",
                    path, end, fsize,
                )
            return fresh
        except Exception:
            return False

    def names(self) -> list[str]:
        return self._impl.names()

    def length(self, name: str) -> int:
        return self._impl.length(name)

    def fetch(self, name: str, start: int | None = None, end: int | None = None) -> bytes:
        if start is None:
            start = 0
        if end is None:
            end = self.length(name)
        return self._impl.fetch(name, start, end)

    def close(self):
        self._impl.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
