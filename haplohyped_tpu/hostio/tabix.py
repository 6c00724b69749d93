"""Tabix (.tbi) index: reader AND builder.

The reference's region queries require an externally-built tabix index
(htslib ``setRegion``, vcfpp.h:1424-1453) and fail without one.  Here:

- :class:`TabixIndex` reads ``.tbi`` files (standard format: BGZF-compressed
  binary with hierarchical bins + a 16 kb linear index of BGZF virtual
  offsets).
- :func:`build_index` creates a ``.tbi`` for any BGZF VCF — no external
  tooling needed.  Indexes we build are standard-conformant (bins via the
  canonical reg2bin scheme) so htslib can read them, and vice versa.
- :func:`region_virtual_offset` gives the seek point for a region query;
  the streaming readers start BGZF decoding at that block instead of the
  file start.

A BGZF *virtual offset* packs (compressed block offset << 16 | offset
within the decompressed block).
"""

from __future__ import annotations

import gzip
import os
import struct
from dataclasses import dataclass, field

TBI_MAGIC = b"TBI\x01"
CSI_MAGIC = b"CSI\x01"
LINEAR_SHIFT = 14  # 16 kb linear-index bins


def reg2bin_csi(beg: int, end: int, min_shift: int = 14, depth: int = 5) -> int:
    """Generalized CSI binning (reg2bin with configurable geometry)."""
    end -= 1
    # walk levels from deepest to root
    for level in range(depth, -1, -1):
        shift = min_shift + 3 * (depth - level)
        if beg >> shift == end >> shift:
            base = ((1 << (3 * level)) - 1) // 7
            return base + (beg >> shift)
    return 0


def reg2bin(beg: int, end: int) -> int:
    """Canonical UCSC binning: smallest bin fully containing [beg, end)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def reg2bins(beg: int, end: int) -> list[int]:
    """All bins overlapping [beg, end)."""
    bins = [0]
    end -= 1
    for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(base + (beg >> shift), base + (end >> shift) + 1))
    return bins


@dataclass
class RefIndex:
    bins: dict[int, list[tuple[int, int]]] = field(default_factory=dict)
    linear: list[int] = field(default_factory=list)


@dataclass
class TabixIndex:
    names: list[str]
    refs: list[RefIndex]
    col_seq: int = 1
    col_beg: int = 2
    col_end: int = 0
    meta_char: int = ord("#")

    @classmethod
    def load(cls, path: str) -> "TabixIndex":
        with gzip.open(path, "rb") as f:
            data = f.read()
        if data[:4] != TBI_MAGIC:
            raise ValueError(f"not a tabix index: {path}")
        off = 4
        (n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = struct.unpack_from(
            "<8i", data, off
        )
        off += 32
        names = data[off : off + l_nm].rstrip(b"\x00").split(b"\x00")
        names = [n.decode() for n in names if n]
        off += l_nm
        refs = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            ref = RefIndex()
            for _ in range(n_bin):
                bin_no, n_chunk = struct.unpack_from("<Ii", data, off)
                off += 8
                chunks = []
                for _ in range(n_chunk):
                    cb, ce = struct.unpack_from("<QQ", data, off)
                    off += 16
                    chunks.append((cb, ce))
                ref.bins[bin_no] = chunks
            (n_intv,) = struct.unpack_from("<i", data, off)
            off += 4
            ref.linear = list(struct.unpack_from(f"<{n_intv}Q", data, off))
            off += 8 * n_intv
            refs.append(ref)
        return cls(names=names, refs=refs, col_seq=col_seq, col_beg=col_beg,
                   col_end=col_end, meta_char=meta)

    def min_offset(self, chrom: str, beg: int) -> int | None:
        """Minimum virtual offset from which records overlapping positions
        >= ``beg`` (0-based) can start; None if chrom unknown/empty."""
        if chrom not in self.names:
            return None
        ref = self.refs[self.names.index(chrom)]
        if not ref.linear:
            return None
        i = min(beg >> LINEAR_SHIFT, len(ref.linear) - 1)
        return ref.linear[i]

    def query_chunks(self, chrom: str, beg: int, end: int) -> list[tuple[int, int]]:
        """Candidate (voffset_beg, voffset_end) chunks for [beg, end)."""
        if chrom not in self.names:
            return []
        ref = self.refs[self.names.index(chrom)]
        min_off = self.min_offset(chrom, beg) or 0
        out = []
        for b in reg2bins(beg, end):
            for cb, ce in ref.bins.get(b, []):
                if ce > min_off:
                    out.append((max(cb, min_off), ce))
        out.sort()
        return out


@dataclass
class CSIIndex:
    """CSI (``.csi``) index reader — the variable-geometry successor of
    ``.tbi`` (bcftools' default for long contigs).  Seek resolution uses
    each bin's ``loffset`` (virtual offset of its first overlapping
    record) in place of tabix's linear index."""

    names: list[str]
    min_shift: int
    depth: int
    #: per ref: {bin: (loffset, [(cb, ce), ...])}
    refs: list[dict[int, tuple[int, list[tuple[int, int]]]]]

    @classmethod
    def load(cls, path: str) -> "CSIIndex":
        with gzip.open(path, "rb") as f:
            data = f.read()
        if data[:4] != CSI_MAGIC:
            raise ValueError(f"not a CSI index: {path}")
        off = 4
        min_shift, depth, l_aux = struct.unpack_from("<3i", data, off)
        off += 12
        names: list[str] = []
        if l_aux >= 28:
            # tabix-mode aux: 7 i32 params + nul-joined names
            l_nm = struct.unpack_from("<i", data, off + 24)[0]
            raw_names = data[off + 28 : off + 28 + l_nm]
            names = [n.decode() for n in raw_names.split(b"\x00") if n]
        off += l_aux
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        refs = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            bins: dict[int, tuple[int, list[tuple[int, int]]]] = {}
            for _ in range(n_bin):
                bin_no, loffset, n_chunk = struct.unpack_from("<IQi", data, off)
                off += 16
                chunks = []
                for _ in range(n_chunk):
                    cb, ce = struct.unpack_from("<QQ", data, off)
                    off += 16
                    chunks.append((cb, ce))
                bins[bin_no] = (loffset, chunks)
            refs.append(bins)
        return cls(names=names, min_shift=min_shift, depth=depth, refs=refs)

    def min_offset(self, chrom: str, beg: int) -> int | None:
        if chrom not in self.names:
            return None
        bins = self.refs[self.names.index(chrom)]
        if not bins:
            return None
        # deepest bin containing [beg, beg+1), walking up to ancestors
        b = reg2bin_csi(beg, beg + 1, self.min_shift, self.depth)
        while True:
            if b in bins:
                return bins[b][0]
            if b == 0:
                break
            b = (b - 1) >> 3
        # fall back to the smallest loffset of any bin past beg
        offs = [v[0] for v in bins.values() if v[0] > 0]
        return min(offs) if offs else None


def write_csi(
    names: list[str],
    refs: list[RefIndex],
    out_path: str,
    min_shift: int = 14,
    depth: int = 5,
) -> str:
    """Serialize (tbi-geometry) bins as a standard ``.csi`` file."""
    payload = bytearray()
    payload += CSI_MAGIC
    nm = b"".join(n.encode() + b"\x00" for n in names)
    aux = struct.pack("<7i", 2, 1, 2, 0, ord("#"), 0, len(nm)) + nm
    payload += struct.pack("<3i", min_shift, depth, len(aux))
    payload += aux
    payload += struct.pack("<i", len(refs))
    for ref in refs:
        payload += struct.pack("<i", len(ref.bins))
        for bin_no in sorted(ref.bins):
            chunks = ref.bins[bin_no]
            loffset = min(cb for cb, _ in chunks)
            payload += struct.pack("<IQi", bin_no, loffset, len(chunks))
            for cb, ce in chunks:
                payload += struct.pack("<QQ", cb, ce)
    with gzip.open(out_path, "wb") as f:
        f.write(bytes(payload))
    return out_path


def build_index(bgzf_vcf: str, out_path: str | None = None, fmt: str = "tbi") -> str:
    """Build a standard ``.tbi`` (or ``.csi``) for a BGZF, position-sorted VCF."""
    from haplohyped_tpu.hostio import native

    if fmt not in ("tbi", "csi"):
        raise ValueError("fmt must be 'tbi' or 'csi'")
    out_path = out_path or bgzf_vcf + "." + fmt
    reader = native.BgzfRangeReader(bgzf_vcf)
    try:
        names: list[str] = []
        refs: list[RefIndex] = []
        cur: RefIndex | None = None

        # walk blocks sequentially, tracking virtual offsets per line
        n_blocks = reader.n_blocks
        carry = b""
        carry_voff = 0  # virtual offset of carry start
        import numpy as np

        # compressed block offsets come straight from the native scanner
        coffs = [reader.coffset(i) for i in range(n_blocks)]

        def flush_line(line: bytes, voff_start: int, voff_end: int):
            nonlocal cur
            if not line or line.startswith(b"#"):
                return
            f0 = line.split(b"\t", 2)
            chrom = f0[0].decode()
            pos0 = int(f0[1]) - 1
            if not names or names[-1] != chrom:
                if chrom in names:
                    raise ValueError("VCF not sorted by chromosome")
                names.append(chrom)
                cur = RefIndex()
                refs.append(cur)
            end0 = pos0 + 1
            b = reg2bin(pos0, end0)
            chunks = cur.bins.setdefault(b, [])
            if chunks and chunks[-1][1] == voff_start:
                chunks[-1] = (chunks[-1][0], voff_end)
            else:
                chunks.append((voff_start, voff_end))
            li = pos0 >> LINEAR_SHIFT
            while len(cur.linear) <= li:
                cur.linear.append(0)
            if cur.linear[li] == 0 or voff_start < cur.linear[li]:
                cur.linear[li] = voff_start

        buf = np.empty(1 << 16, dtype=np.uint8)
        for bi in range(n_blocks):
            size = reader.uoffset(bi + 1) - reader.uoffset(bi)
            if size == 0:
                continue
            if buf.shape[0] < size:
                buf = np.empty(size, dtype=np.uint8)
            reader.decode_range(bi, bi + 1, 1, buf)
            data = buf[:size].tobytes()
            upos = 0
            while True:
                nl = data.find(b"\n", upos)
                if nl < 0:
                    break
                voff_start = carry_voff if carry else ((coffs[bi] << 16) | upos)
                line = carry + data[upos:nl]
                carry = b""
                upos = nl + 1
                voff_end = (coffs[bi] << 16) | upos
                flush_line(line.rstrip(b"\r"), voff_start, voff_end)
            if upos < len(data):
                if not carry:
                    carry_voff = (coffs[bi] << 16) | upos
                carry += data[upos:]

        # fill linear-index gaps with the previous value (htslib convention)
        for ref in refs:
            last = 0
            for i, v in enumerate(ref.linear):
                if v == 0:
                    ref.linear[i] = last
                else:
                    last = v
    finally:
        reader.close()

    if fmt == "csi":
        return write_csi(names, refs, out_path)

    # serialize
    payload = bytearray()
    payload += TBI_MAGIC
    nm = b"".join(n.encode() + b"\x00" for n in names)
    payload += struct.pack("<8i", len(names), 2, 1, 2, 0, ord("#"), 0, len(nm))
    payload += nm
    for ref in refs:
        payload += struct.pack("<i", len(ref.bins))
        for bin_no in sorted(ref.bins):
            chunks = ref.bins[bin_no]
            payload += struct.pack("<Ii", bin_no, len(chunks))
            for cb, ce in chunks:
                payload += struct.pack("<QQ", cb, ce)
        payload += struct.pack("<i", len(ref.linear))
        payload += struct.pack(f"<{len(ref.linear)}Q", *ref.linear)

    with gzip.open(out_path, "wb") as f:
        f.write(bytes(payload))
    return out_path


def _span_from_chunks(chunks) -> tuple[int, int] | None:
    if not chunks:
        return None
    return min(cb for cb, _ in chunks), max(ce for _, ce in chunks)


def region_block_range(
    vcf_path: str, chrom: str, beg: int = -1, end: int = -1
) -> tuple[int, int] | None:
    """(voff_lo, voff_hi) virtual-offset span covering every record of
    ``chrom`` overlapping ``[beg, end)`` (0-based; -1 = unbounded), from a
    sibling ``.tbi`` or ``.csi``.  None when no usable index exists — the
    caller falls back to a full-scan frame.  The span is a superset (index
    chunks are bin-granular); record-level region filtering still applies.
    """
    tbi = vcf_path + ".tbi"
    if os.path.exists(tbi):
        try:
            idx = TabixIndex.load(tbi)
            if chrom not in idx.names:
                return None
            ref = idx.refs[idx.names.index(chrom)]
            if beg >= 0 and end >= 0:
                return _span_from_chunks(idx.query_chunks(chrom, beg, end))
            all_chunks = [c for cl in ref.bins.values() for c in cl]
            return _span_from_chunks(all_chunks)
        except Exception:
            pass
    csi = vcf_path + ".csi"
    if os.path.exists(csi):
        try:
            idx = CSIIndex.load(csi)
            if chrom not in idx.names:
                return None
            bins = idx.refs[idx.names.index(chrom)]
            all_chunks = [c for _, cl in bins.values() for c in cl]
            span = _span_from_chunks(all_chunks)
            if span is None:
                return None
            lo, hi = span
            if beg >= 0:
                mo = idx.min_offset(chrom, beg)
                if mo:
                    lo = max(lo, mo)
            return lo, hi
        except Exception:
            pass
    return None


def region_virtual_offset(vcf_path: str, chrom: str, beg: int = 0) -> int | None:
    """Seek voffset for a region query from a sibling ``.tbi`` or ``.csi``."""
    tbi = vcf_path + ".tbi"
    if os.path.exists(tbi):
        try:
            return TabixIndex.load(tbi).min_offset(chrom, beg)
        except Exception:
            pass
    csi = vcf_path + ".csi"
    if os.path.exists(csi):
        try:
            return CSIIndex.load(csi).min_offset(chrom, beg)
        except Exception:
            pass
    return None
