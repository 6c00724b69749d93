"""Pipelined streaming tokenizer: host decompress overlaps device compute.

The double-buffered production path for large BGZF cohort VCFs: the host
decodes a bounded chunk of BGZF blocks (threaded, newline scan fused) while
the accelerator is still tokenizing the previous chunk (dispatch is async),
so end-to-end throughput approaches max(host decompress, device tokenize)
instead of their sum — and memory stays bounded by the chunk size instead of
the whole decompressed file.

Falls back to the whole-file path (:func:`tokenize_vcf_device`) for non-BGZF
inputs.
"""

from __future__ import annotations

import numpy as np

from haplohyped_tpu.hostio import native
from haplohyped_tpu.ops.vcf_tokenize import choose_window, tokenize_lines


def _parse_header_bytes(text: np.ndarray) -> tuple[int, list[str]]:
    """Find data_start + sample names from the first chunk's bytes.

    Raises if the header (or its final line) is truncated at the buffer end
    so callers retry with a larger prefix — a #CHROM line cut mid-way must
    not yield a partial sample list.
    """
    samples: list[str] = []
    found_chrom = False
    n = text.shape[0]
    buf = text.tobytes()
    off = 0
    while off < n and buf[off : off + 1] == b"#":
        nl = buf.find(b"\n", off)
        if nl < 0:
            raise RuntimeError("VCF header truncated at buffer end")
        line = buf[off:nl].rstrip(b"\r")
        if line.startswith(b"#CHROM"):
            found_chrom = True
            samples = [f.decode() for f in line.split(b"\t")[9:]]
        off = nl + 1
    if not found_chrom:
        raise RuntimeError("VCF has no #CHROM header line in first chunk")
    return off, samples


def _lines_from_newlines(
    text: np.ndarray, nl: np.ndarray, start_from: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """(line_starts, line_lengths, consumed_end) for complete lines only."""
    if nl.shape[0] == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int32), start_from
    starts = np.empty_like(nl)
    starts[0] = 0
    starts[1:] = nl[:-1] + 1
    lens = (nl - starts).astype(np.int32)
    # strip \r
    has_cr = lens > 0
    last = np.minimum(starts + lens - 1, text.shape[0] - 1)
    cr = has_cr & (text[last] == 13)
    lens = lens - cr.astype(np.int32)
    first_byte = text[np.minimum(starts, text.shape[0] - 1)]
    keep = (starts >= start_from) & (lens > 0) & (first_byte != ord("#"))
    consumed = int(nl[-1]) + 1
    return starts[keep], lens[keep], consumed


def _read_header_streaming(reader, threads: int) -> tuple[int, list[str]]:
    """Decode leading blocks until the #CHROM line is found."""
    nb = reader.n_blocks
    hi = 1
    while True:
        size = reader.uoffset(hi)
        buf = np.empty(size, np.uint8)
        reader.decode_range(0, hi, threads, buf)
        try:
            return _parse_header_bytes(buf)
        except RuntimeError:
            if hi >= nb:
                raise
            hi = min(hi * 4, nb)


def tokenize_vcf_streaming(
    path: str,
    sample: str | None,
    threads: int = 2,
    chunk_bytes: int = 48 << 20,
    window_cap: int = 4096,
    region: tuple[str, int, int] | None = None,
) -> dict[str, np.ndarray]:
    """Tokenize a BGZF VCF with the pipelined chunk path.

    ``region=(chrom, beg0, end0)`` (0-based half-open; -1 for unbounded)
    uses a sibling ``.tbi`` index (see :mod:`haplohyped_tpu.hostio.tabix`)
    to seek straight to the first relevant BGZF block and stops early once
    records pass the region end.  Position/chromosome filtering itself is
    left to the caller's masks (``snp_struct_from_decoded``).

    Returns host decode columns (same schema as ``tokenize_vcf_device``).
    """
    import jax
    import jax.numpy as jnp

    reader = native.BgzfRangeReader(path)
    try:
        start_block, skip_bytes = 0, 0
        stop_after = None  # 0-based position after which decoding can stop
        if region is not None:
            from haplohyped_tpu.hostio.tabix import region_virtual_offset

            chrom_r, beg_r, end_r = region
            voff = region_virtual_offset(path, chrom_r, max(beg_r, 0))
            if voff:
                start_block = reader.block_at(voff >> 16)
                skip_bytes = voff & 0xFFFF
            if end_r is not None and end_r >= 0:
                stop_after = end_r

        # pick block ranges of ~chunk_bytes decompressed size
        ranges: list[tuple[int, int]] = []
        lo = start_block
        nb = reader.n_blocks
        while lo < nb:
            hi = lo + 1
            base = reader.uoffset(lo)
            while hi < nb and reader.uoffset(hi) - base < chunk_bytes:
                hi += 1
            ranges.append((lo, hi))
            lo = hi

        sample_col = -1
        if sample and start_block > 0:
            # seeked past the header: parse it separately
            _, samples = _read_header_streaming(reader, threads)
            if sample not in samples:
                raise RuntimeError(f"sample not found in VCF header: {sample}")
            sample_col = samples.index(sample)

        data_start = 0 if start_block > 0 else None
        carry = np.zeros(0, np.uint8)
        device_outs = []
        pending_W = None

        for ri, (blo, bhi) in enumerate(ranges):
            size = reader.uoffset(bhi) - reader.uoffset(blo)
            buf = np.empty(carry.shape[0] + size, dtype=np.uint8)
            if carry.shape[0]:
                buf[: carry.shape[0]] = carry
            nl = reader.decode_range(blo, bhi, threads, buf, out_off=carry.shape[0])
            nl = nl + carry.shape[0]
            if ri == 0 and skip_bytes:
                # tabix voffset points at a record start inside the block
                buf = buf[skip_bytes:]
                nl = nl[np.searchsorted(nl, skip_bytes) :] - skip_bytes

            if data_start is None:
                data_start, samples = _parse_header_bytes(buf)
                if sample:
                    if sample not in samples:
                        raise RuntimeError(f"sample not found in VCF header: {sample}")
                    sample_col = samples.index(sample)

            is_last = ri == len(ranges) - 1
            if buf.shape[0] == 0:
                continue
            if is_last and (nl.shape[0] == 0 or nl[-1] != buf.shape[0] - 1):
                # treat trailing bytes as a final line
                nl = np.concatenate([nl, np.asarray([buf.shape[0]], np.int64)])

            starts, lens, consumed = _lines_from_newlines(buf, nl, data_start)
            carry = buf[consumed:].copy() if not is_last else np.zeros(0, np.uint8)
            data_start = 0 if data_start is not None else None  # only first chunk

            if starts.shape[0] == 0:
                continue

            if stop_after is not None:
                # early stop: records are position-sorted, so once the
                # chunk's first record starts past the region end, stop
                s0 = int(starts[0])
                first_line = bytes(buf[s0 : s0 + int(lens[0])])
                try:
                    pos0 = int(first_line.split(b"\t", 2)[1]) - 1
                    if pos0 > stop_after:
                        break
                except (IndexError, ValueError):
                    pass
            # per-chunk W: heterogeneous line lengths recompile at most
            # log2(cap/128) times (W is a power of two); sticky max keeps
            # later chunks on the widest-seen executable
            W = choose_window(int(lens.max()), cap=window_cap)
            pending_W = W if pending_W is None else max(pending_W, W)
            W = pending_W

            # Pad text and line-count to fixed buckets so every chunk reuses
            # one compiled executable (distinct shapes would recompile the
            # tokenizer per chunk and dwarf the decode time).
            TEXT_BUCKET = 8 << 20
            # +1 bucket of slack guarantees the aligned row fetch's r0+1 row
            # exists for lines ending at the buffer edge
            text_pad = (-(-consumed // TEXT_BUCKET) + (consumed % TEXT_BUCKET == 0)) * TEXT_BUCKET
            tb = np.zeros(text_pad, np.uint8)
            tb[:consumed] = buf[:consumed]
            # scale the line bucket inversely with the window so wide-cohort
            # chunks don't pad to 20x their real row count
            N_BUCKET = max(1 << 12, (1 << 18) // max(1, W // 128))
            n_i = starts.shape[0]
            n_pad = -(-n_i // N_BUCKET) * N_BUCKET
            so = np.zeros(n_pad, np.int32)
            so[:n_i] = starts.astype(np.int32)
            sl = np.zeros(n_pad, np.int32)
            sl[:n_i] = lens

            out = tokenize_lines(
                jnp.asarray(tb),
                jnp.asarray(so),
                jnp.asarray(sl),
                W=W,
                sample_col=sample_col,
                with_sample=sample is not None,
            )
            device_outs.append((out, n_i))

        if not device_outs:
            from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

            out = decode_frames_numpy(np.zeros((0, 64), np.uint8))
            out["chrom"] = np.zeros((0, 8), np.uint8)
            out["chrom_len"] = np.zeros((0,), np.int32)
            out["long_line"] = np.zeros((0,), bool)
            return out

        host_outs = [
            ({k: np.asarray(v)[:n_i] for k, v in jax.device_get(o).items()})
            for o, n_i in device_outs
        ]
        if len(host_outs) == 1:
            return host_outs[0]
        return {
            k: np.concatenate([c[k] for c in host_outs]) for k in host_outs[0]
        }
    finally:
        reader.close()
