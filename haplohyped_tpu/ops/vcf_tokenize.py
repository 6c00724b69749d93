"""Full on-device VCF tokenization.

The north-star decode path: the host only decompresses the VCF and indexes
newlines (``hostio.native.vcf_text``); the accelerator does *everything
else* — tab scanning, field segmentation, integer parsing, SNP predicate and
genotype decode — as dense vector ops over a ``(N, W)`` window gathered from
the raw text.  No per-record host work at all (the 64-byte framed-record
path in :mod:`haplohyped_tpu.ops.vcf_decode` remains as the general fallback
for lines longer than the window, e.g. very wide cohorts).

Field segmentation trick: ``fieldid[c] = (#tabs at or before c) - is_tab[c]``
gives every byte its 0-based VCF column; a field's bytes are then just a
mask, its start an argmax, its length a row-sum — all VPU-friendly
reductions over the window axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


_POW10 = np.array([10**i if i < 10 else 0 for i in range(16)], dtype=np.uint32)

TAB = 9


@functools.partial(
    jax.jit, static_argnames=("W", "sample_col", "with_sample")
)
def tokenize_lines(
    text: jax.Array,  # (T,) uint8 raw VCF text (device)
    offsets: jax.Array,  # (N,) int32 data-line starts
    lengths: jax.Array,  # (N,) int32 data-line lengths (no newline)
    *,
    W: int,  # static window (power of two >= max line length)
    sample_col: int = -1,  # which sample column to decode GT from (-1 = none)
    with_sample: bool = True,
) -> dict[str, jax.Array]:
    """Tokenize + decode N data lines entirely on device.

    Returns the decode-column dict (same keys as
    :func:`haplohyped_tpu.ops.vcf_decode.decode_frames_numpy`) plus
    ``chrom`` (N, 8) uint8, ``chrom_len`` and ``long_line``.
    """
    # Lane-aligned window fetch: arbitrary byte gathers are pathologically
    # slow on TPU, but gathering whole W-byte aligned rows is near-bandwidth.
    # Fetch the two rows covering each line and mask from the in-row shift —
    # all downstream logic is mask-based, so no realignment is needed.
    T = text.shape[0]
    n_rows = T // W  # caller pads text length to a multiple of W
    text2d = text[: n_rows * W].reshape(n_rows, W)
    r0 = jnp.clip(offsets // W, 0, n_rows - 1)
    r1 = jnp.clip(r0 + 1, 0, n_rows - 1)
    win = jnp.concatenate([text2d[r0], text2d[r1]], axis=1)  # (N, 2W)
    shift = offsets - r0 * W
    col = jnp.arange(2 * W, dtype=jnp.int32)
    valid = (col[None, :] >= shift[:, None]) & (
        col[None, :] < shift[:, None] + lengths[:, None]
    )
    long_line = lengths > W

    is_tab = (win == TAB) & valid
    tabid = jnp.cumsum(is_tab, axis=1, dtype=jnp.int32)
    fieldid = tabid - is_tab.astype(jnp.int32)
    content = valid & ~is_tab

    def fmask(k: int):
        return content & (fieldid == k)

    def fstart(mask):
        return jnp.argmax(mask, axis=1).astype(jnp.int32)

    def flen(mask):
        return jnp.sum(mask, axis=1, dtype=jnp.int32)

    def char_at(pos, delta=0):
        p = jnp.clip(pos + delta, 0, 2 * W - 1)
        return jnp.take_along_axis(win, p[:, None], axis=1)[:, 0]

    n_fields = jnp.max(jnp.where(valid, fieldid, 0), axis=1) + 1

    # --- CHROM (field 0, starts at the line's in-window shift) --------
    m0 = fmask(0)
    chrom_len = jnp.minimum(flen(m0), 8)
    cidx = jnp.clip(shift[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :], 0, 2 * W - 1)
    chrom_raw = jnp.take_along_axis(win, cidx, axis=1)
    chrom = jnp.where(
        jnp.arange(8, dtype=jnp.int32)[None, :] < chrom_len[:, None],
        chrom_raw,
        jnp.uint8(0),
    )

    # --- POS (field 1) ------------------------------------------------
    m1 = fmask(1)
    digit = (win.astype(jnp.uint32) - ord("0")) & 0xFF
    # digits of field 1 strictly after each column
    suffix = jnp.cumsum(m1[:, ::-1], axis=1, dtype=jnp.int32)[:, ::-1] - m1
    w10 = jnp.asarray(_POW10)[jnp.clip(suffix, 0, 15)]
    pos = jnp.sum(
        jnp.where(m1, digit * w10, 0), axis=1, dtype=jnp.uint32
    )
    start = pos - 1

    # --- REF / ALT ----------------------------------------------------
    m3, m4 = fmask(3), fmask(4)
    ref_len = flen(m3).astype(jnp.uint32)
    alt_len = flen(m4).astype(jnp.uint32)
    ref_char = char_at(fstart(m3))
    alt_char = char_at(fstart(m4))
    stop = start + ref_len
    # gather-free base codes (TPU lowers LUT gathers ~100x below selects)
    from haplohyped_tpu.ops.onehot import ascii_to_codes

    ref_code = ascii_to_codes(ref_char)
    alt_code = ascii_to_codes(alt_char)
    is_acgt = (
        (alt_char == ord("A"))
        | (alt_char == ord("C"))
        | (alt_char == ord("G"))
        | (alt_char == ord("T"))
    )
    snp_mask = (ref_len == 1) & (alt_len == 1) & is_acgt

    well_formed = (n_fields >= 8) & ~long_line

    # --- genotype (FORMAT field 8, sample field 9+sample_col) ---------
    if with_sample and sample_col >= 0:
        m8 = fmask(8)
        f8s = fstart(m8)
        f8len = flen(m8)
        gt_first = (
            (char_at(f8s) == ord("G"))
            & (char_at(f8s, 1) == ord("T"))
            & ((f8len == 2) | (char_at(f8s, 2) == ord(":")))
        )
        mk = fmask(9 + sample_col)
        has_field = jnp.any(mk, axis=1)
        gs = fstart(mk)
        g0 = char_at(gs)
        g1 = char_at(gs, 1)
        g2 = char_at(gs, 2)
        sep_ok = (g1 == ord("|")) | (g1 == ord("/"))
        diploid = has_field & gt_first & sep_ok & (flen(mk) >= 3)
        dot = jnp.uint8(ord("."))
        missing = diploid & ((g0 == dot) | (g2 == dot))
        zero = jnp.uint8(ord("0"))
        phase1 = jnp.where(missing, jnp.int8(1), (g0 != zero).astype(jnp.int8))
        phase2 = jnp.where(missing, jnp.int8(0), (g2 != zero).astype(jnp.int8))
        phased = diploid & (g1 == ord("|"))
        valid_rec = well_formed & diploid
    else:
        N = offsets.shape[0]
        phase1 = jnp.zeros((N,), jnp.int8)
        phase2 = jnp.zeros((N,), jnp.int8)
        phased = jnp.zeros((N,), bool)
        missing = jnp.zeros((N,), bool)
        valid_rec = well_formed

    return {
        "start": start,
        "stop": stop,
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": ref_code,
        "alt_code": alt_code,
        "phase1": phase1,
        "phase2": phase2,
        "phased": phased,
        "missing": missing,
        "snp_mask": snp_mask,
        "valid": valid_rec,
        "chrom": chrom,
        "chrom_len": chrom_len,
        "long_line": long_line,
    }


def choose_window(max_line_len: int, cap: int = 4096) -> int:
    """Smallest power-of-two window covering the longest line (<= cap)."""
    w = 128
    while w < max_line_len and w < cap:
        w *= 2
    return w


def tokenize_vcf_device(
    vcf_text_obj,
    sample: str | None,
    chunk_lines: int | None = None,
    window_cap: int = 4096,
):
    """Host driver: ship text + offsets to device, tokenize in chunks.

    ``vcf_text_obj`` is :class:`haplohyped_tpu.hostio.native.VCFText`.
    Returns a host dict of decode columns (concatenated over chunks).
    Lines longer than the window cap are flagged in ``long_line`` (callers
    route those through the framed-record fallback).
    """
    sample_col = -1
    if sample:
        try:
            sample_col = vcf_text_obj.samples.index(sample)
        except ValueError:
            raise RuntimeError(f"sample not found in VCF header: {sample}")

    n = vcf_text_obj.n_lines
    if n == 0:
        from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

        out = decode_frames_numpy(np.zeros((0, 64), np.uint8))
        out["chrom"] = np.zeros((0, 8), np.uint8)
        out["chrom_len"] = np.zeros((0,), np.int32)
        out["long_line"] = np.zeros((0,), bool)
        return out

    max_len = int(vcf_text_obj.line_lengths.max())
    W = choose_window(max_len, cap=window_cap)
    if int(vcf_text_obj.line_offsets[-1]) + max_len >= 2**31 - 2 * W:
        # device offsets are int32; >2GiB decompressed text must go through
        # the chunked streaming path (chunk-relative offsets stay small)
        raise ValueError(
            "decompressed VCF exceeds the int32 offset range; use "
            "haplohyped_tpu.ops.vcf_stream.tokenize_vcf_streaming"
        )
    if chunk_lines is None:
        # bound device working set: the (chunk, 2W) window plus int32
        # intermediates cost ~20*2W bytes/line; floor keeps tiny chunks
        # from dominating on short-line files
        chunk_lines = max(1 << 14, (1 << 31) // (20 * W))

    # pad text to a row-multiple (+ one slack row) for the aligned fetch
    T = vcf_text_obj.text.shape[0]
    pad_to = (-(-T // W) + 1) * W
    text_padded = np.zeros(pad_to, dtype=np.uint8)
    text_padded[:T] = vcf_text_obj.text
    text_dev = jnp.asarray(text_padded)
    chunks = []
    for lo in range(0, n, chunk_lines):
        hi = min(lo + chunk_lines, n)
        offs = jnp.asarray(vcf_text_obj.line_offsets[lo:hi].astype(np.int32))
        lens = jnp.asarray(vcf_text_obj.line_lengths[lo:hi])
        dec = tokenize_lines(
            text_dev,
            offs,
            lens,
            W=W,
            sample_col=sample_col,
            with_sample=sample is not None,
        )
        chunks.append(jax.device_get(dec))
    if len(chunks) == 1:
        return {k: np.asarray(v) for k, v in chunks[0].items()}
    return {
        k: np.concatenate([np.asarray(c[k]) for c in chunks]) for k in chunks[0]
    }
