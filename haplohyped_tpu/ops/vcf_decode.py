"""Device-side VCF record decoding.

The semantic half of the reference's native parser, as pure vector ops over
the framed ``(N, 64)`` uint8 record buffers produced by hostio:

- POS ASCII digits -> integer, 0-based ``start`` / ``stop = start + rlen``
  (reference coordinate semantics: ``vcfpp.h:1118-1127`` — ``Start()`` is
  ``line->pos``, ``End()`` is ``pos + rlen``).
- biallelic-SNP predicate (``vcfpp.h:990-1000``: REF length 1, exactly one
  ALT allele, ALT ∈ {A,C,G,T}; lowercase/multichar/``.``/``*`` all fail).
- genotype decode with allele-presence semantics (``vcfpp.h:508-531``):
  haplotype value is 1 iff the allele index is non-zero; a missing genotype
  ("./." etc.) is coded as (1, 0) with a missing flag; the phase bit is the
  ``|`` separator.

Everything is shape-static and jit-compiled; record validity is a mask, not
control flow.  The hot path is pure VPU work (uint8 compares + small integer
dot for the digit parse), bottlenecked by HBM bandwidth at ~64 B/record.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from haplohyped_tpu.core.constants import BASE_LUT
from haplohyped_tpu.ops.onehot import ascii_to_codes
from haplohyped_tpu.hostio.frame_format import (
    ALT_LEN_OFF,
    ALT_OFF,
    FLAG_HAS_GT,
    FLAG_WELL_FORMED,
    FLAGS_OFF,
    GT_LEN_OFF,
    GT_OFF,
    FLAG12_DIPLOID_LEN,
    FLAG12_HAS_GT,
    FLAG12_SEP_PIPE,
    FLAG12_SEP_SLASH,
    FLAG12_WELL_FORMED,
    GT_NIBBLE_MISSING,
    POS_CAP,
    POS_LEN_OFF,
    POS_OFF,
    R12_ALT_LEN_OFF,
    R12_ALT_OFF,
    R12_CHROM_ID_OFF,
    R12_FLAGS_OFF,
    R12_GT_OFF,
    R12_POS_BYTES,
    R12_POS_NIBBLES,
    R12_POS_OFF,
    R12_REF_LEN_OFF,
    R12_REF_OFF,
    REF_LEN_OFF,
    REF_OFF,
)

# weights for digit positions; entries beyond 10^9 would overflow uint32 and
# can only arise for out-of-spec >10-digit positions (VCF POS is int32) — zeroed
_POW10 = np.array(
    [10**i if i < 10 else 0 for i in range(POS_CAP)], dtype=np.uint32
)


class DecodedVariants(NamedTuple):
    """Struct-of-arrays decode output; all arrays have leading dim N."""

    start: jax.Array  # uint32, 0-based
    stop: jax.Array  # uint32, start + rlen
    ref_char: jax.Array  # uint8 first REF byte (ASCII)
    alt_char: jax.Array  # uint8 first ALT byte (ASCII)
    ref_code: jax.Array  # int8 base code of REF (N for non-ACGT)
    alt_code: jax.Array  # int8 base code of ALT
    phase1: jax.Array  # int8 allele presence, haplotype 1
    phase2: jax.Array  # int8 allele presence, haplotype 2
    phased: jax.Array  # bool, GT separator was '|'
    missing: jax.Array  # bool, genotype was missing
    snp_mask: jax.Array  # bool, biallelic SNP predicate
    valid: jax.Array  # bool, well-formed (+ diploid GT when requested)


@functools.partial(jax.jit, static_argnames=("with_sample",))
def decode_frames(frames: jax.Array, with_sample: bool = True) -> DecodedVariants:
    """Decode an ``(N, 64)`` uint8 frame matrix into variant columns."""
    frames = frames.astype(jnp.uint8)

    # --- POS digits -> uint32 -----------------------------------------
    digits = frames[:, POS_OFF : POS_OFF + POS_CAP].astype(jnp.uint32) - ord("0")
    pos_len = frames[:, POS_LEN_OFF].astype(jnp.int32)
    # weight for digit slot i is 10^(pos_len-1-i), zero outside [0, pos_len)
    exp = pos_len[:, None] - 1 - jnp.arange(POS_CAP, dtype=jnp.int32)[None, :]
    weights = jnp.where(
        exp >= 0, jnp.asarray(_POW10)[jnp.clip(exp, 0, POS_CAP - 1)], 0
    ).astype(jnp.uint32)
    pos = jnp.sum(digits * weights, axis=1, dtype=jnp.uint32)
    start = pos - 1  # VCF POS is 1-based; Start() is 0-based

    # --- REF / ALT ----------------------------------------------------
    ref_len = frames[:, REF_LEN_OFF].astype(jnp.uint32)
    alt_len = frames[:, ALT_LEN_OFF].astype(jnp.uint32)
    stop = start + ref_len  # End() = pos + rlen
    ref_char = frames[:, REF_OFF]
    alt_char = frames[:, ALT_OFF]
    # gather-free base codes (TPU lowers LUT gathers ~100x below selects)
    ref_code = ascii_to_codes(ref_char)
    alt_code = ascii_to_codes(alt_char)

    is_acgt = (
        (alt_char == ord("A"))
        | (alt_char == ord("C"))
        | (alt_char == ord("G"))
        | (alt_char == ord("T"))
    )
    snp_mask = (ref_len == 1) & (alt_len == 1) & is_acgt

    flags = frames[:, FLAGS_OFF]
    well_formed = (flags & FLAG_WELL_FORMED) != 0

    # --- genotype -----------------------------------------------------
    if with_sample:
        g0 = frames[:, GT_OFF]
        g1 = frames[:, GT_OFF + 1]
        g2 = frames[:, GT_OFF + 2]
        gt_len = frames[:, GT_LEN_OFF].astype(jnp.int32)
        has_gt = (flags & FLAG_HAS_GT) != 0
        sep_ok = (g1 == ord("|")) | (g1 == ord("/"))
        diploid = has_gt & (gt_len >= 3) & sep_ok
        dot = jnp.uint8(ord("."))
        missing = diploid & ((g0 == dot) | (g2 == dot))
        zero = jnp.uint8(ord("0"))
        a1 = (g0 != zero).astype(jnp.int8)
        a2 = (g2 != zero).astype(jnp.int8)
        phase1 = jnp.where(missing, jnp.int8(1), a1)
        phase2 = jnp.where(missing, jnp.int8(0), a2)
        phased = diploid & (g1 == ord("|"))
        valid = well_formed & diploid
    else:
        n = frames.shape[0]
        phase1 = jnp.zeros((n,), jnp.int8)
        phase2 = jnp.zeros((n,), jnp.int8)
        phased = jnp.zeros((n,), bool)
        missing = jnp.zeros((n,), bool)
        valid = well_formed

    return DecodedVariants(
        start=start,
        stop=stop,
        ref_char=ref_char,
        alt_char=alt_char,
        ref_code=ref_code,
        alt_code=alt_code,
        phase1=phase1,
        phase2=phase2,
        phased=phased,
        missing=missing,
        snp_mask=snp_mask,
        valid=valid,
    )


@functools.partial(jax.jit, static_argnames=("with_sample",))
def decode_frames12(frames: jax.Array, with_sample: bool = True) -> dict[str, jax.Array]:
    """Decode an ``(N, 12)`` compact frame matrix (pack_rec12 layout).

    Same semantics as :func:`decode_frames`, returned as a dict with the
    extra ``chrom_id`` column (index into the framer's chrom table).  The
    compact layout ships 5.3x fewer bytes over the host->device link per
    record — the preferred path for the SNP pipeline.  The POS integer
    parse (BCD nibbles -> uint32 dot product), SNP predicate, and genotype
    presence/missing/phase decode all run here on the accelerator.
    """
    frames = frames.astype(jnp.uint8)

    # --- POS: 10 zero-padded BCD nibbles -> uint32 ---------------------
    pos_bytes = frames[:, R12_POS_OFF : R12_POS_OFF + R12_POS_BYTES]
    nib = jnp.stack([pos_bytes >> 4, pos_bytes & 0xF], axis=2).reshape(
        frames.shape[0], R12_POS_NIBBLES
    )
    w = jnp.asarray(_POW10[:R12_POS_NIBBLES][::-1].copy())  # 10^9 ... 10^0
    pos = jnp.sum(nib.astype(jnp.uint32) * w[None, :], axis=1, dtype=jnp.uint32)
    start = pos - 1

    ref_len = frames[:, R12_REF_LEN_OFF].astype(jnp.uint32)
    alt_len = frames[:, R12_ALT_LEN_OFF].astype(jnp.uint32)
    stop = start + ref_len
    ref_char = frames[:, R12_REF_OFF]
    alt_char = frames[:, R12_ALT_OFF]
    is_acgt = (
        (alt_char == ord("A"))
        | (alt_char == ord("C"))
        | (alt_char == ord("G"))
        | (alt_char == ord("T"))
    )
    snp_mask = (ref_len == 1) & (alt_len == 1) & is_acgt

    flags = frames[:, R12_FLAGS_OFF]
    well_formed = (flags & FLAG12_WELL_FORMED) != 0

    if with_sample:
        gt = frames[:, R12_GT_OFF]
        g0n = gt >> 4
        g2n = gt & 0xF
        has_gt = (flags & FLAG12_HAS_GT) != 0
        sep_ok = (flags & (FLAG12_SEP_PIPE | FLAG12_SEP_SLASH)) != 0
        diploid = has_gt & ((flags & FLAG12_DIPLOID_LEN) != 0) & sep_ok
        miss_n = jnp.uint8(GT_NIBBLE_MISSING)
        missing = diploid & ((g0n == miss_n) | (g2n == miss_n))
        phase1 = jnp.where(missing, jnp.int8(1), (g0n != 0).astype(jnp.int8))
        phase2 = jnp.where(missing, jnp.int8(0), (g2n != 0).astype(jnp.int8))
        phased = diploid & ((flags & FLAG12_SEP_PIPE) != 0)
        valid = well_formed & diploid
    else:
        n = frames.shape[0]
        phase1 = jnp.zeros((n,), jnp.int8)
        phase2 = jnp.zeros((n,), jnp.int8)
        phased = jnp.zeros((n,), bool)
        missing = jnp.zeros((n,), bool)
        valid = well_formed

    return {
        "start": start,
        "stop": stop,
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": ascii_to_codes(ref_char),
        "alt_code": ascii_to_codes(alt_char),
        "phase1": phase1,
        "phase2": phase2,
        "phased": phased,
        "missing": missing,
        "snp_mask": snp_mask,
        "valid": valid,
        "chrom_id": frames[:, R12_CHROM_ID_OFF],
    }


@functools.partial(jax.jit, static_argnames=("with_sample",))
def decode_frames12_packed(
    frames: jax.Array, with_sample: bool = True
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`decode_frames12` with the output PACKED into the Pallas
    kernel's 3-int32-per-record wire format (``start``, ``meta``,
    ``ref_len``; ``meta = ref_char | alt_char<<8 | chrom_id<<16 |
    flags<<24``) — 12 B/record on the d2h leg instead of the dict's ~19.

    This became the TPU production decode when the gather-free base-code
    fix landed: the XLA lowering decodes 16M records in ~11 ms
    device-resident (45 GB/s, vs the Mosaic kernel's 152 ms — see the
    committed ``device_roofline``), and packing here is free elementwise
    fusion, so it beats the Pallas kernel on BOTH legs.  Unpack with
    :func:`unpack12_columns`.
    """
    d = decode_frames12(frames, with_sample)
    flags = (
        d["snp_mask"].astype(jnp.int32)
        | (d["valid"].astype(jnp.int32) << 1)
        | (d["missing"].astype(jnp.int32) << 2)
        | (d["phased"].astype(jnp.int32) << 3)
        | ((d["phase1"].astype(jnp.int32) & 1) << 4)
        | ((d["phase2"].astype(jnp.int32) & 1) << 5)
    )
    meta = (
        d["ref_char"].astype(jnp.int32)
        | (d["alt_char"].astype(jnp.int32) << 8)
        | (d["chrom_id"].astype(jnp.int32) << 16)
        | (flags << 24)
    )
    ref_len = (d["stop"] - d["start"]).astype(jnp.int32)
    return d["start"].astype(jnp.int32), meta, ref_len


def unpack12_columns(
    start: np.ndarray, meta: np.ndarray, ref_len: np.ndarray
) -> dict[str, np.ndarray]:
    """Host-side unpack of the packed 3-int32 decode wire format (shared
    by the Pallas kernel and :func:`decode_frames12_packed`)."""
    ref_char = (meta & 0xFF).astype(np.uint8)
    alt_char = ((meta >> 8) & 0xFF).astype(np.uint8)
    chrom_id = ((meta >> 16) & 0xFF).astype(np.uint8)
    flags = (meta >> 24) & 0xFF
    return {
        "start": start.astype(np.uint32),
        "stop": (start + ref_len).astype(np.uint32),
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": BASE_LUT[ref_char],
        "alt_code": BASE_LUT[alt_char],
        "phase1": ((flags >> 4) & 1).astype(np.int8),
        "phase2": ((flags >> 5) & 1).astype(np.int8),
        "phased": (flags & 8) != 0,
        "missing": (flags & 4) != 0,
        "snp_mask": (flags & 1) != 0,
        "valid": (flags & 2) != 0,
        "chrom_id": chrom_id,
    }


@functools.partial(jax.jit, static_argnames=("with_sample",))
def decode_planes12(
    planes: jax.Array, with_sample: bool = True
) -> dict[str, jax.Array]:
    """:func:`decode_frames12` on the TRANSPOSED wire layout: ``(12, N)``
    uint8 byte PLANES (plane ``k`` = byte ``k`` of every record) instead
    of ``(N, 12)`` rows.

    Same semantics, radically better tiling: an ``(N, 12)`` uint8 matrix
    parks 12 useful lanes in every 128-lane VREG tile (~10.7x read
    amplification, and every column extract is a strided gather), while a
    plane is a dense ``(N,)`` vector using all 128 lanes.  Measured on the
    device-resident roofline this is the difference between ~2 GB/s and
    memcpy-class bandwidth for the same arithmetic.  The host-side
    transpose of the framer's row-major output costs one sequential pass
    (``np.ascontiguousarray(rec.T)``) — negligible next to BGZF decode.
    """
    planes = planes.astype(jnp.uint8)

    # --- POS: 10 zero-padded BCD nibbles -> uint32 ----------------------
    pos = jnp.zeros(planes.shape[1], jnp.uint32)
    w = _POW10[:R12_POS_NIBBLES][::-1]  # 10^9 ... 10^0 (static python)
    for b in range(R12_POS_BYTES):
        byte = planes[R12_POS_OFF + b]
        pos = pos + (byte >> 4).astype(jnp.uint32) * jnp.uint32(w[2 * b])
        pos = pos + (byte & 0xF).astype(jnp.uint32) * jnp.uint32(w[2 * b + 1])
    start = pos - 1

    ref_len = planes[R12_REF_LEN_OFF].astype(jnp.uint32)
    alt_len = planes[R12_ALT_LEN_OFF].astype(jnp.uint32)
    stop = start + ref_len
    ref_char = planes[R12_REF_OFF]
    alt_char = planes[R12_ALT_OFF]
    is_acgt = (
        (alt_char == ord("A"))
        | (alt_char == ord("C"))
        | (alt_char == ord("G"))
        | (alt_char == ord("T"))
    )
    snp_mask = (ref_len == 1) & (alt_len == 1) & is_acgt

    flags = planes[R12_FLAGS_OFF]
    well_formed = (flags & FLAG12_WELL_FORMED) != 0

    if with_sample:
        gt = planes[R12_GT_OFF]
        g0n = gt >> 4
        g2n = gt & 0xF
        has_gt = (flags & FLAG12_HAS_GT) != 0
        sep_ok = (flags & (FLAG12_SEP_PIPE | FLAG12_SEP_SLASH)) != 0
        diploid = has_gt & ((flags & FLAG12_DIPLOID_LEN) != 0) & sep_ok
        miss_n = jnp.uint8(GT_NIBBLE_MISSING)
        missing = diploid & ((g0n == miss_n) | (g2n == miss_n))
        phase1 = jnp.where(missing, jnp.int8(1), (g0n != 0).astype(jnp.int8))
        phase2 = jnp.where(missing, jnp.int8(0), (g2n != 0).astype(jnp.int8))
        phased = diploid & ((flags & FLAG12_SEP_PIPE) != 0)
        valid = well_formed & diploid
    else:
        n = planes.shape[1]
        phase1 = jnp.zeros((n,), jnp.int8)
        phase2 = jnp.zeros((n,), jnp.int8)
        phased = jnp.zeros((n,), bool)
        missing = jnp.zeros((n,), bool)
        valid = well_formed

    return {
        "start": start,
        "stop": stop,
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": ascii_to_codes(ref_char),
        "alt_code": ascii_to_codes(alt_char),
        "phase1": phase1,
        "phase2": phase2,
        "phased": phased,
        "missing": missing,
        "snp_mask": snp_mask,
        "valid": valid,
        "chrom_id": planes[R12_CHROM_ID_OFF],
    }


@jax.jit
def decode_frames_v2(
    fixed: jax.Array,  # (N, 5) uint8
    gt: jax.Array,  # (N, S) uint8 (S may be 0)
    exc_idx: jax.Array,  # (E,) int — escaped record indices; pad with N
    exc_pos: jax.Array,  # (E,) uint32 — absolute POS; pad arbitrary
    run_counts: jax.Array,  # (R,) int — chrom run lengths; pad with 0
    run_ids: jax.Array,  # (R,) uint8 — chrom ids; pad arbitrary
) -> dict[str, jax.Array]:
    """Decode the v2 compact layout (frame_format.py V2_*; half the wire
    bytes of :func:`decode_frames12` per sample, and S samples at once).

    POS reconstruction on device: records carry u16 deltas (cumsum), and
    escaped records (chunk starts, chrom changes, gaps > 65535, malformed)
    are fixed up from the exception arrays with a scatter + second cumsum —
    ``pos = cumsum(delta) + cumsum(scatter(correction))`` where each
    correction re-anchors the chain at its exception index.  Chrom ids
    come from run-lengths via searchsorted.  Genotype decode keeps the
    reference's allele-presence semantics per sample column
    (``vcfpp.h:508-531``): phase arrays are ``(N, S)``.

    ``stop`` is ``start + 1``, correct exactly for the records the SNP
    pipeline keeps (``ref_len == 1`` by predicate); use the 12/64-byte
    layouts when true REF lengths are needed.

    Callers should pad ``exc_*`` / ``run_*`` to fixed-size buckets (pads:
    ``exc_idx = N``, ``run_counts = 0``) to avoid retraces; padded entries
    are inert (dropped scatters / zero-width runs).
    """
    from haplohyped_tpu.hostio.frame_format import (
        V2_ALT_OFF,
        V2_FLAGS_OFF,
        V2_REF_OFF,
        V2F_ALT1,
        V2F_POS_ESCAPE,
        V2F_REF1,
        V2_STOP_SENTINEL,
        V2F_WELL_FORMED,
        V2G_DIPLOID,
        V2G_HAS_GT,
        V2G_SEP_PIPE,
        V2G_SEP_SHIFT,
        V2G_SEP_SLASH,
        V2_GT_CLASS_MISSING,
    )

    fixed = fixed.astype(jnp.uint8)
    n = fixed.shape[0]
    flags = fixed[:, V2_FLAGS_OFF]
    escape = (flags & V2F_POS_ESCAPE) != 0

    # --- POS: delta cumsum + exception re-anchoring ---------------------
    delta = fixed[:, 0].astype(jnp.uint32) | (fixed[:, 1].astype(jnp.uint32) << 8)
    d = jnp.where(escape, jnp.uint32(0), delta)
    base = jnp.cumsum(d, dtype=jnp.uint32)  # inclusive
    ei = exc_idx.astype(jnp.int32)
    ei_safe = jnp.clip(ei, 0, jnp.maximum(n - 1, 0))
    # target cumulative correction at each exception (uint32 wraparound is
    # exactly the right arithmetic for "negative" re-anchors)
    s_tgt = exc_pos.astype(jnp.uint32) - base[ei_safe]
    c = s_tgt - jnp.concatenate([jnp.zeros(1, jnp.uint32), s_tgt[:-1]])
    corr = jnp.zeros((n,), jnp.uint32).at[ei].add(c, mode="drop")
    pos = base + jnp.cumsum(corr, dtype=jnp.uint32)
    start = pos - 1
    ref1 = (flags & V2F_REF1) != 0
    # multi-base REFs get the sentinel: v2 carries no REF length, so
    # start+1 would be silently wrong for them (see V2_STOP_SENTINEL)
    stop = jnp.where(ref1, start + 1, jnp.uint32(V2_STOP_SENTINEL))

    # --- REF/ALT + SNP predicate ----------------------------------------
    ref_char = fixed[:, V2_REF_OFF]
    alt_char = fixed[:, V2_ALT_OFF]
    is_acgt = (
        (alt_char == ord("A"))
        | (alt_char == ord("C"))
        | (alt_char == ord("G"))
        | (alt_char == ord("T"))
    )
    alt1 = (flags & V2F_ALT1) != 0
    snp_mask = ref1 & alt1 & is_acgt
    well_formed = (flags & V2F_WELL_FORMED) != 0

    # --- chrom ids from run-lengths (int32: record counts are < 2^31) ----
    cum = jnp.cumsum(run_counts.astype(jnp.int32))
    rid = jnp.searchsorted(cum, jnp.arange(n, dtype=jnp.int32), side="right")
    chrom_id = run_ids.astype(jnp.uint8)[jnp.clip(rid, 0, run_ids.shape[0] - 1)]

    # --- per-sample genotype columns (N, S) -------------------------------
    gt = gt.astype(jnp.uint8)
    a0 = gt & 3
    a2 = (gt >> 2) & 3
    sep = (gt >> V2G_SEP_SHIFT) & 3
    has_gt = (gt & V2G_HAS_GT) != 0
    sep_ok = (sep == V2G_SEP_PIPE) | (sep == V2G_SEP_SLASH)
    diploid = has_gt & ((gt & V2G_DIPLOID) != 0) & sep_ok
    miss = jnp.uint8(V2_GT_CLASS_MISSING)
    missing = diploid & ((a0 == miss) | (a2 == miss))
    phase1 = jnp.where(missing, jnp.int8(1), (a0 != 0).astype(jnp.int8))
    phase2 = jnp.where(missing, jnp.int8(0), (a2 != 0).astype(jnp.int8))
    phased = diploid & (sep == V2G_SEP_PIPE)
    valid = well_formed[:, None] & diploid

    return {
        "start": start,
        "stop": stop,
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": ascii_to_codes(ref_char),
        "alt_code": ascii_to_codes(alt_char),
        "ref1": ref1,
        "alt1": alt1,
        "snp_mask": snp_mask,
        "well_formed": well_formed,
        "chrom_id": chrom_id,
        "phase1": phase1,  # (N, S)
        "phase2": phase2,  # (N, S)
        "phased": phased,  # (N, S)
        "missing": missing,  # (N, S)
        "valid": valid,  # (N, S)
    }


def pad_v2_sides(
    frame, bucket: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad a FrameV2's side arrays to power-of-two buckets so repeated
    :func:`decode_frames_v2` calls hit the jit cache (pads are inert:
    ``exc_idx = N`` scatters drop, ``run_counts = 0`` runs are zero-width)."""
    n = frame.n

    def bucketed(size: int) -> int:
        b = bucket
        while b < size:
            b *= 2
        return b

    eb = bucketed(max(1, frame.exc_idx.shape[0]))
    rb = bucketed(max(1, frame.run_counts.shape[0]))
    exc_idx = np.full(eb, n, dtype=np.int64)
    exc_idx[: frame.exc_idx.shape[0]] = frame.exc_idx
    exc_pos = np.zeros(eb, dtype=np.uint32)
    exc_pos[: frame.exc_pos.shape[0]] = frame.exc_pos
    run_counts = np.zeros(rb, dtype=np.int64)
    run_counts[: frame.run_counts.shape[0]] = frame.run_counts
    run_ids = np.zeros(rb, dtype=np.uint8)
    run_ids[: frame.run_ids.shape[0]] = frame.run_ids
    return exc_idx, exc_pos, run_counts, run_ids


def decode_frames_v2_numpy(
    fixed: np.ndarray,
    gt: np.ndarray,
    exc_idx: np.ndarray,
    exc_pos: np.ndarray,
    run_counts: np.ndarray,
    run_ids: np.ndarray,
) -> dict[str, np.ndarray]:
    """Pure-numpy twin of :func:`decode_frames_v2` (validation / no-device)."""
    from haplohyped_tpu.hostio.frame_format import (
        V2_ALT_OFF,
        V2_FLAGS_OFF,
        V2_REF_OFF,
        V2F_ALT1,
        V2F_POS_ESCAPE,
        V2F_REF1,
        V2_STOP_SENTINEL,
        V2F_WELL_FORMED,
        V2G_DIPLOID,
        V2G_HAS_GT,
        V2G_SEP_PIPE,
        V2G_SEP_SHIFT,
        V2G_SEP_SLASH,
        V2_GT_CLASS_MISSING,
    )

    fixed = np.ascontiguousarray(fixed, dtype=np.uint8)
    n = fixed.shape[0]
    flags = fixed[:, V2_FLAGS_OFF]
    escape = (flags & V2F_POS_ESCAPE) != 0

    delta = fixed[:, 0].astype(np.uint32) | (fixed[:, 1].astype(np.uint32) << 8)
    d = np.where(escape, np.uint32(0), delta)
    base = np.cumsum(d, dtype=np.uint32)
    real = exc_idx < n
    ei = exc_idx[real].astype(np.int64)
    s_tgt = exc_pos[real].astype(np.uint32) - base[np.clip(ei, 0, max(n - 1, 0))]
    c = s_tgt - np.concatenate([np.zeros(1, np.uint32), s_tgt[:-1]])
    corr = np.zeros(n, np.uint32)
    np.add.at(corr, ei, c)
    pos = base + np.cumsum(corr, dtype=np.uint32)
    start = pos - 1
    ref1 = (flags & V2F_REF1) != 0
    stop = np.where(ref1, start + 1, np.uint32(V2_STOP_SENTINEL))

    ref_char = fixed[:, V2_REF_OFF]
    alt_char = fixed[:, V2_ALT_OFF]
    is_acgt = np.isin(alt_char, np.frombuffer(b"ACGT", dtype=np.uint8))
    alt1 = (flags & V2F_ALT1) != 0
    snp_mask = ref1 & alt1 & is_acgt
    well_formed = (flags & V2F_WELL_FORMED) != 0

    cum = np.cumsum(run_counts.astype(np.int64))
    rid = np.searchsorted(cum, np.arange(n, dtype=np.int64), side="right")
    chrom_id = run_ids[np.clip(rid, 0, max(run_ids.shape[0] - 1, 0))]

    gt = np.ascontiguousarray(gt, dtype=np.uint8)
    a0 = gt & 3
    a2 = (gt >> 2) & 3
    sep = (gt >> V2G_SEP_SHIFT) & 3
    has_gt = (gt & V2G_HAS_GT) != 0
    sep_ok = (sep == V2G_SEP_PIPE) | (sep == V2G_SEP_SLASH)
    diploid = has_gt & ((gt & V2G_DIPLOID) != 0) & sep_ok
    missing = diploid & ((a0 == V2_GT_CLASS_MISSING) | (a2 == V2_GT_CLASS_MISSING))
    phase1 = np.where(missing, 1, a0 != 0).astype(np.int8)
    phase2 = np.where(missing, 0, a2 != 0).astype(np.int8)
    phased = diploid & (sep == V2G_SEP_PIPE)
    valid = well_formed[:, None] & diploid

    return {
        "start": start,
        "stop": stop,
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": BASE_LUT[ref_char],
        "alt_code": BASE_LUT[alt_char],
        "ref1": ref1,
        "alt1": alt1,
        "snp_mask": snp_mask,
        "well_formed": well_formed,
        "chrom_id": chrom_id,
        "phase1": phase1,
        "phase2": phase2,
        "phased": phased,
        "missing": missing,
        "valid": valid,
    }


def decode_frames12_numpy(
    frames: np.ndarray, with_sample: bool = True
) -> dict[str, np.ndarray]:
    """Pure-numpy twin of :func:`decode_frames12` (validation / no-device path)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n = frames.shape[0]

    pos_bytes = frames[:, R12_POS_OFF : R12_POS_OFF + R12_POS_BYTES]
    nib = np.stack([pos_bytes >> 4, pos_bytes & 0xF], axis=2).reshape(
        n, R12_POS_NIBBLES
    )
    w = _POW10[:R12_POS_NIBBLES][::-1]
    pos = np.sum(nib.astype(np.uint32) * w[None, :], axis=1, dtype=np.uint32)
    start = pos - 1

    ref_len = frames[:, R12_REF_LEN_OFF].astype(np.uint32)
    alt_len = frames[:, R12_ALT_LEN_OFF].astype(np.uint32)
    stop = start + ref_len
    ref_char = frames[:, R12_REF_OFF]
    alt_char = frames[:, R12_ALT_OFF]
    is_acgt = np.isin(alt_char, np.frombuffer(b"ACGT", dtype=np.uint8))
    snp_mask = (ref_len == 1) & (alt_len == 1) & is_acgt

    flags = frames[:, R12_FLAGS_OFF]
    well_formed = (flags & FLAG12_WELL_FORMED) != 0

    if with_sample:
        gt = frames[:, R12_GT_OFF]
        g0n = gt >> 4
        g2n = gt & 0xF
        has_gt = (flags & FLAG12_HAS_GT) != 0
        sep_ok = (flags & (FLAG12_SEP_PIPE | FLAG12_SEP_SLASH)) != 0
        diploid = has_gt & ((flags & FLAG12_DIPLOID_LEN) != 0) & sep_ok
        missing = diploid & ((g0n == GT_NIBBLE_MISSING) | (g2n == GT_NIBBLE_MISSING))
        phase1 = np.where(missing, 1, g0n != 0).astype(np.int8)
        phase2 = np.where(missing, 0, g2n != 0).astype(np.int8)
        phased = diploid & ((flags & FLAG12_SEP_PIPE) != 0)
        valid = well_formed & diploid
    else:
        phase1 = np.zeros(n, np.int8)
        phase2 = np.zeros(n, np.int8)
        phased = np.zeros(n, bool)
        missing = np.zeros(n, bool)
        valid = well_formed

    return {
        "start": start,
        "stop": stop,
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": BASE_LUT[ref_char],
        "alt_code": BASE_LUT[alt_char],
        "phase1": phase1,
        "phase2": phase2,
        "phased": phased,
        "missing": missing,
        "snp_mask": snp_mask,
        "valid": valid,
        "chrom_id": frames[:, R12_CHROM_ID_OFF],
    }


def decoded_to_numpy(dec: DecodedVariants) -> dict[str, np.ndarray]:
    """Device->host transfer of the decode output as a dict of numpy arrays."""
    host = jax.device_get(dec)
    return {f: np.asarray(getattr(host, f)) for f in dec._fields}


def decode_frames_numpy(frames: np.ndarray, with_sample: bool = True) -> dict[str, np.ndarray]:
    """Pure-numpy twin of :func:`decode_frames` (validation / no-device path)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n = frames.shape[0]

    digits = frames[:, POS_OFF : POS_OFF + POS_CAP].astype(np.uint32) - ord("0")
    pos_len = frames[:, POS_LEN_OFF].astype(np.int32)
    exp = pos_len[:, None] - 1 - np.arange(POS_CAP, dtype=np.int32)[None, :]
    weights = np.where(exp >= 0, _POW10[np.clip(exp, 0, POS_CAP - 1)], 0).astype(np.uint32)
    pos = np.sum(digits * weights, axis=1, dtype=np.uint32)
    start = pos - 1

    ref_len = frames[:, REF_LEN_OFF].astype(np.uint32)
    alt_len = frames[:, ALT_LEN_OFF].astype(np.uint32)
    stop = start + ref_len
    ref_char = frames[:, REF_OFF]
    alt_char = frames[:, ALT_OFF]
    ref_code = BASE_LUT[ref_char]
    alt_code = BASE_LUT[alt_char]
    is_acgt = np.isin(alt_char, np.frombuffer(b"ACGT", dtype=np.uint8))
    snp_mask = (ref_len == 1) & (alt_len == 1) & is_acgt

    flags = frames[:, FLAGS_OFF]
    well_formed = (flags & FLAG_WELL_FORMED) != 0

    if with_sample:
        g0, g1, g2 = frames[:, GT_OFF], frames[:, GT_OFF + 1], frames[:, GT_OFF + 2]
        gt_len = frames[:, GT_LEN_OFF].astype(np.int32)
        has_gt = (flags & FLAG_HAS_GT) != 0
        sep_ok = (g1 == ord("|")) | (g1 == ord("/"))
        diploid = has_gt & (gt_len >= 3) & sep_ok
        missing = diploid & ((g0 == ord(".")) | (g2 == ord(".")))
        phase1 = np.where(missing, 1, (g0 != ord("0"))).astype(np.int8)
        phase2 = np.where(missing, 0, (g2 != ord("0"))).astype(np.int8)
        phased = diploid & (g1 == ord("|"))
        valid = well_formed & diploid
    else:
        phase1 = np.zeros(n, np.int8)
        phase2 = np.zeros(n, np.int8)
        phased = np.zeros(n, bool)
        missing = np.zeros(n, bool)
        valid = well_formed

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
        "valid": valid,
    }
