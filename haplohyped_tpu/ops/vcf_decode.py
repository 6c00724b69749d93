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
    lut = jnp.asarray(BASE_LUT)
    ref_code = lut[ref_char]
    alt_code = lut[alt_char]

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
    lut = jnp.asarray(BASE_LUT)
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
        "ref_code": lut[ref_char],
        "alt_code": lut[alt_char],
        "phase1": phase1,
        "phase2": phase2,
        "phased": phased,
        "missing": missing,
        "snp_mask": snp_mask,
        "valid": valid,
        "chrom_id": frames[:, R12_CHROM_ID_OFF],
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
