"""Pallas framed-record decoder — DEMOTED correctness/portability path.

The Pallas twin of :func:`haplohyped_tpu.ops.vcf_decode.decode_frames`,
consuming the hostio framer's fixed 64-byte record slots (the path used for
inputs the raw-text tokenizer can't window, e.g. very wide cohort lines).
Fixed slots mean every access is a static column read — no dynamic indexing,
no gathers — so the kernel is pure VPU work blocked (B, 64) per grid step,
double-buffered by the Pallas pipeline.

**Status (round 5, VERDICT r4 #6 — demoted with evidence, like the
tokenizer):** nothing selects this kernel by default.  The production
decode is the packed XLA kernel (``vcf_decode.decode_frames12_packed``).
The B12_REC occupancy sweep (``tools/pallas_decode_sweep.py``, committed
in ``benchmarks/pallas_decode_sweep.json``, chained-scan + d2h-fetch on
TPU v5e) measured the 12-byte Mosaic kernel at ~105M variants/s at BOTH
block=1024 and block=2048 — block-size invariant, so the loss is NOT
grid-step overhead — vs 3.04B variants/s for the packed XLA decode (29x).
The binding constraint is the record layout: the (B, 12) uint8 block is
cast to int32 in-kernel, padding lanes 12 -> 128, so every vector op runs
at ~9% lane utilization and blocks >= 16384 records are uncompilable
(scoped-VMEM OOM).  Fixing it would require a planes/SoA wire layout,
which the XLA `planes` kernel already covers (and the row-layout XLA
decode beats both).  Kept: bit-equal to the numpy/XLA decoders (interpret
parity in CI), selectable explicitly, bench-tracked by the decode12
shoot-out so a future Mosaic/relay improvement would be noticed.

(The raw-text tokenizer stays an XLA kernel on purpose: per-line windows at
arbitrary byte offsets need gather-style addressing that XLA's row-gather
lowers well, while Mosaic vector loads require tile-aligned offsets —
int8 VMEM tiles are 32x128. See docs/ARCHITECTURE.md.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


from haplohyped_tpu.hostio.frame_format import (
    ALT_LEN_OFF,
    ALT_OFF,
    FLAG_HAS_GT,
    FLAG_WELL_FORMED,
    FLAGS_OFF,
    GT_LEN_OFF,
    GT_OFF,
    POS_CAP,
    POS_LEN_OFF,
    POS_OFF,
    REF_LEN_OFF,
    REF_OFF,
)

#: records per grid step
B_REC = 2048


def _pow10_i32(e: jax.Array) -> jax.Array:
    """10**e for e in [0, 9] via binary exponentiation (no table consts)."""
    w = jnp.ones_like(e, dtype=jnp.int32)
    for bit, p in ((1, 10), (2, 100), (4, 10_000), (8, 100_000_000)):
        w = jnp.where((e & bit) != 0, w * jnp.int32(p), w)
    return w


def _decode_kernel(frames_ref, start_ref, stop_ref, ref_char_ref, alt_char_ref,
                   phase1_ref, phase2_ref, flags_ref, *, with_sample: bool):
    f = frames_ref[...].astype(jnp.int32)  # (B, 64)

    pos_len = f[:, POS_LEN_OFF]
    pos = jnp.zeros_like(pos_len)
    for i in range(POS_CAP):
        exp = pos_len - 1 - i
        w = jnp.where(
            (exp >= 0) & (exp <= 9), _pow10_i32(jnp.clip(exp, 0, 9)), 0
        )
        pos = pos + (f[:, POS_OFF + i] - ord("0")) * w
    start = pos - 1

    ref_len = f[:, REF_LEN_OFF]
    alt_len = f[:, ALT_LEN_OFF]
    stop = start + ref_len
    ref_char = f[:, REF_OFF]
    alt_char = f[:, ALT_OFF]
    is_acgt = (
        (alt_char == ord("A"))
        | (alt_char == ord("C"))
        | (alt_char == ord("G"))
        | (alt_char == ord("T"))
    )
    snp = (ref_len == 1) & (alt_len == 1) & is_acgt

    rec_flags = f[:, FLAGS_OFF]
    well_formed = (rec_flags & FLAG_WELL_FORMED) != 0

    if with_sample:
        g0 = f[:, GT_OFF]
        g1 = f[:, GT_OFF + 1]
        g2 = f[:, GT_OFF + 2]
        gt_len = f[:, GT_LEN_OFF]
        has_gt = (rec_flags & FLAG_HAS_GT) != 0
        sep_ok = (g1 == ord("|")) | (g1 == ord("/"))
        diploid = has_gt & (gt_len >= 3) & sep_ok
        missing = diploid & ((g0 == ord(".")) | (g2 == ord(".")))
        phase1 = jnp.where(missing, 1, (g0 != ord("0")).astype(jnp.int32))
        phase2 = jnp.where(missing, 0, (g2 != ord("0")).astype(jnp.int32))
        phased = diploid & (g1 == ord("|"))
        valid = well_formed & diploid
    else:
        zero = jnp.zeros_like(start)
        phase1 = phase2 = zero
        phased = zero != 0
        missing = zero != 0
        valid = well_formed

    start_ref[...] = start
    stop_ref[...] = stop
    ref_char_ref[...] = ref_char
    alt_char_ref[...] = alt_char
    phase1_ref[...] = phase1
    phase2_ref[...] = phase2
    flags_ref[...] = (
        snp.astype(jnp.int32)
        | (valid.astype(jnp.int32) << 1)
        | (missing.astype(jnp.int32) << 2)
        | (phased.astype(jnp.int32) << 3)
    )


@functools.partial(jax.jit, static_argnames=("with_sample", "interpret"))
def _pallas_decode_call(frames, with_sample: bool, interpret: bool = False):
    N = frames.shape[0]
    G = N // B_REC
    vec = lambda: pl.BlockSpec((B_REC,), lambda g: (g,))
    out_shape = [jax.ShapeDtypeStruct((N,), jnp.int32) for _ in range(7)]
    kernel = functools.partial(_decode_kernel, with_sample=with_sample)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((B_REC, 64), lambda g: (g, 0))],
        out_specs=[vec() for _ in range(7)],
        out_shape=out_shape,
        interpret=interpret,
    )(frames)


def _decode12_kernel(
    frames_ref,
    start_ref,
    meta_ref,
    reflen_ref,
    *,
    with_sample: bool,
):
    from haplohyped_tpu.hostio.frame_format import (
        FLAG12_DIPLOID_LEN,
        FLAG12_HAS_GT,
        FLAG12_SEP_PIPE,
        FLAG12_SEP_SLASH,
        FLAG12_WELL_FORMED,
        GT_NIBBLE_MISSING,
        R12_ALT_LEN_OFF,
        R12_ALT_OFF,
        R12_CHROM_ID_OFF,
        R12_FLAGS_OFF,
        R12_GT_OFF,
        R12_POS_BYTES,
        R12_POS_OFF,
        R12_REF_LEN_OFF,
        R12_REF_OFF,
    )

    f = frames_ref[...].astype(jnp.int32)  # (B, 12)

    # POS: 10 zero-padded BCD nibbles, MSD first; static unrolled dot
    pos = jnp.zeros_like(f[:, 0])
    for b in range(R12_POS_BYTES):
        byte = f[:, R12_POS_OFF + b]
        hi_exp = 9 - 2 * b
        lo_exp = 8 - 2 * b
        pos = pos + (byte >> 4) * jnp.int32(10**hi_exp)
        pos = pos + (byte & 0xF) * jnp.int32(10**lo_exp)
    start = pos - 1

    ref_len = f[:, R12_REF_LEN_OFF]
    alt_len = f[:, R12_ALT_LEN_OFF]
    stop = start + ref_len
    ref_char = f[:, R12_REF_OFF]
    alt_char = f[:, R12_ALT_OFF]
    is_acgt = (
        (alt_char == ord("A"))
        | (alt_char == ord("C"))
        | (alt_char == ord("G"))
        | (alt_char == ord("T"))
    )
    snp = (ref_len == 1) & (alt_len == 1) & is_acgt

    rec_flags = f[:, R12_FLAGS_OFF]
    well_formed = (rec_flags & FLAG12_WELL_FORMED) != 0

    if with_sample:
        gt = f[:, R12_GT_OFF]
        g0n = gt >> 4
        g2n = gt & 0xF
        has_gt = (rec_flags & FLAG12_HAS_GT) != 0
        sep_ok = (rec_flags & (FLAG12_SEP_PIPE | FLAG12_SEP_SLASH)) != 0
        diploid = has_gt & ((rec_flags & FLAG12_DIPLOID_LEN) != 0) & sep_ok
        missing = diploid & ((g0n == GT_NIBBLE_MISSING) | (g2n == GT_NIBBLE_MISSING))
        phase1 = jnp.where(missing, 1, (g0n != 0).astype(jnp.int32))
        phase2 = jnp.where(missing, 0, (g2n != 0).astype(jnp.int32))
        phased = diploid & ((rec_flags & FLAG12_SEP_PIPE) != 0)
        valid = well_formed & diploid
    else:
        zero = jnp.zeros_like(start)
        phase1 = phase2 = zero
        phased = zero != 0
        missing = zero != 0
        valid = well_formed

    del stop  # host derives it: start + ref_len (one add on 3 columns)
    start_ref[...] = start
    # PACKED outputs: 12 B/record of HBM writes instead of 32 (the kernel
    # is bandwidth-bound; the 8-column layout spent 73% of its traffic on
    # bytes that fit in spare bits).  meta = ref_char | alt_char<<8 |
    # chrom_id<<16 | flags<<24, flags = snp|valid<<1|missing<<2|phased<<3
    # |phase1<<4|phase2<<5; host-side unpack is three vectorized shifts.
    flags = (
        snp.astype(jnp.int32)
        | (valid.astype(jnp.int32) << 1)
        | (missing.astype(jnp.int32) << 2)
        | (phased.astype(jnp.int32) << 3)
        | (phase1.astype(jnp.int32) << 4)
        | (phase2.astype(jnp.int32) << 5)
    )
    meta_ref[...] = (
        ref_char
        | (alt_char << 8)
        | (f[:, R12_CHROM_ID_OFF] << 16)
        | (flags << 24)
    )
    reflen_ref[...] = ref_len


#: records per grid step for the 12-byte kernel — smaller than B_REC because
#: the 12-wide uint8 block pads to full 128-lane tiles in VMEM; the packed
#: layout leaves 3 int32 output vectors on the same scoped-vmem budget
#: (room to raise this, but 1024 already sits past the dispatch knee on
#: the measured corpus sizes)
B12_REC = 1024


@functools.partial(
    jax.jit, static_argnames=("with_sample", "interpret", "block")
)
def _pallas_decode12_call(
    frames, with_sample: bool, interpret: bool = False, block: int | None = None
):
    N = frames.shape[0]
    block = block or B12_REC
    G = N // block
    vec = lambda: pl.BlockSpec((block,), lambda g: (g,))
    out_shape = [jax.ShapeDtypeStruct((N,), jnp.int32) for _ in range(3)]
    kernel = functools.partial(_decode12_kernel, with_sample=with_sample)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((block, 12), lambda g: (g, 0))],
        out_specs=[vec() for _ in range(3)],
        out_shape=out_shape,
        interpret=interpret,
    )(frames)


def decode_frames12_pallas(
    frames: np.ndarray, with_sample: bool = True, interpret: bool = False
) -> dict[str, np.ndarray]:
    """Decode (N, 12) compact frames with the Pallas kernel.

    Same output schema as
    :func:`haplohyped_tpu.ops.vcf_decode.decode_frames12_numpy`.
    ``interpret=True`` runs in the Pallas interpreter (CPU CI).
    """
    from haplohyped_tpu.ops.vcf_decode import unpack12_columns

    n = frames.shape[0]
    n_pad = max(-(-n // B12_REC) * B12_REC, B12_REC)
    fp = np.zeros((n_pad, 12), np.uint8)
    fp[:n] = frames
    out = _pallas_decode12_call(jnp.asarray(fp), with_sample, interpret)
    start, meta, ref_len = (np.asarray(x)[:n] for x in jax.device_get(out))
    return unpack12_columns(start, meta, ref_len)


def decode_frames_pallas(
    frames: np.ndarray, with_sample: bool = True, interpret: bool = False
) -> dict[str, np.ndarray]:
    """Decode (N, 64) framed records with the Pallas kernel.

    Same output schema as :func:`decode_frames_numpy`.  ``interpret=True``
    runs the kernel in the Pallas interpreter (for CPU CI).
    """
    from haplohyped_tpu.core.constants import BASE_LUT

    n = frames.shape[0]
    n_pad = max(-(-n // B_REC) * B_REC, B_REC)
    fp = np.zeros((n_pad, 64), np.uint8)
    fp[:n] = frames
    out = _pallas_decode_call(jnp.asarray(fp), with_sample, interpret)
    start, stop, ref_char, alt_char, p1, p2, flags = (
        np.asarray(x)[:n] for x in jax.device_get(out)
    )
    ref_char = ref_char.astype(np.uint8)
    alt_char = alt_char.astype(np.uint8)
    return {
        "start": start.astype(np.uint32),
        "stop": stop.astype(np.uint32),
        "ref_char": ref_char,
        "alt_char": alt_char,
        "ref_code": BASE_LUT[ref_char],
        "alt_code": BASE_LUT[alt_char],
        "phase1": p1.astype(np.int8),
        "phase2": p2.astype(np.int8),
        "phased": (flags & 8) != 0,
        "missing": (flags & 4) != 0,
        "snp_mask": (flags & 1) != 0,
        "valid": (flags & 2) != 0,
    }
