"""Fused variant-aware haplotype window encoding.

The device replacement for the reference's ``encode_haplotypes`` +
``encode_sequence`` per-item Python path (``haplotype_dataset.py:86-110``,
``common_utils.py:88-103``), with the *intended* semantics (the shipped code
was positionally buggy — SURVEY §2.9.7): each haplotype window starts as the
reference-genome codes, then every in-window variant position is overwritten
with the variant's ALT code where that haplotype's phase bit is 1, else the
variant's REF code.

One jit call produces a full ``(B, L)`` batch of haplotype code pairs (plus
one-hot views) from device-resident genome/cohort tensors:

  gather(genome window) -> searchsorted(variant span) -> masked scatter
  -> one-hot

All shapes are static: ``L`` (window length) and ``K`` (max variants applied
per window) are compile-time constants; windows with more than ``K`` in-window
variants apply the first ``K`` (the overflow count is returned for stats).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class HaplotypeWindows(NamedTuple):
    hap1: jax.Array  # (B, L) int8 codes
    hap2: jax.Array  # (B, L) int8 codes
    n_variants: jax.Array  # (B,) int32 — in-window variant count (pre-cap)
    overflow: jax.Array  # (B,) int32 — variants dropped by the K cap


def _one_window(
    genome_flat: jax.Array,  # (G,) int8
    chrom_offset: jax.Array,  # () int32 — flat offset of the window's chrom
    start: jax.Array,  # () int32 — window start within chrom
    var_pos: jax.Array,  # (V,) int32 sorted; padded tail = INT32_MAX
    var_ref: jax.Array,  # (V,) int8
    var_alt: jax.Array,  # (V,) int8
    var_p1: jax.Array,  # (V,) int8
    var_p2: jax.Array,  # (V,) int8
    var_count: jax.Array,  # () int32 — valid prefix length of var_pos
    L: int,
    K: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    window = jax.lax.dynamic_slice(genome_flat, (chrom_offset + start,), (L,))

    lo = jnp.searchsorted(var_pos, start, side="left")
    hi = jnp.searchsorted(var_pos, start + L, side="left")
    n_in = jnp.minimum(hi, var_count) - jnp.minimum(lo, var_count)
    n_in = jnp.maximum(n_in, 0).astype(jnp.int32)

    take = lo + jnp.arange(K, dtype=lo.dtype)
    applied = jnp.arange(K, dtype=jnp.int32) < jnp.minimum(n_in, K)
    take_c = jnp.clip(take, 0, var_pos.shape[0] - 1)
    pos = var_pos[take_c] - start
    # masked-out lanes scatter to index L which 'drop' mode discards
    pos = jnp.where(applied, pos, L)

    p1 = var_p1[take_c]
    p2 = var_p2[take_c]
    alt = var_alt[take_c]
    ref = var_ref[take_c]
    sub1 = jnp.where(p1 == 1, alt, ref)
    sub2 = jnp.where(p2 == 1, alt, ref)

    # Scatter-free substitution: TPU scatters serialize badly, so instead
    # compare every output position against the K variant positions (a dense
    # (K, L) mask — pure VPU work) and select.  Last matching variant wins,
    # matching scatter semantics for duplicate positions.
    out_pos = jnp.arange(L, dtype=pos.dtype)
    match = pos[:, None] == out_pos[None, :]  # (K, L)
    prio = jnp.where(match, jnp.arange(1, K + 1, dtype=jnp.int32)[:, None], 0)
    kbest = jnp.argmax(prio, axis=0)  # largest matching k (prio distinct)
    has_match = jnp.max(prio, axis=0) > 0
    hap1 = jnp.where(has_match, sub1[kbest], window)
    hap2 = jnp.where(has_match, sub2[kbest], window)
    overflow = jnp.maximum(n_in - K, 0)
    return hap1, hap2, n_in, overflow


@functools.partial(jax.jit, static_argnames=("L", "K"))
def encode_haplotype_windows(
    genome_flat: jax.Array,  # (G,) int8 concatenated chrom codes
    chrom_offsets: jax.Array,  # (C,) int32
    var_pos: jax.Array,  # (D, C, V) int32 sorted per (d, c); pad INT32_MAX
    var_ref: jax.Array,  # (D, C, V) int8
    var_alt: jax.Array,  # (D, C, V) int8
    var_p1: jax.Array,  # (D, C, V) int8
    var_p2: jax.Array,  # (D, C, V) int8
    var_counts: jax.Array,  # (D, C) int32
    donor_idx: jax.Array,  # (B,) int32
    chrom_idx: jax.Array,  # (B,) int32
    start: jax.Array,  # (B,) int32 window start within chrom
    *,
    L: int,
    K: int,
) -> HaplotypeWindows:
    """Encode a batch of variant-aware haplotype windows on device."""

    def per_elem(di, ci, s):
        return _one_window(
            genome_flat,
            chrom_offsets[ci],
            s,
            var_pos[di, ci],
            var_ref[di, ci],
            var_alt[di, ci],
            var_p1[di, ci],
            var_p2[di, ci],
            var_counts[di, ci],
            L,
            K,
        )

    hap1, hap2, n_in, overflow = jax.vmap(per_elem)(donor_idx, chrom_idx, start)
    return HaplotypeWindows(hap1=hap1, hap2=hap2, n_variants=n_in, overflow=overflow)


@functools.partial(jax.jit, static_argnames=("num_channels", "dtype"))
def windows_to_onehot(codes: jax.Array, num_channels: int = 5, dtype=jnp.float32):
    """(B, L) int8 codes -> (B, L, C) one-hot."""
    iota = jnp.arange(num_channels, dtype=codes.dtype)
    return (codes[..., None] == iota).astype(dtype)
