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
import numpy as np


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


# ---------------------------------------------------------------------
# Fast path: same semantics as encode_haplotype_windows, restructured for
# TPU gather cost.  The sampler default OFF-TPU (window_kernel="auto"
# resolves here on CPU/GPU, where pallas_window would be interpret-mode);
# on TPU "auto" picks the Pallas kernel — the only one whose advantage a
# d2h-verified measurement ever confirmed.  All three are bit-equal;
# parity pinned by tests/test_window_kernels.py.
#
# Three changes versus the reference kernel above, each attacking a
# measured hot spot (per 64-window batch on a v5e chip):
#   1. genome windows gather int32 WORDS, not bytes (4x fewer gather
#      elements: 0.49ms -> word gather + a 4-way shift select);
#   2. the per-window variant span comes from a TWO-LEVEL search — a
#      dense compare against a precomputed every-S_GRID'th-position grid
#      (pure VPU) plus one chunk gather — replacing two vmapped
#      jnp.searchsorted binary searches (17 serialized gather rounds,
#      ~1.0ms);
#   3. REF/ALT/phase1/phase2 collapse at setup into per-variant packed
#      substitution codes sub12 = sub1 | sub2<<8 (phase selection is
#      window-independent), turning four (B, K) gathers into one.
# ---------------------------------------------------------------------

#: two-level search stride: the coarse grid holds every S_GRID'th variant
#: position; chunk gathers span S_GRID + K entries so the K applied
#: variants always land inside one chunk
S_GRID = 512


class WindowIndex(NamedTuple):
    """Precomputed device-side companions to the cohort/genome tensors for
    :func:`encode_haplotype_windows_fast` (build once per dataset)."""

    genome_words: jax.Array  # (Gw,) int32 — genome bytes packed LE 4/word
    grid: jax.Array  # (D, C, Vg) int32 — var_pos[..., ::S_GRID]
    sub12: jax.Array  # (D, C, V) int16 — sub1 | sub2 << 8


def build_window_index(
    genome_flat: np.ndarray,
    var_pos: np.ndarray,
    var_ref: np.ndarray,
    var_alt: np.ndarray,
    var_p1: np.ndarray,
    var_p2: np.ndarray,
) -> WindowIndex:
    """Host-side precompute for the fast window kernel."""
    g = np.asarray(genome_flat, dtype=np.int8)
    # pad to a word multiple plus slack so word_off + L//4 + 2 stays in range
    pad = (-g.size) % 4 + 16
    g = np.concatenate([g, np.zeros(pad, np.int8)])
    words = g.view("<i4")
    # the packed-sub and word-unpack tricks assume non-negative 7-bit codes
    # (base codes are 0..4); negative codes would decode differently here
    # than in the baseline kernel
    assert int(var_ref.min(initial=0)) >= 0 and int(var_ref.max(initial=0)) < 128
    assert int(var_alt.min(initial=0)) >= 0 and int(var_alt.max(initial=0)) < 128
    sub1 = np.where(var_p1 == 1, var_alt, var_ref).astype(np.int16)
    sub2 = np.where(var_p2 == 1, var_alt, var_ref).astype(np.int16)
    sub12 = (sub1 & 0xFF) | (sub2 << 8)
    return WindowIndex(
        genome_words=jnp.asarray(words),
        grid=jnp.asarray(np.ascontiguousarray(var_pos[..., ::S_GRID])),
        sub12=jnp.asarray(sub12),
    )


@functools.partial(jax.jit, static_argnames=("L", "K"))
def encode_haplotype_windows_fast(
    genome_words: jax.Array,  # (Gw,) int32
    chrom_offsets: jax.Array,  # (C,) int32
    var_pos: jax.Array,  # (D, C, V) int32 sorted per (d, c); pad INT32_MAX
    sub12: jax.Array,  # (D, C, V) int16 packed substitution codes
    grid: jax.Array,  # (D, C, Vg) int32
    var_counts: jax.Array,  # (D, C) int32
    donor_idx: jax.Array,  # (B,) int32
    chrom_idx: jax.Array,  # (B,) int32
    start: jax.Array,  # (B,) int32 window start within chrom
    *,
    L: int,
    K: int,
) -> HaplotypeWindows:
    """Bit-equal fast twin of :func:`encode_haplotype_windows`."""
    B = start.shape[0]
    D, C, V = var_pos.shape
    Vg = grid.shape[-1]
    S = S_GRID

    flat_start = chrom_offsets[chrom_idx] + start  # (B,)

    # --- genome window via word gather + 4-way byte-shift select ---------
    Lw = L // 4 + 2
    word_off = flat_start >> 2
    widx = word_off[:, None] + jnp.arange(Lw, dtype=jnp.int32)[None, :]
    words = jnp.take(genome_words, widx, axis=0)  # (B, Lw)
    # explicit little-endian unpack (matches the host's '<i4' packing on
    # every backend; bitcast_convert_type layout would be platform-defined)
    shifted = jnp.stack([(words >> s) & 0xFF for s in (0, 8, 16, 24)], axis=-1)
    wbytes = shifted.astype(jnp.int8).reshape(B, Lw * 4)
    r = (flat_start & 3)[:, None]
    window = jnp.where(
        r == 0,
        wbytes[:, 0:L],
        jnp.where(
            r == 1,
            wbytes[:, 1 : 1 + L],
            jnp.where(r == 2, wbytes[:, 2 : 2 + L], wbytes[:, 3 : 3 + L]),
        ),
    )

    # --- two-level variant span search -----------------------------------
    row = donor_idx * C + chrom_idx  # (B,)
    grid_rows = grid.reshape(D * C, Vg)[row]  # (B, Vg)
    bucket_lo = jnp.sum((grid_rows < start[:, None]).astype(jnp.int32), axis=1)
    bucket_hi = jnp.sum(
        (grid_rows < (start + L)[:, None]).astype(jnp.int32), axis=1
    )
    lo0 = jnp.maximum(bucket_lo - 1, 0) * S
    hi0 = jnp.maximum(bucket_hi - 1, 0) * S
    CH = S + K
    vp_flat = var_pos.reshape(D * C, V)

    def chunk(base):
        cidx = jnp.clip(
            base[:, None] + jnp.arange(CH, dtype=jnp.int32)[None, :], 0, V - 1
        )
        return vp_flat[row[:, None], cidx]  # (B, CH)

    ch_lo = chunk(lo0)
    lo = lo0 + jnp.sum((ch_lo < start[:, None]).astype(jnp.int32), axis=1)
    ch_hi = chunk(hi0)
    hi = hi0 + jnp.sum((ch_hi < (start + L)[:, None]).astype(jnp.int32), axis=1)

    count = var_counts.reshape(D * C)[row]
    n_in = jnp.minimum(hi, count) - jnp.minimum(lo, count)
    n_in = jnp.maximum(n_in, 0).astype(jnp.int32)
    n_apply = jnp.minimum(n_in, K)

    # --- applied-variant positions come straight out of ch_lo ------------
    # (lo - lo0 <= S, so lo .. lo+K-1 always lies inside the CH chunk)
    off = (lo - lo0)[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    pos_k = jnp.take_along_axis(ch_lo, jnp.clip(off, 0, CH - 1), axis=1)  # (B, K)
    applied = jnp.arange(K, dtype=jnp.int32)[None, :] < n_apply[:, None]
    pos_rel = jnp.where(applied, pos_k - start[:, None], L)

    # --- packed substitution codes (one (B, K) gather) --------------------
    kidx = jnp.clip(lo[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :], 0, V - 1)
    s12 = sub12.reshape(D * C, V)[row[:, None], kidx]  # (B, K) int16
    s1 = (s12 & 0xFF).astype(jnp.int8)
    s2 = (s12 >> 8).astype(jnp.int8)

    # --- scatter-free substitution (single max-reduce over K) ------------
    out_pos = jnp.arange(L, dtype=pos_rel.dtype)
    match = pos_rel[:, :, None] == out_pos[None, None, :]  # (B, K, L)
    prio = jnp.where(
        match, jnp.arange(1, K + 1, dtype=jnp.int16)[None, :, None], 0
    )
    kbest = jnp.max(prio, axis=1)  # (B, L) int16: last matching k + 1
    has = kbest > 0
    sel = jnp.maximum(kbest.astype(jnp.int32) - 1, 0)
    hap1 = jnp.where(has, jnp.take_along_axis(s1, sel, axis=1), window)
    hap2 = jnp.where(has, jnp.take_along_axis(s2, sel, axis=1), window)
    overflow = jnp.maximum(n_in - K, 0)
    return HaplotypeWindows(hap1=hap1, hap2=hap2, n_variants=n_in, overflow=overflow)
