"""Device-side bit-packed nucleotide codecs (jnp mirror of
:mod:`haplohyped_tpu.utils.bitpack`).

The HBM-resident genome format: 2 bits/base + an N mask keeps a whole human
genome under 1 GB on-chip.  Pack/unpack are shape-static, fuse into
neighboring kernels, and round-trip bit-exactly against the numpy codecs
(tested), which in turn gate against the reference HDF5 artifacts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from haplohyped_tpu.core.constants import N_CODE


@jax.jit
def pack_2bit_device(codes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int8 codes (length % 4 == 0) -> (packed u8 L/4, n_mask u8 L/8).

    N positions pack as 0; the bit mask (little-endian bit order, matching
    ``np.packbits(..., bitorder='little')``) restores them on unpack.
    """
    codes = codes.astype(jnp.uint8)
    is_n = codes == N_CODE
    two = jnp.where(is_n, 0, codes) & 0x3
    q = two.reshape(-1, 4)
    packed = q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)
    # the N mask packs 8 flags/byte; pad so any length % 4 == 0 input works
    pad = (-is_n.shape[0]) % 8
    if pad:
        is_n = jnp.concatenate([is_n, jnp.zeros((pad,), bool)])
    b = is_n.reshape(-1, 8).astype(jnp.uint8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, :]
    n_mask = jnp.sum(b * weights, axis=1).astype(jnp.uint8)
    return packed, n_mask


@jax.jit
def unpack_2bit_device(packed: jax.Array, n_mask: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_2bit_device` -> int8 codes (length = 4*|packed|)."""
    p = packed.astype(jnp.uint8)
    out = jnp.stack(
        [p & 0x3, (p >> 2) & 0x3, (p >> 4) & 0x3, (p >> 6) & 0x3], axis=1
    ).reshape(-1)
    bits = n_mask.astype(jnp.uint8)[:, None] >> jnp.arange(8, dtype=jnp.uint8)[None, :]
    is_n = (bits & 1).astype(bool).reshape(-1)
    return jnp.where(is_n[: out.shape[0]], jnp.uint8(N_CODE), out).astype(jnp.int8)


@jax.jit
def pack_4bit_device(codes: jax.Array) -> jax.Array:
    """int8 codes (length % 2 == 0) -> nibble-packed u8 (two codes/byte)."""
    c = codes.astype(jnp.uint8).reshape(-1, 2)
    return (c[:, 0] & 0xF) | (c[:, 1] << 4)


@jax.jit
def unpack_4bit_device(packed: jax.Array) -> jax.Array:
    p = packed.astype(jnp.uint8)
    return jnp.stack([p & 0xF, p >> 4], axis=1).reshape(-1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("L",))
def gather_window_2bit(
    packed: jax.Array, n_mask: jax.Array, start: jax.Array, *, L: int
) -> jax.Array:
    """Fetch an L-base window of codes straight from the packed form.

    Slices the covering bytes (L/4 + 1) and unpacks only the window — the
    packed-genome fast path for the haplotype sampler.
    """
    byte_start = start // 4
    nbytes = L // 4 + 1
    pb = jax.lax.dynamic_slice(packed, (byte_start,), (nbytes,))
    mb = jax.lax.dynamic_slice(n_mask, (byte_start // 2,), (nbytes // 2 + 1,))
    codes = unpack_2bit_device(
        pb, jnp.zeros((nbytes // 2 + 1,), jnp.uint8)
    )  # unpack bases without mask first
    bits = mb[:, None] >> jnp.arange(8, dtype=jnp.uint8)[None, :]
    is_n = (bits & 1).astype(bool).reshape(-1)
    phase = start - byte_start * 4
    win = jax.lax.dynamic_slice(codes, (phase,), (L,))
    n_off = byte_start // 2 * 8
    n_idx = byte_start * 4 - n_off + phase
    n_win = jax.lax.dynamic_slice(is_n, (n_idx,), (L,))
    return jnp.where(n_win, jnp.int8(N_CODE), win)
