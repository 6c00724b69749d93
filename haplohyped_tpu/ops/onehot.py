"""Device-side sequence encoding kernels.

One-hot encoding of nucleotide sequences — the device replacement for the
reference's whole-chromosome pandas/polars ``to_dummies`` hot loop
(``fasta_encoder.py:47-61``): a 256-entry LUT gather plus a compare against
the channel iota, fully fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from haplohyped_tpu.core.constants import BASE_LUT, NUM_CHANNELS


@jax.jit
def ascii_to_codes(raw: jax.Array) -> jax.Array:
    """uint8 ASCII bytes -> int8 base codes (unknown -> N); case-folded.

    GATHER-FREE on purpose: a 256-entry LUT gather looks cheap but TPU
    lowers dynamic gathers ~100x below VPU select throughput (measured on
    the device-resident roofline: two LUT gathers pinned the whole decode
    at ~0.25s/16M records regardless of layout).  Four compares + selects
    against the case-folded byte produce bit-identical codes to
    ``BASE_LUT`` for the default A/C/G/T/N spec (everything else,
    including bytes whose bit-5 fold collides with a base letter — none
    do — maps to N, same as the LUT's default fill)."""
    b = raw.astype(jnp.uint8)
    u = b & 0xDF  # ASCII uppercase fold (clears bit 5 for letters)
    n = jnp.int8(BASE_LUT[ord("N")])
    return jnp.where(
        u == ord("A"), jnp.int8(0),
        jnp.where(
            u == ord("C"), jnp.int8(1),
            jnp.where(
                u == ord("G"), jnp.int8(2),
                jnp.where(u == ord("T"), jnp.int8(3), n),
            ),
        ),
    )


@functools.partial(jax.jit, static_argnames=("num_channels", "dtype"))
def codes_to_onehot(
    codes: jax.Array, num_channels: int = NUM_CHANNELS, dtype=jnp.uint8
) -> jax.Array:
    """int codes ``(...,)`` -> one-hot ``(..., num_channels)``."""
    iota = jnp.arange(num_channels, dtype=codes.dtype)
    return (codes[..., None] == iota).astype(dtype)


def encode_ascii_onehot(raw: np.ndarray | jax.Array, dtype=jnp.uint8) -> jax.Array:
    """Fused bytes -> one-hot (the fasta_encoder device path)."""
    return codes_to_onehot(ascii_to_codes(jnp.asarray(raw)), dtype=dtype)
