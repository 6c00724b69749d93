"""Sharded decode + cohort merge collectives.

The data-parallel conversion story (SURVEY §2.3 TPU-native plan): framed VCF
record blocks shard over the ``data`` mesh axis, each shard decodes locally
(the decode kernel is elementwise over records, so XLA runs it fully
parallel with zero communication), and per-shard variant tensors merge into
the replicated global cohort tensor with one ``all_gather`` over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from haplohyped_tpu.hostio.frame_format import REC_SIZE
from haplohyped_tpu.ops.vcf_decode import DecodedVariants, decode_frames


def sharded_decode_frames(frames: np.ndarray, mesh: Mesh) -> DecodedVariants:
    """Decode a frame matrix with records sharded over the ``data`` axis.

    Pads the record count to a multiple of the data-axis size, places the
    input with a ``P('data', None)`` sharding, and lets the jit decode run
    SPMD; outputs keep the same record sharding (callers slice off the pad).
    """
    n = frames.shape[0]
    d = mesh.shape["data"]
    pad = (-n) % d
    if pad:
        frames = np.concatenate(
            [frames, np.zeros((pad, REC_SIZE), dtype=np.uint8)], axis=0
        )
    sharding = NamedSharding(mesh, P("data", None))
    dev_frames = jax.device_put(frames, sharding)
    dec = decode_frames(dev_frames)
    if pad:
        dec = DecodedVariants(*(x[:n] for x in dec))
    return dec


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _all_gather_impl(x, mesh: Mesh, axis: str):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
        check_vma=False,
    )
    def gather(shard):
        return jax.lax.all_gather(shard, axis, axis=0, tiled=True)

    return gather(x)


def all_gather_cohort(per_shard: jax.Array | np.ndarray, mesh: Mesh, axis: str = "data"):
    """Merge shard-local variant tensors into a replicated global tensor.

    ``per_shard`` has its leading (shard) axis partitioned over ``axis``;
    the result is the concatenation along that axis, replicated on every
    device — the cohort-merge collective of the north star.
    """
    x = jax.device_put(
        jnp.asarray(per_shard), NamedSharding(mesh, P(axis))
    )
    return _all_gather_impl(x, mesh, axis)


def psum_counts(local_counts: np.ndarray | jax.Array, mesh: Mesh, axis: str = "data"):
    """Global variant-count statistics (validation checksums) via psum."""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(), check_vma=False
    )
    def reduce(shard):
        return jax.lax.psum(jnp.sum(shard, keepdims=True), axis)

    x = jax.device_put(jnp.asarray(local_counts), NamedSharding(mesh, P(axis)))
    return jax.jit(reduce)(x)
