"""Position-axis genome sharding with halo exchange.

For genomes that exceed per-device HBM (SURVEY §5.7's long-sequence plan):
the flat genome code array splits into contiguous chunks over the ``data``
mesh axis, each chunk extended with an ``L``-byte *halo* copied from the
start of the next chunk, so any fixed-length window resolves entirely on the
shard that owns its start — no runtime communication per window.  The only
collective is one ``psum`` combining each shard's masked contribution to
the batch (windows are owned by exactly one shard).

Halos are materialised host-side at load (they are tiny: S·L bytes); on a
multi-host slice the same construction runs per host on its own chunk plus
an edge exchange with its right neighbour.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from haplohyped_tpu.core.constants import N_CODE


@dataclass
class ShardedGenome:
    """Genome codes split into S halo-extended chunks over the data axis."""

    chunk: int  # bases per shard (excluding halo)
    halo: int  # halo bytes (>= max window length)
    total_len: int
    chunks_dev: jax.Array  # (S, chunk + halo) int8, sharded P('data', None)
    mesh: Mesh

    @classmethod
    def from_codes(
        cls, codes: np.ndarray, mesh: Mesh, halo: int, axis: str = "data"
    ) -> "ShardedGenome":
        s = mesh.shape[axis]
        total = codes.shape[0]
        chunk = -(-total // s)
        chunk = -(-chunk // 128) * 128  # lane-friendly chunk size
        padded = np.full(s * chunk + halo, N_CODE, np.int8)
        padded[:total] = codes
        chunks = np.stack([padded[i * chunk : i * chunk + chunk + halo] for i in range(s)])
        dev = jax.device_put(chunks, NamedSharding(mesh, P(axis, None)))
        return cls(chunk=chunk, halo=halo, total_len=total, chunks_dev=dev, mesh=mesh)


@functools.partial(jax.jit, static_argnames=("L", "chunk", "mesh", "axis"))
def _sharded_window_gather(chunks, starts, *, L: int, chunk: int, mesh: Mesh, axis: str):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def gather(chunk_local, starts_rep):
        sid = jax.lax.axis_index(axis)
        local = starts_rep - sid * chunk
        owned = (local >= 0) & (local < chunk)
        safe = jnp.clip(local, 0, chunk - 1)

        def one(s):
            return jax.lax.dynamic_slice(chunk_local[0], (s,), (L,))

        win = jax.vmap(one)(safe)
        win = jnp.where(owned[:, None], win, jnp.int8(0))
        return jax.lax.psum(win, axis)

    return gather(chunks, starts)


def sharded_window_gather(genome: ShardedGenome, starts, L: int, axis: str = "data"):
    """Gather ``(B, L)`` windows from the position-sharded genome.

    ``starts`` are global 0-based positions (windows must fit within
    ``total_len``; the halo guarantees in-shard resolution).
    """
    if L > genome.halo:
        raise ValueError(f"window length {L} exceeds halo {genome.halo}")
    starts = jnp.asarray(starts, jnp.int32)
    return _sharded_window_gather(
        genome.chunks_dev,
        starts,
        L=L,
        chunk=genome.chunk,
        mesh=genome.mesh,
        axis=axis,
    )
