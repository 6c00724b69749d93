"""Mesh-sharded cohort conversion.

The data-parallel conversion driver of the north star: (donor × chromosome)
tasks are assigned round-robin to ``data``-axis shards (hosts in a multi-host
deployment, devices here), each shard's framed records decode SPMD on its
devices, and the per-shard variant tensors merge into the replicated global
cohort tensor with one ``all_gather`` over ICI.  On a real multi-host slice
each process only reads its own shard's VCF bytes; the collective is the only
cross-host communication.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from haplohyped_tpu.core.constants import BASE_LUT
from haplohyped_tpu.data.cohort import INT32_MAX, CohortTensors

logger = logging.getLogger(__name__)


@dataclass
class ShardPlan:
    """Round-robin task assignment over the data axis."""

    tasks: list[tuple[str, str]]  # (donor, chrom_name), global order
    n_shards: int

    def shard_tasks(self, shard: int) -> list[tuple[str, str]]:
        return self.tasks[shard :: self.n_shards]


def plan_shards(donors: list[str], chrom_names: list[str], n_shards: int) -> ShardPlan:
    tasks = [(d, c) for d in donors for c in chrom_names]
    return ShardPlan(tasks=tasks, n_shards=n_shards)


def _parse_task(vcf_path: str, donor: str, chrom: str, threads: int) -> np.ndarray:
    """One (donor, chrom) -> SNP struct (host+device decode)."""
    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.hostio.vcf import VCFSource
    from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy
    from haplohyped_tpu.pipeline.records import (
        snp_struct_from_decoded,
        snp_struct_from_frames,
    )

    if native.native_available():
        vt = native.vcf_text(vcf_path, threads=threads)
        try:
            from haplohyped_tpu.ops.vcf_tokenize import tokenize_vcf_device

            dec = tokenize_vcf_device(vt, donor)
            if not dec["long_line"].any():
                return snp_struct_from_decoded(dec, dec["chrom"], chrom_filter=chrom)
        finally:
            vt.close()
    fr = VCFSource(vcf_path, threads=threads).frame(sample=donor, region=chrom)
    return snp_struct_from_frames(fr.records, decode_frames_numpy(fr.records))


def _structs_to_task_tensors(structs: list[np.ndarray], vmax: int):
    """Stack per-task structs into padded (T, V) columns."""
    T = len(structs)
    pos = np.full((T, vmax), INT32_MAX, np.int32)
    ref = np.zeros((T, vmax), np.int8)
    alt = np.zeros((T, vmax), np.int8)
    p1 = np.zeros((T, vmax), np.int8)
    p2 = np.zeros((T, vmax), np.int8)
    cnt = np.zeros((T,), np.int32)
    for i, s in enumerate(structs):
        n = s.shape[0]
        if n == 0:
            continue
        order = np.argsort(s["start"].astype(np.int64), kind="stable")
        s = s[order]
        pos[i, :n] = s["start"].astype(np.int32)
        rb = np.frombuffer(s["ref"].tobytes(), np.uint8).reshape(n, 10)[:, 0]
        ab = np.frombuffer(s["alt"].tobytes(), np.uint8).reshape(n, 10)[:, 0]
        ref[i, :n] = BASE_LUT[rb]
        alt[i, :n] = BASE_LUT[ab]
        p1[i, :n] = s["phase1"]
        p2[i, :n] = s["phase2"]
        cnt[i] = n
    return pos, ref, alt, p1, p2, cnt


def convert_sharded(
    vcf_path_for: dict[str, str],  # chrom_name -> vcf path
    donors: list[str],
    chrom_names: list[str],
    mesh: Mesh,
    threads: int = 2,
    host_workers: int = 4,
) -> CohortTensors:
    """Convert a cohort into device-resident tensors via the sharded plan.

    Per-shard host parsing fans out on threads; the padded per-task tensors
    are placed with a ``P('data')`` sharding and merged into replicated
    global arrays by ``all_gather`` (XLA inserts the collective over ICI).
    """
    n_shards = mesh.shape["data"]
    plan = plan_shards(donors, chrom_names, n_shards)

    # host parse (in a multi-host run each process does only its shard)
    with ThreadPoolExecutor(max_workers=host_workers) as ex:
        structs = list(
            ex.map(
                lambda t: _parse_task(vcf_path_for[t[1]], t[0], t[1], threads),
                plan.tasks,
            )
        )
    vmax = max((s.shape[0] for s in structs), default=1)
    vmax = -(-max(vmax, 1) // 128) * 128

    # pad task count to a multiple of the shard count
    T = len(plan.tasks)
    T_pad = -(-T // n_shards) * n_shards
    structs = structs + [structs[0][:0]] * (T_pad - T)
    cols = _structs_to_task_tensors(structs, vmax)

    from haplohyped_tpu.parallel.collectives import all_gather_cohort

    merged = [np.asarray(all_gather_cohort(c, mesh)) for c in cols]
    pos, ref, alt, p1, p2, cnt = merged

    D, C = len(donors), len(chrom_names)
    out = CohortTensors(
        donors=list(donors),
        chrom_names=list(chrom_names),
        pos=np.full((D, C, vmax), INT32_MAX, np.int32),
        ref_code=np.zeros((D, C, vmax), np.int8),
        alt_code=np.zeros((D, C, vmax), np.int8),
        phase1=np.zeros((D, C, vmax), np.int8),
        phase2=np.zeros((D, C, vmax), np.int8),
        counts=np.zeros((D, C), np.int32),
    )
    for i, (donor, chrom) in enumerate(plan.tasks):
        d = donors.index(donor)
        c = chrom_names.index(chrom)
        out.pos[d, c] = pos[i]
        out.ref_code[d, c] = ref[i]
        out.alt_code[d, c] = alt[i]
        out.phase1[d, c] = p1[i]
        out.phase2[d, c] = p2[i]
        out.counts[d, c] = cnt[i]
    return out
