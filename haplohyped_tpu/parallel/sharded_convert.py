"""Mesh-sharded cohort conversion — SINGLE-PASS per (chromosome, shard).

The data-parallel conversion driver of the north star: (donor × chromosome)
tasks are assigned in contiguous blocks to ``data``-axis shards (hosts in a
multi-host deployment, devices here), each shard's framed records decode SPMD
on its devices, and the per-shard variant tensors merge into the replicated
global cohort tensor with one ``all_gather`` over ICI.  On a real multi-host
slice each process only reads its own shard's VCF bytes; the collective is
the only cross-host communication.

Task order is CHROM-MAJOR, so a shard's contiguous row block is a donor-block
of one chromosome (spanning at most a handful of chromosome boundaries).
Each (chromosome, donor-block) parses with ONE ``frame_v2`` call: the VCF is
decompressed/tokenized once and every donor's GT column extracted from that
single pass — unlike the reference's O(donors × file) loop
(``/root/reference/src/haplohyped/vcf_to_h5.py:142-152``), which re-reads and
re-decodes the whole file per donor (BASELINE config 4: "100+ samples,
sample-sharded data-parallel streaming").  Wall clock is ~flat in donor count;
``haplohyped_tpu.hostio.vcf.FRAME_COUNTS`` lets tests assert the
decompression count.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from haplohyped_tpu.core.constants import BASE_LUT, SNP_STRUCT_DTYPE
from haplohyped_tpu.data.cohort import INT32_MAX, CohortTensors

logger = logging.getLogger(__name__)

_EMPTY_STRUCT = np.zeros(0, dtype=SNP_STRUCT_DTYPE)


@dataclass
class ShardPlan:
    """Contiguous-block task assignment over the data axis (block layout
    matches a ``P('data')`` row sharding, so shard s's tasks are exactly the
    rows its devices hold — each process parses only its own rows).

    Tasks are chrom-major: shard s's block is a run of donors within one
    chromosome, so the shard needs ~1 file pass per chromosome it touches."""

    tasks: list[tuple[str, str]]  # (donor, chrom_name), chrom-major order
    n_shards: int

    @property
    def t_pad(self) -> int:
        return -(-len(self.tasks) // self.n_shards) * self.n_shards

    @property
    def rows_per_shard(self) -> int:
        return self.t_pad // self.n_shards

    def shard_rows(self, shard: int) -> range:
        r = self.rows_per_shard
        return range(shard * r, (shard + 1) * r)

    def shard_tasks(self, shard: int) -> list[tuple[str, str]]:
        return [self.tasks[i] for i in self.shard_rows(shard) if i < len(self.tasks)]


def plan_shards(donors: list[str], chrom_names: list[str], n_shards: int) -> ShardPlan:
    tasks = [(d, c) for c in chrom_names for d in donors]
    return ShardPlan(tasks=tasks, n_shards=n_shards)


def _parse_task_group(
    vcf_path: str, donors: list[str], chrom: str, threads: int, device: bool
) -> dict[str, np.ndarray]:
    """One (chromosome, donor-block) -> per-donor SNP structs from a SINGLE
    file pass (``frame_v2`` extracts every donor's GT column at once)."""
    from haplohyped_tpu.hostio.vcf import VCFSource
    from haplohyped_tpu.pipeline.records import snp_structs_from_v2
    from haplohyped_tpu.pipeline.vcf_to_h5 import _decode_v2

    src = VCFSource(vcf_path, threads=threads)
    frame = src.frame_v2(samples=donors, region=chrom)
    decoded = _decode_v2(frame, device)
    return snp_structs_from_v2(
        decoded, frame.chroms, frame.samples, chrom_filter=chrom
    )


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


def _local_data_shards(mesh: Mesh) -> list[int]:
    """Data-axis indices whose devices belong to THIS process (all of them
    in a single-process run)."""
    axis_idx = list(mesh.axis_names).index("data")
    me = jax.process_index()
    local = {
        idx[axis_idx]
        for idx, dev in np.ndenumerate(mesh.devices)
        if dev.process_index == me
    }
    return sorted(local)


def convert_sharded(
    vcf_path_for: dict[str, str],  # chrom_name -> vcf path
    donors: list[str],
    chrom_names: list[str],
    mesh: Mesh,
    threads: int = 2,
    host_workers: int = 4,
    device_decode: bool = False,
) -> CohortTensors:
    """Convert a cohort into device-resident tensors via the sharded plan.

    Genuinely multi-process: each process parses ONLY the (donor, chrom)
    tasks whose ``P('data')`` rows live on its local devices, contributes
    them with ``make_array_from_process_local_data``, and the replicating
    jit inserts the all-gather (XLA collective over ICI on TPU slices,
    Gloo between CPU test processes).  Single-process runs take the same
    code path with every shard local.

    Parsing is single-pass: the process's local rows are grouped by
    chromosome and each group costs ONE ``frame_v2`` file pass regardless
    of how many donors it covers.  ``device_decode=True`` runs the v2
    decode kernel on the accelerator (host numpy decode otherwise — the
    right default for CPU-mesh test processes).
    """
    from jax.sharding import NamedSharding

    n_shards = mesh.shape["data"]
    plan = plan_shards(donors, chrom_names, n_shards)
    local_shards = _local_data_shards(mesh)
    my_rows = [i for s in local_shards for i in plan.shard_rows(s)]
    my_tasks = [plan.tasks[i] if i < len(plan.tasks) else None for i in my_rows]

    # host parse: group this process's rows by chromosome — one frame_v2
    # pass per (chromosome, local donor-set); None rows are padding
    groups: dict[str, list[int]] = {}
    for k, t in enumerate(my_tasks):
        if t is not None:
            groups.setdefault(t[1], []).append(k)

    structs: list[np.ndarray] = [_EMPTY_STRUCT] * len(my_tasks)

    def parse_group(item):
        chrom, idxs = item
        block_donors = list(dict.fromkeys(my_tasks[k][0] for k in idxs))
        per_donor = _parse_task_group(
            vcf_path_for[chrom], block_donors, chrom, threads, device_decode
        )
        return idxs, per_donor

    with ThreadPoolExecutor(max_workers=host_workers) as ex:
        for idxs, per_donor in ex.map(parse_group, groups.items()):
            for k in idxs:
                structs[k] = per_donor[my_tasks[k][0]]

    # vmax must agree across processes: all-reduce the local max
    vmax_local = max((s.shape[0] for s in structs), default=1)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        vmax_all = multihost_utils.process_allgather(
            np.asarray([vmax_local], np.int32)
        )
        vmax_local = int(np.max(vmax_all))
    vmax = -(-max(vmax_local, 1) // 128) * 128

    cols = _structs_to_task_tensors(structs, vmax)
    sh = NamedSharding(mesh, P("data"))
    T_pad = plan.t_pad

    def merge(local_col: np.ndarray) -> np.ndarray:
        gshape = (T_pad,) + local_col.shape[1:]
        garr = jax.make_array_from_process_local_data(sh, local_col, gshape)
        rep = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P())
        )(garr)
        return np.asarray(rep)

    pos, ref, alt, p1, p2, cnt = (merge(c) for c in cols)

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
