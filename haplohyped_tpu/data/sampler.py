"""On-device haplotype batch sampler.

The jit-compiled replacement for the reference's CPU
``RandomHaplotypeDataset`` + torch ``DataLoader`` path
(``haplotype_dataset.py:30-114``; ``README.md:96-112``): PRNG-driven
(region, donor, chromosome) draws, the midpoint window crop, and the fused
gather/substitute kernel all run on the accelerator; each call returns a
ready haplotype batch on device, so batches feed a training step with zero
host involvement.

Default output is ``(B, L)`` int8 base codes — the model stem one-hots them
on the fly in compute dtype, so the 5-channel float expansion never touches
HBM (20x less sampler output traffic).  ``emit_onehot=True`` restores
materialized ``(B, L, C)`` one-hot batches for torch-parity consumers.

Reference sampling semantics preserved: region, donor and chromosome indices
are drawn *independently* (the region only supplies its position span —
``haplotype_dataset.py:59-70``).  Robustness deviation: windows are clamped
to the chromosome so out-of-range regions can't crash mid-training (the
reference would fault on a short slice).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from haplohyped_tpu.core.config import SamplerConfig
from haplohyped_tpu.data.cohort import CohortTensors
from haplohyped_tpu.data.genome import GenomeTensors
from haplohyped_tpu.data.regions import load_bed_regions
from haplohyped_tpu.ops.haplotype_window import (
    build_window_index,
    encode_haplotype_windows,
    encode_haplotype_windows_fast,
    windows_to_onehot,
)


class HaplotypeBatch(NamedTuple):
    """One sampled batch.  In the default codes mode (``emit_onehot=False``)
    ``hap1``/``hap2`` ARE the int8 code arrays (aliases of ``hap*_codes`` —
    same device buffers, 20x less HBM traffic than float32 one-hot); the
    model stem one-hots codes on the fly, so ``batch.hap1`` feeds training
    unchanged in either mode."""

    hap1: jax.Array  # (B, L, C) one-hot, or (B, L) int8 codes (codes mode)
    hap2: jax.Array  # same form as hap1
    hap1_codes: jax.Array  # (B, L) int8
    hap2_codes: jax.Array  # (B, L) int8
    n_variants: jax.Array  # (B,) int32
    overflow: jax.Array  # (B,) int32


def _encode_windows(kernel, enc, donor_idx, chrom_idx, start, L, K, interpret):
    """Dispatch to the selected bit-equal window kernel.  ``enc`` is the
    kernel-specific operand tuple built by :meth:`DeviceHaplotypeSampler.
    _build_enc_args` (a pytree, so it traces through jit/scan)."""
    if kernel == "baseline":
        (genome_flat, chrom_offsets, pos, ref, alt, p1, p2, counts) = enc
        return encode_haplotype_windows(
            genome_flat, chrom_offsets, pos, ref, alt, p1, p2, counts,
            donor_idx, chrom_idx, start, L=L, K=K,
        )
    if kernel == "fast":
        (genome_words, chrom_offsets, pos, sub12, grid, counts) = enc
        return encode_haplotype_windows_fast(
            genome_words, chrom_offsets, pos, sub12, grid, counts,
            donor_idx, chrom_idx, start, L=L, K=K,
        )
    if kernel == "pallas":
        from haplohyped_tpu.ops.pallas_window import encode_windows_pallas

        pidx, chrom_offsets = enc
        return encode_windows_pallas(
            pidx, chrom_offsets, donor_idx, chrom_idx, start,
            L=L, K=K, interpret=interpret,
        )
    raise ValueError(f"unknown window kernel: {kernel!r}")


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "K", "B", "D", "num_channels", "onehot_dtype", "emit_onehot",
        "kernel", "interpret",
    ),
)
def _sample_batch(
    base_key,
    step,
    chrom_lengths,
    region_spans,  # (R, 2) int32
    enc,  # kernel-specific operand pytree
    *,
    L: int,
    K: int,
    B: int,
    D: int,
    num_channels: int,
    onehot_dtype,
    emit_onehot: bool = False,
    kernel: str = "baseline",
    interpret: bool = False,
) -> HaplotypeBatch:
    key = jax.random.fold_in(base_key, step)
    kr, kd, kc = jax.random.split(key, 3)
    R = region_spans.shape[0]
    C = chrom_lengths.shape[0]
    region_idx = jax.random.randint(kr, (B,), 0, R)
    donor_idx = jax.random.randint(kd, (B,), 0, D)
    chrom_idx = jax.random.randint(kc, (B,), 0, C)

    span = region_spans[region_idx]  # (B, 2)
    mid = (span[:, 0] + span[:, 1]) // 2
    new_start = jnp.maximum(0, mid - L // 2)
    # clamp so the fixed-length window stays inside the drawn chromosome
    limit = jnp.maximum(chrom_lengths[chrom_idx] - L, 0)
    start = jnp.minimum(new_start, limit).astype(jnp.int32)

    win = _encode_windows(
        kernel, enc, donor_idx, chrom_idx, start, L, K, interpret
    )
    if emit_onehot:
        hap1 = windows_to_onehot(win.hap1, num_channels, onehot_dtype)
        hap2 = windows_to_onehot(win.hap2, num_channels, onehot_dtype)
    else:
        hap1, hap2 = win.hap1, win.hap2  # aliases: zero extra HBM writes
    return HaplotypeBatch(
        hap1=hap1,
        hap2=hap2,
        hap1_codes=win.hap1,
        hap2_codes=win.hap2,
        n_variants=win.n_variants,
        overflow=win.overflow,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "K", "B", "D", "num_channels", "onehot_dtype", "n_batches",
        "emit_onehot", "kernel", "interpret",
    ),
)
def _sample_batches(
    base_key,
    step0,
    chrom_lengths,
    region_spans,
    enc,
    *,
    L: int,
    K: int,
    B: int,
    D: int,
    num_channels: int,
    onehot_dtype,
    n_batches: int,
    emit_onehot: bool = False,
    kernel: str = "baseline",
    interpret: bool = False,
) -> HaplotypeBatch:
    """``n_batches`` sampling steps fused into ONE dispatch via lax.scan.

    Identical per-step streams to :func:`_sample_batch` (each step folds
    ``step0 + i`` into the base key), so ``sample_many(n)`` is bit-equal to
    ``n`` successive ``sample()`` calls.  Amortizes per-execution dispatch
    latency — the dominant cost on remote/tunneled devices — and feeds
    scan-based training loops without host round-trips.  Leaves come back
    stacked ``(n_batches, ...)``.
    """

    def body(carry, i):
        out = _sample_batch(
            base_key,
            step0 + i,
            chrom_lengths,
            region_spans,
            enc,
            L=L,
            K=K,
            B=B,
            D=D,
            num_channels=num_channels,
            onehot_dtype=onehot_dtype,
            emit_onehot=emit_onehot,
            kernel=kernel,
            interpret=interpret,
        )
        return carry, out

    _, outs = jax.lax.scan(body, 0, jnp.arange(n_batches, dtype=jnp.int32))
    return outs


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "K", "B", "D", "num_channels", "onehot_dtype", "n_batches",
        "n_chain", "emit_onehot", "kernel", "interpret",
    ),
)
def _sample_chain(
    base_key,
    chrom_lengths,
    region_spans,
    enc,
    *,
    L: int,
    K: int,
    B: int,
    D: int,
    num_channels: int,
    onehot_dtype,
    n_batches: int,
    n_chain: int,
    emit_onehot: bool = False,
    kernel: str = "baseline",
    interpret: bool = False,
):
    """Measurement kernel: ``n_chain`` DEPENDENT ``_sample_batches`` calls
    in ONE executable.  Step ``k+1``'s PRNG key folds in a parity digest
    of step ``k``'s outputs (every window byte feeds the digest), so the
    chain is serial by construction — an execution relay can neither
    elide nor overlap steps — and the returned scalar digest is the only
    fetch a caller needs to prove the whole chain ran.  Device-resident
    windows/sec = ``n_chain * n_batches * B / elapsed``."""

    def body(key, _):
        out = _sample_batches(
            key,
            jnp.int32(0),
            chrom_lengths,
            region_spans,
            enc,
            L=L,
            K=K,
            B=B,
            D=D,
            num_channels=num_channels,
            onehot_dtype=onehot_dtype,
            n_batches=n_batches,
            emit_onehot=emit_onehot,
            kernel=kernel,
            interpret=interpret,
        )
        d1 = (out.hap1_codes.astype(jnp.uint32) & 1).sum() & 1
        d2 = (out.hap2_codes.astype(jnp.uint32) & 1).sum() & 1
        digest = (
            d1 ^ (d2 << 1) ^ out.n_variants.astype(jnp.uint32).sum()
        ).astype(jnp.uint32)
        if emit_onehot:
            # the one-hot leaves are DISTINCT outputs (hap1/hap2 alias
            # hap*_codes only in codes mode) — fold them in too, or XLA
            # dead-code-eliminates the 5x one-hot expansion and the chain
            # measures codes-mode throughput under a one-hot label
            o1 = (out.hap1.astype(jnp.uint32) & 1).sum() & 1
            o2 = (out.hap2.astype(jnp.uint32) & 1).sum() & 1
            digest = digest ^ (o1 << 2) ^ (o2 << 3)
        return jax.random.fold_in(key, digest), digest

    _, digests = jax.lax.scan(body, base_key, None, length=n_chain)
    return digests.sum()


class DeviceHaplotypeSampler:
    """Stateful convenience wrapper around the jit sampling kernel."""

    def __init__(
        self,
        genome: GenomeTensors,
        cohort: CohortTensors,
        region_spans: np.ndarray,  # (R, 2)
        config: SamplerConfig = SamplerConfig(),
        num_channels: int = 5,
        onehot_dtype=jnp.float32,
        emit_onehot: bool = False,
    ):
        if genome.chrom_names != cohort.chrom_names:
            # re-order/subset the cohort chrom axis into the genome's index
            # space (chrom_idx is drawn in genome space; a mismatched cohort
            # layout would silently apply the wrong chromosome's variants)
            missing = [c for c in genome.chrom_names if c not in cohort.chrom_names]
            if missing:
                raise ValueError(
                    f"cohort lacks chromosomes present in genome: {missing}"
                )
            import numpy as _np

            order = [cohort.chrom_names.index(c) for c in genome.chrom_names]
            cohort = CohortTensors(
                donors=cohort.donors,
                chrom_names=list(genome.chrom_names),
                pos=_np.ascontiguousarray(cohort.pos[:, order]),
                ref_code=_np.ascontiguousarray(cohort.ref_code[:, order]),
                alt_code=_np.ascontiguousarray(cohort.alt_code[:, order]),
                phase1=_np.ascontiguousarray(cohort.phase1[:, order]),
                phase2=_np.ascontiguousarray(cohort.phase2[:, order]),
                counts=_np.ascontiguousarray(cohort.counts[:, order]),
            )
        self.genome = genome
        self.cohort = cohort
        self.config = config
        self.num_channels = num_channels
        self.onehot_dtype = onehot_dtype
        self.emit_onehot = emit_onehot
        self.kernel = config.window_kernel
        if self.kernel == "auto":
            # Pallas on TPU (d2h-verified winner on remote-dispatch rigs,
            # within noise under direct execution), word-gather elsewhere
            # (Pallas off-TPU is interpret mode — correctness, not speed)
            self.kernel = (
                "pallas" if jax.default_backend() == "tpu" else "fast"
            )
        # Pallas lowers on TPU only; CPU (tests) runs it in interpret mode
        self._interpret = (
            self.kernel == "pallas" and jax.default_backend() != "tpu"
        )

        self._genome_dev = genome.device_arrays()
        self._cohort_dev = cohort.device_arrays()
        self._enc = self._build_enc_args()
        self._regions_dev = jnp.asarray(region_spans.astype(np.int32))
        self._base_key = jax.random.PRNGKey(config.seed)
        self._step = 0

    def _build_enc_args(self):
        """Kernel-specific operand pytree (built once; device-resident)."""
        flat, offsets, _lengths = self._genome_dev
        pos, ref, alt, p1, p2, counts = self._cohort_dev
        if self.kernel == "baseline":
            return (flat, offsets, pos, ref, alt, p1, p2, counts)
        if self.kernel == "fast":
            idx = build_window_index(
                self.genome.codes_flat, self.cohort.pos, self.cohort.ref_code,
                self.cohort.alt_code, self.cohort.phase1, self.cohort.phase2,
            )
            return (idx.genome_words, offsets, pos, idx.sub12, idx.grid, counts)
        if self.kernel == "pallas":
            from haplohyped_tpu.ops.pallas_window import build_pallas_window_index

            pidx = build_pallas_window_index(
                self.genome.codes_flat, self.cohort.pos, self.cohort.ref_code,
                self.cohort.alt_code, self.cohort.phase1, self.cohort.phase2,
                self.cohort.counts,
            )
            return (pidx, offsets)
        raise ValueError(f"unknown window kernel: {self.kernel!r}")

    @classmethod
    def from_files(
        cls,
        bed_file: str,
        cohort_h5: str,
        reference_h5: str,
        samples_file: str | None = None,
        config: SamplerConfig = SamplerConfig(),
        **kwargs,
    ) -> "DeviceHaplotypeSampler":
        donors = None
        if samples_file:
            with open(samples_file) as f:
                donors = [line.strip() for line in f if line.strip()]
        genome = GenomeTensors.from_h5(reference_h5)
        cohort = CohortTensors.from_h5(cohort_h5, donors=donors, chrom_names=genome.chrom_names)
        _, spans, _ = load_bed_regions(bed_file)
        return cls(genome, cohort, spans, config, **kwargs)

    def sample(self, key: jax.Array | None = None) -> HaplotypeBatch:
        """Draw one batch; without an explicit key, advances an internal
        host-side step counter folded into the base key *inside* the jit —
        no device round-trip between steps, so sampling pipelines fully
        asynchronously (a chained ``jax.random.split`` would serialize on
        dispatch latency)."""
        if key is None:
            base, step = self._base_key, self._step
            self._step += 1
        else:
            base, step = key, 0
        _, _, lengths = self._genome_dev
        return _sample_batch(
            base,
            jnp.int32(step),
            lengths,
            self._regions_dev,
            self._enc,
            L=self.config.seq_length,
            K=self.config.max_variants_per_window,
            B=self.config.batch_size,
            D=self.cohort.num_donors,
            num_channels=self.num_channels,
            onehot_dtype=self.onehot_dtype,
            emit_onehot=self.emit_onehot,
            kernel=self.kernel,
            interpret=self._interpret,
        )

    def sample_many(self, n_batches: int, key: jax.Array | None = None) -> HaplotypeBatch:
        """Draw ``n_batches`` batches in ONE device dispatch (leaves stacked
        ``(n_batches, ...)``) — bit-equal to ``n_batches`` successive
        :meth:`sample` calls, but paying dispatch latency once."""
        if key is None:
            base, step = self._base_key, self._step
            self._step += n_batches
        else:
            base, step = key, 0
        _, _, lengths = self._genome_dev
        return _sample_batches(
            base,
            jnp.int32(step),
            lengths,
            self._regions_dev,
            self._enc,
            L=self.config.seq_length,
            K=self.config.max_variants_per_window,
            B=self.config.batch_size,
            D=self.cohort.num_donors,
            num_channels=self.num_channels,
            onehot_dtype=self.onehot_dtype,
            n_batches=n_batches,
            emit_onehot=self.emit_onehot,
            kernel=self.kernel,
            interpret=self._interpret,
        )

    def sample_chain(self, n_chain: int, n_batches: int, key: jax.Array | None = None):
        """Measurement utility (see :func:`_sample_chain`): ``n_chain``
        serially-dependent fused sampling dispatches; returns the scalar
        digest whose fetch proves execution.  Used by the bench's
        device-resident windows stage."""
        if key is None:
            # fold + advance the step counter (like sample/sample_many):
            # repeated key-less chains must not dispatch byte-identical
            # executions (a caching relay would elide the repeat) nor
            # collide with the training stream's step-0 key
            base = jax.random.fold_in(self._base_key, self._step)
            self._step += n_chain * n_batches
        else:
            base = key
        _, _, lengths = self._genome_dev
        return _sample_chain(
            base,
            lengths,
            self._regions_dev,
            self._enc,
            L=self.config.seq_length,
            K=self.config.max_variants_per_window,
            B=self.config.batch_size,
            D=self.cohort.num_donors,
            num_channels=self.num_channels,
            onehot_dtype=self.onehot_dtype,
            n_batches=n_batches,
            n_chain=n_chain,
            emit_onehot=self.emit_onehot,
            kernel=self.kernel,
            interpret=self._interpret,
        )

    def __iter__(self):
        while True:
            yield self.sample()
