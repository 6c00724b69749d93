"""Config dataclasses shared by the CLIs and the library API.

The reference scatters configuration across click flags and hardcoded module
constants (``vcf_to_h5.py:209-215``, ``fasta_encoder.py:189-192``,
``vcf_to_h5.py:51,151``).  Here every pipeline is driven by one dataclass so
library users, CLIs and the sharded/distributed drivers share a single source
of truth.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Sequence

from haplohyped_tpu.core.constants import (
    AUTOSOMES,
    DEFAULT_SEQ_LENGTH,
    VCF_FILENAME_PATTERN,
)


@dataclass(frozen=True)
class ConvertConfig:
    """Configuration of the VCF -> cohort-HDF5 conversion."""

    cohort_name: str
    vcf_dir: str
    out_dir: str
    sample_list_path: str
    #: host-side worker threads fanning out over donors
    cores: int = field(default_factory=lambda: os.cpu_count() or 1)
    #: native decompression/framing threads per task (the reference's
    #: ``--cxx_threads``)
    cxx_threads: int = 4
    chromosomes: tuple[int, ...] = AUTOSOMES
    vcf_pattern: str = VCF_FILENAME_PATTERN
    #: skip (donor, chrom) shards whose temp artifact already exists — the
    #: first-class resume story (reference restartability is only implicit).
    resume: bool = False
    #: run the SNP-field decode on the accelerator (JAX) instead of numpy.
    device_decode: bool = True
    #: route device decode through the raw-text on-device tokenizer
    #: (ops/vcf_tokenize) instead of the compact-frame kernel.  The
    #: tokenizer keeps ALL tab-scanning on the accelerator but ships the
    #: whole VCF text; the default compact-frame path ships 12 bytes/record.
    #: False is a MEASURED default (bench.py ``tokenizer`` stage: the
    #: frame12 path wins the end-to-end head-to-head by a wide margin —
    #: committed numbers in benchmarks/latest_bench.json); the tokenizer
    #: stays maintained as the zero-native-dependency portability path.
    use_tokenizer: bool = False
    #: single-pass cohort conversion (default): each chromosome's VCF is
    #: decompressed/framed ONCE and every donor's genotype column extracted
    #: from that one pass (v2 layout) — O(file) total host work instead of
    #: the reference's O(donors x file) re-parse (``vcf_to_h5.py:142-152``).
    #: Off = the donor-fan-out path (one parse per donor, reference shape).
    single_pass: bool = True
    #: write each donor's dataset STRAIGHT into the final cohort file
    #: (single writer, per-donor groups) instead of the reference's
    #: temp-file-per-(donor, chrom) + sequential-merge shape — the merge
    #: copy roughly triples storage cost at whole-genome scale.  Dataset
    #: contents, layout and compression are identical either way (pinned
    #: by tests); automatically disabled when ``resume`` is on (resume
    #: tracks temp artifacts).
    direct_write: bool = True

    @property
    def tmp_dir(self) -> str:
        return os.path.join(self.out_dir, "tmp_files")

    @property
    def final_h5_path(self) -> str:
        return os.path.join(self.out_dir, f"{self.cohort_name}.h5")

    def vcf_path(self, chromosome: int | str) -> str:
        return os.path.join(self.vcf_dir, self.vcf_pattern.format(chromosome=chromosome))

    def replace(self, **kw) -> "ConvertConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class FastaEncodeConfig:
    """Configuration of the FASTA -> one-hot reference-genome HDF5 encoding."""

    fasta_path: str
    out_dir: str
    cores: int = field(default_factory=lambda: os.cpu_count() or 1)
    chromosomes: tuple[str, ...] = tuple(f"chr{i}" for i in AUTOSOMES)
    resume: bool = False
    #: additionally store int8 base-code datasets for fast device loading.
    write_codes: bool = True

    @property
    def tmp_dir(self) -> str:
        return os.path.join(self.out_dir, "tmp_chrom_files")

    @property
    def final_h5_path(self) -> str:
        return os.path.join(self.out_dir, "reference_genome.h5")

    def replace(self, **kw) -> "FastaEncodeConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded conversion / training.

    Axis semantics:
      - ``data``:  batch / donor-shard data parallelism (and fsdp grouping)
      - ``model``: tensor parallelism of the flagship model
    """

    data: int = 1
    model: int = 1
    axis_names: tuple[str, str] = ("data", "model")

    @property
    def num_devices(self) -> int:
        return self.data * self.model


@dataclass(frozen=True)
class SamplerConfig:
    """On-device haplotype window sampler configuration."""

    seq_length: int = DEFAULT_SEQ_LENGTH
    batch_size: int = 1
    seed: int = 42
    #: static cap on variants applied per window (jit-friendly upper bound);
    #: windows with more in-window SNPs are truncated (counted in stats).
    max_variants_per_window: int = 128
    #: window-encode kernel: "auto", "baseline" (jnp gather/select), "fast"
    #: (word gather + two-level search), or "pallas" (explicit-DMA TPU
    #: kernel).  All three are bit-equal (tests/test_window_kernels.py).
    #: "auto" resolves at sampler construction: Pallas on TPU — the only
    #: kernel whose advantage was ever confirmed by a d2h-verified
    #: measurement (0.235s vs 4.97s/9.1s for a 2048-dispatch chain on a
    #: remote-dispatch rig: one opaque kernel per step instead of an XLA
    #: op-graph amortizes per-step dispatch), and within noise of the
    #: others under direct execution — "fast" elsewhere (Pallas would be
    #: interpret-mode off-TPU: a correctness tool, not a fast path).
    window_kernel: str = "auto"


def chrom_list(chromosomes: Sequence[int | str]) -> list[str]:
    """Normalise chromosome identifiers to the ``chr{n}`` string form."""
    out = []
    for c in chromosomes:
        s = str(c)
        out.append(s if s.startswith("chr") else f"chr{s}")
    return out
