"""Torch-compatible random haplotype dataset (host path).

API parity with the reference's ``RandomHaplotypeDataset``
(``src/datasets/haplotype_dataset.py:30-114``) — same constructor signature
and ``(hap1, hap2)`` float32 tensor pairs — implementing the *intended*
variant-application semantics (the shipped ``encode_haplotypes`` was
positionally buggy, SURVEY §2.9.7): windows start from the reference codes
and in-window variant positions take ALT where the phase bit is 1, else the
variant's REF.

This class exists for drop-in compatibility with torch ``DataLoader`` users;
the TPU-native path is :class:`haplohyped_tpu.data.sampler.DeviceHaplotypeSampler`,
which produces identical windows entirely on device (equivalence is tested).
"""

from __future__ import annotations

import numpy as np

from haplohyped_tpu.core.constants import BASE_LUT, NUM_CHANNELS
from haplohyped_tpu.data.regions import calculate_midpoint_region, load_bed_regions
from haplohyped_tpu.storage.h5_reader import VCFH5Reader
from haplohyped_tpu.storage.reference import ReferenceGenomeReader
from haplohyped_tpu.utils.common_utils import parse_encode_dict

try:  # torch is optional — the device sampler does not need it
    from torch.utils.data import Dataset as _TorchDataset

    _HAVE_TORCH = True
except Exception:  # pragma: no cover
    _TorchDataset = object
    _HAVE_TORCH = False


def encode_haplotypes_host(
    ref_codes: np.ndarray,  # (L,) int8 window codes
    genotype_struct: np.ndarray,  # SNP_STRUCT_DTYPE rows for (donor, chrom)
    start: int,
    end: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Host reference implementation of the variant-aware window encode."""
    L = end - start
    hap1 = np.array(ref_codes[:L], dtype=np.int8, copy=True)
    hap2 = hap1.copy()
    pos = genotype_struct["start"].astype(np.int64)
    in_win = (pos >= start) & (pos < end)
    if in_win.any():
        t = genotype_struct[in_win]
        rel = (t["start"].astype(np.int64) - start).astype(np.int64)
        ref_b = np.frombuffer(t["ref"].tobytes(), dtype=np.uint8).reshape(-1, 10)[:, 0]
        alt_b = np.frombuffer(t["alt"].tobytes(), dtype=np.uint8).reshape(-1, 10)[:, 0]
        ref_c = BASE_LUT[ref_b]
        alt_c = BASE_LUT[alt_b]
        hap1[rel] = np.where(t["phase1"] == 1, alt_c, ref_c)
        hap2[rel] = np.where(t["phase2"] == 1, alt_c, ref_c)
    return hap1, hap2


class RandomHaplotypeDataset(_TorchDataset):
    """Random variant-aware haplotype windows as torch float32 tensors."""

    def __init__(
        self,
        bed_file: str,
        hdf5_genotype_file: str,
        hdf5_reference_file: str,
        samples_file: str,
        encode_spec=None,
        seed: int = 42,
        batch_size: int = 1,
        seq_length: int = 1000,
    ):
        _, self.region_spans, _ = load_bed_regions(bed_file)
        self.vcf_reader = VCFH5Reader(hdf5_genotype_file)
        self.reference_genome = ReferenceGenomeReader(hdf5_reference_file, encode_spec)
        self.encode_spec = parse_encode_dict(encode_spec)
        self.donor_ids = self.read_samples(samples_file)
        self.chromosomes = [
            f"chr{c}" for c in sorted(
                {c for d in self.donor_ids for c in self.vcf_reader.chromosomes(d)},
                key=lambda x: (len(x), x),
            )
        ]
        self.batch_size = batch_size
        self.seq_length = seq_length
        self._rng = np.random.RandomState(seed)
        self.num_samples = int(self.region_spans.shape[0])
        self._geno_cache: dict[tuple[str, str], np.ndarray] = {}

    def read_samples(self, samples_file: str) -> list[str]:
        with open(samples_file) as f:
            return [line.strip() for line in f if line.strip()]

    def set_random_seed(self, seed: int) -> None:
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return self.num_samples

    def _fetch_genotypes(self, donor_id: str, chrom: str) -> np.ndarray:
        key = (donor_id, chrom)
        if key not in self._geno_cache:
            self._geno_cache[key] = self.vcf_reader.fetch_genotypes(
                donor_id, chrom.removeprefix("chr")
            )
        return self._geno_cache[key]

    def sample_numpy(self) -> tuple[np.ndarray, np.ndarray]:
        """One batch as numpy float32 one-hot arrays (B, L, C)."""
        hap1_batch, hap2_batch = [], []
        for _ in range(self.batch_size):
            region_idx = self._rng.randint(0, self.num_samples)
            donor_idx = self._rng.randint(0, len(self.donor_ids))
            chrom_idx = self._rng.randint(0, len(self.chromosomes))

            start, end = self.region_spans[region_idx]
            donor_id = self.donor_ids[donor_idx]
            chrom = self.chromosomes[chrom_idx]

            new_start, new_end = calculate_midpoint_region(start, end, self.seq_length)
            chrom_len = self.reference_genome.length(chrom)
            # clamp the fixed-length window inside the chromosome
            new_start = min(new_start, max(0, chrom_len - self.seq_length))
            new_end = new_start + self.seq_length

            ref_codes = self.reference_genome.get_codes(chrom, new_start, new_end)
            genotype_data = self._fetch_genotypes(donor_id, chrom)
            hap1, hap2 = encode_haplotypes_host(ref_codes, genotype_data, new_start, new_end)

            eye = np.eye(NUM_CHANNELS, dtype=np.float32)
            hap1_batch.append(eye[hap1])
            hap2_batch.append(eye[hap2])
        return np.stack(hap1_batch), np.stack(hap2_batch)

    def __getitem__(self, idx):
        """Reference semantics: ``idx`` is ignored; every item is a random
        draw (``haplotype_dataset.py:54-61``)."""
        hap1, hap2 = self.sample_numpy()
        if _HAVE_TORCH:
            import torch

            return torch.tensor(hap1, dtype=torch.float32), torch.tensor(
                hap2, dtype=torch.float32
            )
        return hap1, hap2

    def close(self) -> None:
        self.vcf_reader.close()
        self.reference_genome.close()
