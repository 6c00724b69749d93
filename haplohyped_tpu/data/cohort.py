"""Device-resident cohort variant tensors.

Lifts the cohort HDF5 (``donor_{id}/chr_{n}/snp_data`` structured arrays)
into dense, padded device arrays indexed ``(donor, chrom, variant)`` so the
on-device sampler can gather any (donor, chrom) span without host round-trips.
Ragged variant counts become a ``counts`` array + INT32_MAX position padding
(which keeps per-(d,c) position columns sorted for ``searchsorted``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from haplohyped_tpu.core.constants import BASE_LUT

INT32_MAX = np.iinfo(np.int32).max


@dataclass
class CohortTensors:
    donors: list[str]
    chrom_names: list[str]  # e.g. ["chr21", "chr22"] — index space of chrom axis
    pos: np.ndarray  # (D, C, V) int32, sorted per (d, c), padded INT32_MAX
    ref_code: np.ndarray  # (D, C, V) int8
    alt_code: np.ndarray  # (D, C, V) int8
    phase1: np.ndarray  # (D, C, V) int8
    phase2: np.ndarray  # (D, C, V) int8
    counts: np.ndarray  # (D, C) int32

    @property
    def num_donors(self) -> int:
        return len(self.donors)

    @property
    def max_variants(self) -> int:
        return int(self.pos.shape[2])

    @classmethod
    def from_structs(
        cls,
        tables: dict[tuple[str, str], np.ndarray],
        donors: list[str],
        chrom_names: list[str],
        pad_to: int | None = None,
    ) -> "CohortTensors":
        """Build from ``{(donor, chrom_name): snp_struct}`` tables."""
        D, C = len(donors), len(chrom_names)
        vmax = max((t.shape[0] for t in tables.values()), default=0)
        if pad_to is not None:
            vmax = max(vmax, pad_to)
        vmax = max(vmax, 1)
        # pad V to a lane multiple for friendlier TPU layouts
        vmax = -(-vmax // 128) * 128

        pos = np.full((D, C, vmax), INT32_MAX, dtype=np.int32)
        ref_code = np.zeros((D, C, vmax), dtype=np.int8)
        alt_code = np.zeros((D, C, vmax), dtype=np.int8)
        phase1 = np.zeros((D, C, vmax), dtype=np.int8)
        phase2 = np.zeros((D, C, vmax), dtype=np.int8)
        counts = np.zeros((D, C), dtype=np.int32)

        for (donor, chrom), t in tables.items():
            d = donors.index(donor)
            c = chrom_names.index(chrom)
            n = t.shape[0]
            if n == 0:
                continue
            starts = t["start"].astype(np.int64)
            order = np.argsort(starts, kind="stable")
            starts = starts[order]
            ref_b = np.frombuffer(t["ref"][order].tobytes(), dtype=np.uint8).reshape(n, 10)[:, 0]
            alt_b = np.frombuffer(t["alt"][order].tobytes(), dtype=np.uint8).reshape(n, 10)[:, 0]
            pos[d, c, :n] = starts.astype(np.int32)
            ref_code[d, c, :n] = BASE_LUT[ref_b]
            alt_code[d, c, :n] = BASE_LUT[alt_b]
            phase1[d, c, :n] = t["phase1"][order]
            phase2[d, c, :n] = t["phase2"][order]
            counts[d, c] = n

        return cls(
            donors=list(donors),
            chrom_names=list(chrom_names),
            pos=pos,
            ref_code=ref_code,
            alt_code=alt_code,
            phase1=phase1,
            phase2=phase2,
            counts=counts,
        )

    @classmethod
    def from_h5(
        cls,
        cohort_h5: str,
        donors: list[str] | None = None,
        chrom_names: list[str] | None = None,
    ) -> "CohortTensors":
        """Load a cohort HDF5 produced by the converter (or the reference)."""
        from haplohyped_tpu.storage.h5_reader import VCFH5Reader

        with VCFH5Reader(cohort_h5) as reader:
            if donors is None:
                donors = sorted(reader.donors())
            if chrom_names is None:
                nums = sorted(
                    {c for d in donors for c in reader.chromosomes(d)},
                    key=lambda x: (len(x), x),
                )
                chrom_names = [f"chr{c}" for c in nums]
            tables = {}
            for d in donors:
                for c in reader.chromosomes(d):
                    name = f"chr{c}"
                    if name in chrom_names:
                        tables[(d, name)] = reader.fetch_genotypes(d, c)
        return cls.from_structs(tables, donors, chrom_names)

    def device_arrays(self):
        """Return the jnp views used by the sampler kernels."""
        import jax.numpy as jnp

        return (
            jnp.asarray(self.pos),
            jnp.asarray(self.ref_code),
            jnp.asarray(self.alt_code),
            jnp.asarray(self.phase1),
            jnp.asarray(self.phase2),
            jnp.asarray(self.counts),
        )
