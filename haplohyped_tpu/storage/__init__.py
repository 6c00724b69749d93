from haplohyped_tpu.storage.blosc import (
    blosc_available,
    cohort_compression_kwargs,
    reference_compression_kwargs,
    register_blosc_filter,
)
from haplohyped_tpu.storage.h5_reader import VCFH5Reader
from haplohyped_tpu.storage.reference import ReferenceGenomeReader

__all__ = [
    "blosc_available",
    "cohort_compression_kwargs",
    "reference_compression_kwargs",
    "register_blosc_filter",
    "VCFH5Reader",
    "ReferenceGenomeReader",
]
