"""Frozen format constants shared by every layer.

These pin the on-disk artifact formats to the reference implementation so a
user of ``HaploHyped-VarAwareML`` can read/write the same files:

- SNP structured dtype:      reference ``src/haplohyped/vcf_to_h5.py:119-127``
- cohort HDF5 group layout:  reference ``src/haplohyped/vcf_to_h5.py:132-135``
  (``donor_{id}/chr_{n}/snp_data``)
- reference-genome layout:   reference ``src/haplohyped/fasta_encoder.py:179``
  (``{chrom}/sequence``)
- Blosc filter id + opts:    reference ``vcf_to_h5.py:134-135`` and
  ``fasta_encoder.py:91``
- encode spec default:       reference ``src/utils/common_utils.py:73``
  (``{A:0, C:1, G:2, T:3, N:4}``; one-hot channel order ``[A,C,G,T,N]``)
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Nucleotide encoding
# ---------------------------------------------------------------------------

#: Default base -> integer code mapping (column order of the one-hot channels).
DEFAULT_ENCODE_LIST: tuple[str, ...] = ("A", "C", "G", "T", "N")
DEFAULT_ENCODE_DICT: dict[str, int] = {b: i for i, b in enumerate(DEFAULT_ENCODE_LIST)}

#: Number of one-hot channels under the default spec.
NUM_CHANNELS: int = len(DEFAULT_ENCODE_LIST)

#: Code assigned to any base outside {A, C, G, T} (after uppercasing).
N_CODE: int = DEFAULT_ENCODE_DICT["N"]

#: 256-entry ASCII byte -> code lookup table (uppercase + lowercase mapped,
#: everything else -> N).  This is the device-side encode spec: kernels index
#: it with raw sequence bytes.
BASE_LUT: np.ndarray = np.full(256, N_CODE, dtype=np.int8)
for _b, _i in DEFAULT_ENCODE_DICT.items():
    BASE_LUT[ord(_b)] = _i
    BASE_LUT[ord(_b.lower())] = _i

#: Inverse: code -> uppercase ASCII byte.
CODE_TO_ASCII: np.ndarray = np.frombuffer(
    "".join(DEFAULT_ENCODE_LIST).encode(), dtype=np.uint8
).copy()

# ---------------------------------------------------------------------------
# SNP record struct (the cohort tensor row)
# ---------------------------------------------------------------------------

#: Structured dtype of one SNP record, bit-identical to the reference writer.
SNP_STRUCT_DTYPE = np.dtype(
    [
        ("chrom", "S5"),
        ("start", np.uint32),
        ("stop", np.uint32),
        ("ref", "S10"),
        ("alt", "S10"),
        ("phase1", np.int8),
        ("phase2", np.int8),
    ]
)

# ---------------------------------------------------------------------------
# HDF5 layouts + compression
# ---------------------------------------------------------------------------

#: HDF5 filter id of Blosc (the c-blosc HDF5 filter).
BLOSC_FILTER_ID: int = 32001

#: cd_values used by the cohort writer: (filter_version, blosc_version,
#: typesize, chunksize, clevel, shuffle, compcode).  clevel=5, byte shuffle,
#: compcode 2 = LZ4HC.  First four entries are overwritten by the filter's
#: ``set_local`` at dataset-create time.
COHORT_COMPRESSION_OPTS: tuple[int, ...] = (2, 2, 0, 0, 5, 1, 2)

#: cd_values used by the per-chromosome reference writer.
REFERENCE_COMPRESSION_OPTS: tuple[int, ...] = (0, 2, 0, 0, 5, 1, 2)

#: Blosc compcode -> compressor name (c-blosc convention).
BLOSC_COMPCODE_NAMES: tuple[str, ...] = (
    "blosclz",
    "lz4",
    "lz4hc",
    "snappy",
    "zlib",
    "zstd",
)

#: Dataset name holding SNP records inside a donor/chrom group.
SNP_DATASET_NAME: str = "snp_data"

#: Dataset name holding the one-hot sequence inside a chromosome group.
SEQUENCE_DATASET_NAME: str = "sequence"

#: Extra (non-reference) dataset holding int8 base codes for fast device loads.
CODES_DATASET_NAME: str = "codes"


def cohort_group_path(donor_id: str, chromosome: int | str) -> str:
    """HDF5 group path for one (donor, chromosome) SNP table."""
    return f"donor_{donor_id}/chr_{chromosome}"


def reference_dataset_path(chrom: str) -> str:
    """HDF5 dataset path for one chromosome's one-hot sequence."""
    return f"{chrom}/{SEQUENCE_DATASET_NAME}"


# ---------------------------------------------------------------------------
# Pipeline defaults
# ---------------------------------------------------------------------------

#: Autosomes processed by default (reference hardcodes range(1, 23)).
AUTOSOMES: tuple[int, ...] = tuple(range(1, 23))

#: Input VCF filename pattern, one file per chromosome, all samples inside.
VCF_FILENAME_PATTERN: str = "chr{chromosome}.filtered.vcf.gz"

#: Default training window length (reference ``haplotype_dataset.py:31``).
DEFAULT_SEQ_LENGTH: int = 1000
