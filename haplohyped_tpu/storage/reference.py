"""Reference-genome HDF5 reader.

Reads the ``{chrom}/sequence`` layout the encoder writes (reference
``fasta_encoder.py:179``; the reference's dataset-side reader used a flat
layout — defect ledger SURVEY §2.9.11, resolved to the written artifact).
Also understands the optional ``{chrom}/codes`` int8 dataset this framework
adds for fast device loading.
"""

from __future__ import annotations

import numpy as np

from haplohyped_tpu.core.constants import (
    CODES_DATASET_NAME,
    SEQUENCE_DATASET_NAME,
)
from haplohyped_tpu.storage.blosc import register_blosc_filter


class ReferenceGenomeReader:
    def __init__(self, h5_file: str, encode_spec=None):
        import h5py

        from haplohyped_tpu.utils.common_utils import parse_encode_dict

        register_blosc_filter()
        self.h5_path = h5_file
        self.h5_file = h5py.File(h5_file, "r")
        self.encode_spec = parse_encode_dict(encode_spec)

    def chromosomes(self) -> list[str]:
        return list(self.h5_file.keys())

    def length(self, chrom: str) -> int:
        return self.h5_file[chrom][SEQUENCE_DATASET_NAME].shape[0]

    def get_sequence(self, chrom: str, start: int, end: int) -> np.ndarray:
        """One-hot slice ``(end-start, channels)`` (int8)."""
        seq = self.h5_file[chrom][SEQUENCE_DATASET_NAME][start:end]
        return np.asarray(seq, dtype=np.int8)

    def get_codes(self, chrom: str, start: int | None = None, end: int | None = None) -> np.ndarray:
        """Int8 base codes; prefers the ``codes`` dataset, falls back to
        argmax over the one-hot ``sequence``."""
        grp = self.h5_file[chrom]
        sl = slice(start, end)
        if CODES_DATASET_NAME in grp:
            return np.asarray(grp[CODES_DATASET_NAME][sl], dtype=np.int8)
        onehot = np.asarray(grp[SEQUENCE_DATASET_NAME][sl])
        return np.argmax(onehot, axis=1).astype(np.int8)

    def close(self) -> None:
        self.h5_file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
