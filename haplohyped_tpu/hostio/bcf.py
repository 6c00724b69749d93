"""BCF (binary VCF) input adapter.

Wraps the native BCF parser (cpp/bcf.cpp) into the same decoded-column
schema the tokenizer paths produce, so the rest of the pipeline (struct
assembly, cohort tensorisation) is format-agnostic — the binary-path
equivalent of vcfpp's transparent VCF/BCF reading.
"""

from __future__ import annotations

import numpy as np

from haplohyped_tpu.core.constants import BASE_LUT
from haplohyped_tpu.hostio import native


def is_bcf(path: str) -> bool:
    return native.native_available() and native.is_bcf(path)


def bcf_decoded_columns(path: str, sample: str | None, threads: int = 1) -> dict[str, np.ndarray]:
    """Parse a BCF into the tokenizer-compatible decoded-column dict."""
    raw = native.bcf_parse(path, sample, threads)
    n = raw["start"].shape[0]
    contigs = raw["contigs"]

    names = np.zeros((max(len(contigs), 1), 8), np.uint8)
    for i, c in enumerate(contigs):
        b = c.encode()[:8]
        names[i, : len(b)] = np.frombuffer(b, np.uint8)
    rid = np.clip(raw["rid"], 0, names.shape[0] - 1)
    chrom = names[rid]

    flags = raw["bcf_flags"]
    return {
        "start": raw["start"].astype(np.uint32),
        "stop": raw["stop"].astype(np.uint32),
        "ref_char": raw["ref_char"],
        "alt_char": raw["alt_char"],
        "ref_code": BASE_LUT[raw["ref_char"]],
        "alt_code": BASE_LUT[raw["alt_char"]],
        "phase1": raw["phase1"],
        "phase2": raw["phase2"],
        "phased": (flags & 8) != 0,
        "missing": (flags & 4) != 0,
        "snp_mask": (flags & 1) != 0,
        "valid": (flags & 2) != 0,
        "chrom": chrom,
        "chrom_len": (chrom != 0).sum(axis=1).astype(np.int32),
        "long_line": np.zeros(n, bool),
    }
