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


def bcf_samples(path: str, threads: int = 1) -> list[str]:
    return native.bcf_samples(path, threads)


def bcf_decoded_v2(
    path: str, samples: list[str], threads: int = 1
) -> tuple[dict[str, np.ndarray], list[str]]:
    """Single-pass multi-sample BCF parse in the ``decode_frames_v2``
    output schema: one file read extracts EVERY requested donor's genotype
    column — the BCF leg of the single-pass converter, so VCF and BCF of
    the same cohort flow through the same code path
    (``snp_structs_from_v2``).  Returns ``(decoded, chrom_table)``.

    Reference parity: vcfpp opens VCF/BCF transparently
    (``cpp/vcfpp.h:1380-1391``); the reference pipeline re-parsed per
    donor either way.
    """
    header = native.bcf_samples(path, threads)
    index_of = {s: i for i, s in enumerate(header)}
    missing = [s for s in samples if s not in index_of]
    if missing:
        raise RuntimeError(f"sample not found in BCF header: {missing[0]}")
    want = np.asarray([index_of[s] for s in samples], np.int32)
    raw = native.bcf_parse_v2(path, want, threads)
    contigs = raw["contigs"]
    rid = np.clip(raw["rid"], 0, max(len(contigs) - 1, 0))
    decoded = {
        "start": raw["start"].astype(np.uint32),
        "stop": raw["stop"].astype(np.uint32),
        "ref_char": raw["ref_char"],
        "alt_char": raw["alt_char"],
        "snp_mask": (raw["snp_flags"] & 1) != 0,
        "chrom_id": rid.astype(np.uint8),
        "valid": raw["valid"] != 0,
        "phase1": raw["phase1"],
        "phase2": raw["phase2"],
    }
    return decoded, contigs


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
