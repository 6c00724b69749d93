"""Tuple-level parity API with the reference's native ``parse_vcf`` module.

The reference exposes ``VCFLoader.load_vcf(in_vcf, sample, chrom)`` and
``VCFLoader.load_vcf_without_sample(in_vcf, chrom)`` from a pybind11 module
(``cpp/parse_vcf.cpp:116-124``), returning lists of
``(CHROM, Start, End, REF, ALT, phase1, phase2)`` / 5-tuples.  Here the same
surface is backed by the hostio framer + device decode kernel.  Both the class
methods and module-level free functions are provided (the reference's Python
caller used the free-function form, defect ledger SURVEY §2.9.1).
"""

from __future__ import annotations

import numpy as np

from haplohyped_tpu.hostio.vcf import VCFSource
from haplohyped_tpu.pipeline.records import snp_struct_from_frames


def _load_struct(in_vcf: str, sample: str | None, chrom: str, threads: int = 1):
    src = VCFSource(in_vcf, threads=threads)
    framed = src.frame(sample=sample or None, region=chrom or None)
    from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

    decoded = decode_frames_numpy(framed.records, with_sample=sample is not None)
    return snp_struct_from_frames(framed.records, decoded, with_sample=sample is not None)


def load_vcf(in_vcf: str, sample: str, chrom: str = "") -> list[tuple]:
    """SNP 7-tuples for one sample: (chrom, start, stop, ref, alt, p1, p2)."""
    s = _load_struct(in_vcf, sample, chrom)
    return [
        (
            r["chrom"].decode(),
            int(r["start"]),
            int(r["stop"]),
            r["ref"].decode(),
            r["alt"].decode(),
            int(r["phase1"]),
            int(r["phase2"]),
        )
        for r in s
    ]


def load_vcf_without_sample(in_vcf: str, chrom: str = "") -> list[tuple]:
    """SNP 5-tuples without genotypes: (chrom, start, stop, ref, alt)."""
    s = _load_struct(in_vcf, None, chrom)
    return [
        (
            r["chrom"].decode(),
            int(r["start"]),
            int(r["stop"]),
            r["ref"].decode(),
            r["alt"].decode(),
        )
        for r in s
    ]


class VCFLoader:
    """Class form of the loader (reference binding surface)."""

    @staticmethod
    def load_vcf(in_vcf: str, sample: str, chrom: str = "") -> list[tuple]:
        return load_vcf(in_vcf, sample, chrom)

    @staticmethod
    def load_vcf_without_sample(in_vcf: str, chrom: str = "") -> list[tuple]:
        return load_vcf_without_sample(in_vcf, chrom)
