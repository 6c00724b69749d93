"""Pallas framed-record decoder vs the numpy twin (interpret mode on CPU;
the same kernel compiles and matches on real TPU — see bench)."""

import numpy as np
import pytest

from haplohyped_tpu.hostio import VCFSource
from haplohyped_tpu.ops.pallas_decode import decode_frames_pallas
from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

from tests.test_vcf_decode import corpus_samples


COLUMNS = (
    "start", "stop", "ref_char", "alt_char", "phase1", "phase2",
    "snp_mask", "valid", "missing", "phased",
)


def test_matches_numpy_on_corpus(test_data_dir):
    vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
    sample = corpus_samples(test_data_dir)[0]
    fr = VCFSource(vcf).frame(sample=sample, region="chr22")
    out = decode_frames_pallas(fr.records, interpret=True)
    ref = decode_frames_numpy(fr.records)
    for k in COLUMNS:
        assert np.array_equal(out[k], np.asarray(ref[k]).astype(out[k].dtype)), k


def test_no_sample_mode(test_data_dir):
    vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
    fr = VCFSource(vcf).frame(region="chr22")
    out = decode_frames_pallas(fr.records, with_sample=False, interpret=True)
    ref = decode_frames_numpy(fr.records, with_sample=False)
    for k in ("start", "stop", "snp_mask", "valid"):
        assert np.array_equal(out[k], np.asarray(ref[k]).astype(out[k].dtype)), k


def test_edge_cases(test_data_dir):
    from haplohyped_tpu.hostio.frame_format import pack_frame

    frames = np.stack([
        pack_frame(b"chr1", b"100", b"A", b"G", b"./."),
        pack_frame(b"chr1", b"2147483600", b"C", b"T", b"1|1"),
        pack_frame(b"chr1", b"103", b"AT", b"G", b"1|0"),
        pack_frame(b"chr1", b"104", b"A", b"G", b"1"),
    ])
    out = decode_frames_pallas(frames, interpret=True)
    ref = decode_frames_numpy(frames)
    for k in COLUMNS:
        assert np.array_equal(out[k], np.asarray(ref[k]).astype(out[k].dtype)), k


class TestPallas12:
    """Compact 12-byte frame kernel vs the numpy twin."""

    def test_matches_numpy_on_corpus(self, test_data_dir):
        from haplohyped_tpu.ops.pallas_decode import decode_frames12_pallas
        from haplohyped_tpu.ops.vcf_decode import decode_frames12_numpy

        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        sample = corpus_samples(test_data_dir)[0]
        rec12, chroms, _ = VCFSource(vcf).frame12(sample=sample, region="chr22")
        out = decode_frames12_pallas(rec12, interpret=True)
        ref = decode_frames12_numpy(rec12)
        for k in COLUMNS + ("chrom_id",):
            assert np.array_equal(out[k], np.asarray(ref[k]).astype(out[k].dtype)), k

    def test_no_sample_mode(self, test_data_dir):
        from haplohyped_tpu.ops.pallas_decode import decode_frames12_pallas
        from haplohyped_tpu.ops.vcf_decode import decode_frames12_numpy

        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        rec12, _, _ = VCFSource(vcf).frame12(region="chr22")
        out = decode_frames12_pallas(rec12, with_sample=False, interpret=True)
        ref = decode_frames12_numpy(rec12, with_sample=False)
        for k in ("start", "stop", "snp_mask", "valid", "chrom_id"):
            assert np.array_equal(out[k], np.asarray(ref[k]).astype(out[k].dtype)), k
