"""Compact 12-byte frame path: native framer vs 64-byte-derived fallback,
device decode parity, chrom-table semantics, and edge cases.

The compact layout (cpp/hostio.cpp pack_rec12 / frame_format.py REC12_*) is
the SNP-pipeline fast path: it ships 5.3x fewer bytes to the accelerator
than the 64-byte layout while preserving the reference decode semantics
(vcfpp.h:990-1000 SNP predicate, :508-531 genotype/phase decode).
"""

import numpy as np
import pytest

from haplohyped_tpu.hostio import VCFSource, native_available
from haplohyped_tpu.hostio.frame_format import (
    REC12_SIZE,
    frames12_from_frames64,
    frames12_to_fields,
)
from haplohyped_tpu.ops.vcf_decode import (
    decode_frames,
    decode_frames12,
    decoded_to_numpy,
)


def corpus_samples(data_dir) -> list[str]:
    with open(data_dir / "ipscs_samples_test.txt") as f:
        return [line.strip() for line in f if line.strip()]


EDGE_VCF = """##fileformat=VCFv4.2
##contig=<ID=chr1,length=1000000>
##contig=<ID=chr2,length=1000000>
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2
chr1\t100\t.\tA\tG\t.\tPASS\t.\tGT\t0|1\t1|1
chr1\t200\t.\tC\tT\t.\tPASS\t.\tGT\t./.\t0/1
chr1\t300\t.\tG\tA,T\t.\tPASS\t.\tGT\t1|2\t0|0
chr1\t400\t.\tGTC\tG\t.\tPASS\t.\tGT\t0|1\t1|0
chr2\t500\t.\tT\tC\t.\tPASS\t.\tGT:DP\t1/0:30\t0|1:12
chr2\t1234567890\t.\tA\tC\t.\tPASS\t.\tGT\t0|0\t1|1
"""


@pytest.fixture
def edge_vcf(tmp_path):
    p = tmp_path / "edge.vcf"
    p.write_text(EDGE_VCF)
    return str(p)


class TestFrame12Layout:
    def test_native_matches_fallback(self, test_data_dir):
        """Native pack_rec12 output == numpy derivation from 64B frames."""
        if not native_available():
            pytest.skip("native hostio shim not built")
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        sample = corpus_samples(test_data_dir)[0]
        src = VCFSource(vcf, threads=2)
        rec12, chroms, seen = src.frame12(sample=sample)
        framed64 = src.frame(sample=sample)
        derived, chroms2 = frames12_from_frames64(framed64.records)
        assert chroms == chroms2 == ["chr22"]
        assert seen == framed64.total_seen
        assert rec12.shape == (framed64.n, REC12_SIZE)
        np.testing.assert_array_equal(rec12, derived)

    def test_python_fallback_path(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        sample = corpus_samples(test_data_dir)[0]
        nat = VCFSource(vcf, use_native=False)
        rec12, chroms, _ = nat.frame12(sample=sample)
        assert chroms == ["chr22"]
        assert rec12.shape[1] == REC12_SIZE

    def test_edge_cases(self, edge_vcf):
        src = VCFSource(edge_vcf)
        rec12, chroms, seen = src.frame12(sample="s1")
        assert seen == 6
        assert chroms == ["chr1", "chr2"]
        f = frames12_to_fields(rec12)
        dec = {
            k: np.asarray(v)
            for k, v in decode_frames12(rec12).items()
        }
        # chrom ids follow first-seen order
        np.testing.assert_array_equal(f["chrom_id"], [0, 0, 0, 0, 1, 1])
        np.testing.assert_array_equal(
            dec["start"], [99, 199, 299, 399, 499, 1234567889]
        )
        # SNP predicate: multiallelic (A,T) and indel (GTC) fail
        np.testing.assert_array_equal(
            dec["snp_mask"], [True, True, False, False, True, True]
        )
        # stop = start + ref_len (indel: 399 + 3)
        assert dec["stop"][3] == 402
        # GT decode: missing ./. -> (1, 0) + missing flag (vcfpp.h:512-517);
        # 1|2 -> both-nonzero presence; unphased 1/0 keeps values, phased=False
        np.testing.assert_array_equal(dec["phase1"], [0, 1, 1, 0, 1, 0])
        np.testing.assert_array_equal(dec["phase2"], [1, 0, 1, 1, 0, 0])
        np.testing.assert_array_equal(
            dec["missing"], [False, True, False, False, False, False]
        )
        np.testing.assert_array_equal(
            dec["phased"], [True, False, True, True, False, True]
        )
        assert dec["valid"].all()

    def test_second_sample_with_format_subfield(self, edge_vcf):
        """GT extraction for sample 2 incl. a GT:DP line (subfield split)."""
        dec = {
            k: np.asarray(v)
            for k, v in decode_frames12(VCFSource(edge_vcf).frame12(sample="s2")[0]).items()
        }
        np.testing.assert_array_equal(dec["phase1"], [1, 0, 0, 1, 0, 1])
        np.testing.assert_array_equal(dec["phase2"], [1, 1, 0, 0, 1, 1])

    def test_region_filter(self, edge_vcf):
        rec12, chroms, _ = VCFSource(edge_vcf).frame12(sample="s1", region="chr2")
        assert chroms == ["chr2"]
        dec = {k: np.asarray(v) for k, v in decode_frames12(rec12).items()}
        np.testing.assert_array_equal(dec["start"], [499, 1234567889])


class TestDecode12Parity:
    @pytest.mark.parametrize("sample_idx", [0, 1, 2])
    def test_corpus_parity_vs_frame64(self, test_data_dir, sample_idx):
        """decode_frames12 == decode_frames on the bundled corpus."""
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        sample = corpus_samples(test_data_dir)[sample_idx]
        src = VCFSource(vcf)
        rec12, chroms, _ = src.frame12(sample=sample, region="chr22")
        framed = src.frame(sample=sample, region="chr22")
        d64 = decoded_to_numpy(decode_frames(framed.records))
        d24 = {k: np.asarray(v) for k, v in decode_frames12(rec12).items()}
        assert rec12.shape[0] == framed.n
        for k in (
            "start",
            "stop",
            "ref_char",
            "alt_char",
            "ref_code",
            "alt_code",
            "phase1",
            "phase2",
            "phased",
            "missing",
            "snp_mask",
            "valid",
        ):
            np.testing.assert_array_equal(d24[k], d64[k], err_msg=k)

    def test_overlong_pos_marked_malformed(self, tmp_path):
        """An 11-digit POS can't be a valid int32 VCF POS -> valid=False."""
        p = tmp_path / "long.vcf"
        p.write_text(
            "##fileformat=VCFv4.2\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
            "chr1\t12345678901\t.\tA\tG\t.\tPASS\t.\tGT\t0|1\n"
        )
        rec12, _, _ = VCFSource(str(p)).frame12(sample="s1")
        dec = {k: np.asarray(v) for k, v in decode_frames12(rec12).items()}
        assert not dec["valid"][0]
