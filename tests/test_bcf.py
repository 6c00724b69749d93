"""BCF input tests: the native binary parser must produce identical SNP
structs to the text-VCF path for the same underlying records."""

import numpy as np
import pytest

from haplohyped_tpu.hostio import VCFSource, native
from haplohyped_tpu.hostio.bcf import bcf_decoded_columns, is_bcf
from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy
from haplohyped_tpu.pipeline.records import (
    snp_struct_from_decoded,
    snp_struct_from_frames,
)

from tests.bcf_writer import vcf_text_to_bcf
from tests.synth import make_corpus

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native hostio required"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(
        str(tmp_path_factory.mktemp("bcf")), n_variants=400, missing_rate=0.05
    )


@pytest.fixture(scope="module")
def bcf_path(corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bcf_out") / "cohort.bcf")
    return vcf_text_to_bcf(corpus["vcf"], out)


class TestDetection:
    def test_is_bcf(self, corpus, bcf_path):
        assert is_bcf(bcf_path)
        assert not is_bcf(corpus["vcf"])
        assert not is_bcf(corpus["fasta"])

    def test_samples(self, corpus, bcf_path):
        assert native.bcf_samples(bcf_path) == corpus["samples"]


class TestParsedValues:
    def test_matches_text_path(self, corpus, bcf_path):
        for sample in corpus["samples"]:
            dec = bcf_decoded_columns(bcf_path, sample, threads=2)
            got = snp_struct_from_decoded(dec, dec["chrom"], chrom_filter=corpus["chrom"])

            fr = VCFSource(corpus["vcf"]).frame(sample=sample, region=corpus["chrom"])
            expected = snp_struct_from_frames(fr.records, decode_frames_numpy(fr.records))
            assert got.shape == expected.shape
            assert np.array_equal(got, expected), sample

    def test_no_sample_mode(self, corpus, bcf_path):
        dec = bcf_decoded_columns(bcf_path, None)
        got = snp_struct_from_decoded(
            dec, dec["chrom"], with_sample=False, chrom_filter=corpus["chrom"]
        )
        fr = VCFSource(corpus["vcf"]).frame(region=corpus["chrom"])
        expected = snp_struct_from_frames(
            fr.records, decode_frames_numpy(fr.records, with_sample=False), with_sample=False
        )
        assert np.array_equal(got, expected)

    def test_unknown_sample_raises(self, bcf_path):
        with pytest.raises(RuntimeError, match="sample not found"):
            bcf_decoded_columns(bcf_path, "ghost")


class TestSinglePassV2:
    def test_multi_sample_matches_per_sample(self, corpus, bcf_path):
        """hh_bcf_parse_v2 (one pass, all donors) must equal the per-sample
        parse for every donor."""
        from haplohyped_tpu.hostio.bcf import bcf_decoded_v2
        from haplohyped_tpu.pipeline.records import snp_structs_from_v2

        decoded, contigs = bcf_decoded_v2(bcf_path, corpus["samples"], threads=2)
        structs = snp_structs_from_v2(
            decoded, contigs, corpus["samples"], chrom_filter=corpus["chrom"]
        )
        for sample in corpus["samples"]:
            dec = bcf_decoded_columns(bcf_path, sample, threads=2)
            expected = snp_struct_from_decoded(
                dec, dec["chrom"], chrom_filter=corpus["chrom"]
            )
            assert np.array_equal(structs[sample], expected), sample

    def test_unknown_sample_raises(self, bcf_path, corpus):
        from haplohyped_tpu.hostio.bcf import bcf_decoded_v2

        with pytest.raises(RuntimeError, match="sample not found"):
            bcf_decoded_v2(bcf_path, corpus["samples"][:1] + ["ghost"])

    def test_converter_single_pass_reads_once(self, corpus, bcf_path, tmp_path):
        """The converter routes BCF through the single-pass path: one
        native file read for ALL donors (not one per donor), and the
        artifact equals the text-VCF conversion of the same cohort."""
        import shutil

        import h5py

        from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter

        vcf_dir = tmp_path / "bcfs"
        vcf_dir.mkdir()
        shutil.copy(bcf_path, vcf_dir / "chr22.filtered.vcf.gz")

        before = native.DECOMPRESS_COUNT
        conv = VCFtoHDF5Converter(
            cohort_name="bcfsp",
            vcf_dir=str(vcf_dir),
            out_dir=str(tmp_path / "out_bcf"),
            sample_list_path=corpus["samples_file"],
            cores=1,
            cxx_threads=1,
            chromosomes=[22],
        )
        results = conv.run()
        assert all(r.error is None for r in results)
        # one read for the header/sample probe + one for the parse; never
        # one per donor (3 donors would be >= 3)
        reads = native.DECOMPRESS_COUNT - before
        assert reads <= 2, f"BCF read {reads} times for 3 donors"

        conv_vcf = VCFtoHDF5Converter(
            cohort_name="vcfsp",
            vcf_dir=corpus["dir"],
            out_dir=str(tmp_path / "out_vcf"),
            sample_list_path=corpus["samples_file"],
            cores=1,
            cxx_threads=1,
            chromosomes=[22],
            device_decode=False,
        )
        assert all(r.error is None for r in conv_vcf.run())
        with h5py.File(conv.config.final_h5_path) as fb, h5py.File(
            conv_vcf.config.final_h5_path
        ) as fv:
            assert sorted(fb.keys()) == sorted(fv.keys())
            for donor in fb.keys():
                np.testing.assert_array_equal(
                    fb[f"{donor}/chr_22/snp_data"][()],
                    fv[f"{donor}/chr_22/snp_data"][()],
                    err_msg=donor,
                )


class TestConverterIntegration:
    def test_converter_accepts_bcf(self, corpus, bcf_path, tmp_path):
        import os
        import shutil

        from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter
        from haplohyped_tpu.storage import VCFH5Reader

        # lay the BCF out under the expected per-chrom filename
        vcf_dir = tmp_path / "vcfs"
        vcf_dir.mkdir()
        shutil.copy(bcf_path, vcf_dir / "chr22.filtered.vcf.gz")
        conv = VCFtoHDF5Converter(
            cohort_name="bcfcohort",
            vcf_dir=str(vcf_dir),
            out_dir=str(tmp_path),
            sample_list_path=corpus["samples_file"],
            cores=1,
            cxx_threads=1,
            chromosomes=[22],
        )
        results = conv.run()
        assert all(r.error is None for r in results)
        with VCFH5Reader(conv.config.final_h5_path) as r:
            t = r.fetch_genotypes(corpus["samples"][0], 22)
        fr = VCFSource(corpus["vcf"]).frame(
            sample=corpus["samples"][0], region=corpus["chrom"]
        )
        expected = snp_struct_from_frames(fr.records, decode_frames_numpy(fr.records))
        assert np.array_equal(t, expected)
