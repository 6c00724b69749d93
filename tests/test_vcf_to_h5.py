"""Converter construction + end-to-end conversion on the synthetic corpus.

Carries the reference's ``tests/test_vcf_to_h5.py`` assertions, then goes
further: the reference could never run its converter in CI (native module
unbuilt); here the full conversion runs and the artifact is validated against
an independent parse.
"""

import os
import pathlib
import shutil
import tempfile

import numpy as np
import pytest

from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE
from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter
from haplohyped_tpu.storage import VCFH5Reader

from tests.test_vcf_decode import corpus_samples, reference_parse


class TestVCFtoHDF5Converter:
    def test_init(self):
        with tempfile.TemporaryDirectory() as tmpdir:
            sample_file = os.path.join(tmpdir, "samples.txt")
            with open(sample_file, "w") as f:
                f.write("sample1\nsample2\n")

            converter = VCFtoHDF5Converter(
                cohort_name="test_cohort",
                vcf_dir="/path/to/vcf",
                out_dir=tmpdir,
                sample_list_path=sample_file,
                cores=2,
                cxx_threads=1,
            )

            assert converter.cohort_name == "test_cohort"
            assert converter.cores == 2
            assert converter.cxx_threads == 1
            assert len(converter.donor_ids) == 2
            assert converter.donor_ids == ["sample1", "sample2"]
            assert os.path.exists(converter.tmp_dir)

    def test_read_sample_list(self):
        with tempfile.NamedTemporaryFile(mode="w", delete=False) as f:
            f.write("sample1\nsample2\nsample3\n")
            sample_file = f.name
        with tempfile.TemporaryDirectory() as tmpdir:
            try:
                converter = VCFtoHDF5Converter(
                    cohort_name="test",
                    vcf_dir="/path/to/vcf",
                    out_dir=tmpdir,
                    sample_list_path=sample_file,
                    cores=1,
                    cxx_threads=1,
                )
                assert converter.donor_ids == ["sample1", "sample2", "sample3"]
            finally:
                os.unlink(sample_file)

    def test_read_sample_list_file_not_found(self):
        with pytest.raises(FileNotFoundError):
            VCFtoHDF5Converter(
                cohort_name="test",
                vcf_dir="/path/to/vcf",
                out_dir="/tmp",
                sample_list_path="/nonexistent/file.txt",
                cores=1,
                cxx_threads=1,
            )


@pytest.fixture(scope="module")
def converted_cohort(tmp_path_factory):
    """Run the full conversion once for the module."""
    data_dir = "/root/reference/tests/data"
    local = os.path.join(os.path.dirname(__file__), "data")
    if os.path.exists(local):
        data_dir = local
    if not os.path.exists(os.path.join(data_dir, "chr22.filtered.vcf.gz")):
        pytest.skip("no corpus")
    outdir = str(tmp_path_factory.mktemp("cohort_out"))
    conv = VCFtoHDF5Converter(
        cohort_name="test_cohort",
        vcf_dir=data_dir,
        out_dir=outdir,
        sample_list_path=os.path.join(data_dir, "ipscs_samples_test.txt"),
        cores=2,
        cxx_threads=2,
        chromosomes=[22],
    )
    results = conv.run()
    return conv, results, data_dir


@pytest.mark.integration
class TestEndToEndConversion:
    def test_all_tasks_succeeded(self, converted_cohort):
        conv, results, _ = converted_cohort
        assert len(results) == 3  # 3 donors x 1 chromosome
        assert all(r.error is None for r in results)
        assert all(r.n_snps == 1000 for r in results)

    def test_final_artifact_layout(self, converted_cohort):
        conv, _, data_dir = converted_cohort
        samples = corpus_samples(pathlib.Path(data_dir))
        import h5py

        assert os.path.exists(conv.config.final_h5_path)
        with h5py.File(conv.config.final_h5_path, "r") as f:
            donors = sorted(f.keys())
            assert donors == sorted(f"donor_{s}" for s in samples)
            for d in donors:
                assert list(f[d].keys()) == ["chr_22"]
                dset = f[d]["chr_22"]["snp_data"]
                assert dset.dtype == SNP_STRUCT_DTYPE
                assert dset.shape == (1000,)

    def test_tmp_dir_cleaned(self, converted_cohort):
        conv, _, _ = converted_cohort
        assert not os.path.exists(conv.tmp_dir)

    @pytest.mark.parametrize("sample_idx", [0, 1, 2])
    def test_values_match_independent_parse(self, converted_cohort, sample_idx):
        conv, _, data_dir = converted_cohort
        sample = corpus_samples(pathlib.Path(data_dir))[sample_idx]
        expected = reference_parse(
            os.path.join(data_dir, "chr22.filtered.vcf.gz"), sample
        )
        with VCFH5Reader(conv.config.final_h5_path) as reader:
            struct = reader.fetch_genotypes(sample, 22)
        assert struct.shape[0] == len(expected)
        exp = np.array(
            [(e[0].encode(), e[1], e[2], e[3].encode(), e[4].encode(), e[5], e[6]) for e in expected],
            dtype=SNP_STRUCT_DTYPE,
        )
        assert np.array_equal(struct, exp)

    def test_reader_listing(self, converted_cohort):
        conv, _, data_dir = converted_cohort
        samples = corpus_samples(pathlib.Path(data_dir))
        with VCFH5Reader(conv.config.final_h5_path) as reader:
            assert sorted(reader.donors()) == sorted(samples)
            assert reader.chromosomes(samples[0]) == ["22"]
            with pytest.raises(KeyError):
                reader.fetch_genotypes("ghost", 22)

    def test_blosc_filter_in_pipeline(self, converted_cohort):
        conv, _, data_dir = converted_cohort
        samples = corpus_samples(pathlib.Path(data_dir))
        from haplohyped_tpu.storage import blosc_available

        if not blosc_available():
            pytest.skip("no native blosc filter on this machine")
        import h5py

        with h5py.File(conv.config.final_h5_path, "r") as f:
            dset = f[f"donor_{samples[0]}"]["chr_22"]["snp_data"]
            assert "32001" in dset._filters
            cd = dset._filters["32001"]
            # (filter_rev, blosc_fmt, typesize, chunkbytes, clevel, shuffle, lz4hc)
            assert cd[2] == SNP_STRUCT_DTYPE.itemsize
            assert cd[4:] == (5, 1, 2)


class TestResume:
    def test_resume_skips_existing(self, tmp_path, test_data_dir):
        data_dir = str(test_data_dir)
        conv = VCFtoHDF5Converter(
            cohort_name="rc",
            vcf_dir=data_dir,
            out_dir=str(tmp_path),
            sample_list_path=os.path.join(data_dir, "ipscs_samples_test.txt"),
            cores=1,
            cxx_threads=1,
            chromosomes=[22],
            resume=True,
        )
        sample0 = corpus_samples(test_data_dir)[0]
        r1 = conv.genotype_vcf_to_hdf5(conv.config.vcf_path(22), sample0, 22)
        assert not r1.skipped and r1.n_snps == 1000
        r2 = conv.genotype_vcf_to_hdf5(conv.config.vcf_path(22), sample0, 22)
        assert r2.skipped
        shutil.rmtree(conv.tmp_dir, ignore_errors=True)

    def test_missing_vcf_raises_and_is_recorded(self, tmp_path, test_data_dir):
        conv = VCFtoHDF5Converter(
            cohort_name="rc2",
            vcf_dir=str(tmp_path),  # no VCFs here
            out_dir=str(tmp_path),
            sample_list_path=str(test_data_dir / "ipscs_samples_test.txt"),
            cores=1,
            cxx_threads=1,
            chromosomes=[22],
        )
        with pytest.raises(Exception):
            conv.process_donor(corpus_samples(test_data_dir)[0])


class TestFailureIsolation:
    def test_one_bad_donor_does_not_sink_cohort(self, tmp_path, test_data_dir):
        """A failing donor is recorded; the rest of the cohort converts
        (the reference silently swallowed worker failures)."""
        samples = corpus_samples(test_data_dir)
        sample_file = tmp_path / "samples.txt"
        sample_file.write_text("\n".join([samples[0], "donor-that-does-not-exist"]) + "\n")
        conv = VCFtoHDF5Converter(
            cohort_name="partial",
            vcf_dir=str(test_data_dir),
            out_dir=str(tmp_path),
            sample_list_path=str(sample_file),
            cores=2,
            cxx_threads=1,
            chromosomes=[22],
        )
        results = conv.run()
        errs = [r for r in results if r.error is not None]
        oks = [r for r in results if r.error is None and not r.skipped]
        assert len(errs) == 1 and errs[0].donor_id == "donor-that-does-not-exist"
        assert len(oks) == 1 and oks[0].n_snps == 1000
        import h5py

        with h5py.File(conv.config.final_h5_path, "r") as f:
            assert list(f.keys()) == [f"donor_{samples[0]}"]
