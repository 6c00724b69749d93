"""Integration tests over the bundled synthetic corpus.

Carries the reference's ``tests/test_integration.py`` input-validation
assertions (VCF present with sane size bounds, FASTA header, exactly 20 BED
regions, exactly 3 UUID samples, HDF5 round-trip, BED parsing/dtypes) — and
unlike the reference, the conversion itself is exercised elsewhere in this
suite rather than left commented out."""

import os

import numpy as np
import pytest


class TestCorpusInputs:
    def test_vcf_files_exist(self, test_data_dir):
        vcf_file = test_data_dir / "chr22.filtered.vcf.gz"
        assert vcf_file.exists()
        size = os.path.getsize(vcf_file)
        assert size > 1000
        assert size < 1_000_000

    def test_reference_exists(self, test_data_dir):
        fasta_file = test_data_dir / "chr22.fasta"
        assert fasta_file.exists()
        with open(fasta_file) as f:
            assert f.readline().startswith(">")

    def test_bed_file_exists(self, test_data_dir):
        bed_file = test_data_dir / "test_regions.bed"
        assert bed_file.exists()
        with open(bed_file) as f:
            lines = [l for l in f if l.strip() and not l.startswith("#")]
        assert len(lines) == 20

    def test_sample_list_matches_vcf(self, test_data_dir):
        sample_file = test_data_dir / "ipscs_samples_test.txt"
        assert sample_file.exists()
        with open(sample_file) as f:
            samples = [line.strip() for line in f if line.strip()]
        assert len(samples) == 3
        for sample in samples:
            assert len(sample.split("-")) == 5  # UUID shape

    def test_samples_match_vcf_header(self, test_data_dir):
        from haplohyped_tpu.hostio import VCFSource

        with open(test_data_dir / "ipscs_samples_test.txt") as f:
            samples = [line.strip() for line in f if line.strip()]
        vcf_samples = VCFSource(str(test_data_dir / "chr22.filtered.vcf.gz")).samples()
        assert vcf_samples == samples


class TestHDF5Output:
    def test_create_simple_hdf5(self, tmp_path):
        import h5py

        from haplohyped_tpu.storage import cohort_compression_kwargs

        temp_file = str(tmp_path / "t.h5")
        data = np.random.default_rng(0).integers(0, 100, size=(100, 10)).astype(np.int32)
        with h5py.File(temp_file, "w") as f:
            f.create_dataset("test", data=data, **cohort_compression_kwargs())
        with h5py.File(temp_file, "r") as f:
            assert np.array_equal(data, f["test"][:])
        assert os.path.getsize(temp_file) > 0


class TestDatasetCompatibility:
    def test_bed_file_format(self, test_data_dir):
        from haplohyped_tpu.data.regions import load_bed_regions

        chroms, spans, uniq = load_bed_regions(str(test_data_dir / "test_regions.bed"))
        assert spans.shape[0] == 20
        assert spans.dtype == np.int64
        assert (spans[:, 1] > spans[:, 0]).all()
        assert uniq == ["chr22"]
