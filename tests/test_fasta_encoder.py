"""FASTA encoder tests (the reference documents this module but never
shipped it — ``docs/ARCHITECTURE.md:269-278``)."""

import os

import numpy as np
import pytest

from haplohyped_tpu.core.config import FastaEncodeConfig
from haplohyped_tpu.hostio import FastaReader
from haplohyped_tpu.pipeline.fasta_encoder import (
    HDF5Handler,
    ReferenceGenome,
    encode_fasta,
)
from haplohyped_tpu.storage import ReferenceGenomeReader
from haplohyped_tpu.utils import encode_sequence, nucleotide_to_index


@pytest.fixture(scope="module")
def encoded_reference(tmp_path_factory):
    data_dir = "/root/reference/tests/data"
    local = os.path.join(os.path.dirname(__file__), "data")
    if os.path.exists(local):
        data_dir = local
    fasta = os.path.join(data_dir, "chr22.fasta")
    if not os.path.exists(fasta):
        pytest.skip("no corpus")
    outdir = str(tmp_path_factory.mktemp("ref_out"))
    cfg = FastaEncodeConfig(
        fasta_path=fasta, out_dir=outdir, cores=2, chromosomes=("chr22",)
    )
    path = encode_fasta(cfg)
    return path, fasta


@pytest.mark.integration
class TestEncodeFasta:
    def test_layout(self, encoded_reference):
        import h5py

        path, _ = encoded_reference
        with h5py.File(path, "r") as f:
            assert list(f.keys()) == ["chr22"]
            assert set(f["chr22"].keys()) == {"sequence", "codes"}
            seq = f["chr22"]["sequence"]
            assert seq.shape[1] == 5
            assert seq.shape[0] in (400_000, 1_000_000)  # local vs reference corpus

    def test_onehot_matches_host_encoder(self, encoded_reference):
        path, fasta = encoded_reference
        with FastaReader(fasta) as fa:
            raw = fa.fetch("chr22", 1000, 3000)
        expected = encode_sequence(raw.decode())
        with ReferenceGenomeReader(path) as ref:
            got = ref.get_sequence("chr22", 1000, 3000)
        assert np.array_equal(got, expected.astype(np.int8))

    def test_codes_match_onehot(self, encoded_reference):
        path, _ = encoded_reference
        with ReferenceGenomeReader(path) as ref:
            n = ref.length("chr22")
            onehot = ref.get_sequence("chr22", n - 1000, n)
            codes = ref.get_codes("chr22", n - 1000, n)
        assert onehot.shape[0] == 1000
        assert np.array_equal(codes, np.argmax(onehot, axis=1))

    def test_rows_sum_to_one(self, encoded_reference):
        path, _ = encoded_reference
        with ReferenceGenomeReader(path) as ref:
            onehot = ref.get_sequence("chr22", 0, 100_000)
        assert np.array_equal(onehot.sum(axis=1), np.ones(100_000))

    def test_tmp_dir_cleaned(self, encoded_reference):
        path, _ = encoded_reference
        assert not os.path.exists(os.path.join(os.path.dirname(path), "tmp_chrom_files"))


class TestReferenceGenomeClass:
    def test_encode_sequence_api(self):
        rg = ReferenceGenome()
        out = rg.encode_sequence("acgtn")
        assert out.shape == (5, 5)
        assert np.array_equal(np.argmax(out, axis=1), [0, 1, 2, 3, 4])

    def test_load_chromosome_and_get_sequence(self, tmp_path, test_data_dir):
        fasta = str(test_data_dir / "chr22.fasta")
        rg = ReferenceGenome(fasta_file=fasta, output_dir=str(tmp_path))
        chrom, path = rg.load_chromosome("chr22")
        assert chrom == "chr22" and os.path.exists(path)
        rg.genome_files = [(chrom, path)]
        seq = rg.get_sequence("chr22", 0, 10)
        with FastaReader(fasta) as fa:
            raw = fa.fetch("chr22", 0, 10)
        codes = nucleotide_to_index(raw.decode())
        assert np.array_equal(np.argmax(seq, axis=1), codes)


class TestFastaReader:
    def test_clamping(self, test_data_dir):
        fa = FastaReader(str(test_data_dir / "chr22.fasta"))
        n = fa.length("chr22")
        assert fa.fetch("chr22", n - 5, n + 100) == fa.fetch("chr22", n - 5, n)
        assert fa.fetch("chr22", -10, 5) == fa.fetch("chr22", 0, 5)
        fa.close()

    def test_multirecord_and_gzip(self, tmp_path):
        import gzip as gz

        p = tmp_path / "multi.fa"
        p.write_text(">a desc\nACGTAC\nGTAC\n>b\nTTTT\nGG\n")
        for path in (p, tmp_path / "multi.fa.gz"):
            if str(path).endswith(".gz"):
                with gz.open(path, "wb") as f:
                    f.write(p.read_bytes())
            for use_native in (True, False):
                fa = FastaReader(str(path), use_native=use_native)
                assert fa.names() == ["a", "b"]
                assert fa.length("a") == 10
                assert fa.fetch("a", 2, 8) == b"GTACGT"
                assert fa.fetch("b") == b"TTTTGG"
                fa.close()
