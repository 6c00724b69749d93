"""On-device tokenizer tests: must agree exactly with the framed-record
decode path on real corpora, and handle BGZF input + window overflow."""

import numpy as np
import pytest

from haplohyped_tpu.hostio import VCFSource, native
from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy
from haplohyped_tpu.ops.vcf_tokenize import choose_window, tokenize_vcf_device
from haplohyped_tpu.pipeline.records import (
    snp_struct_from_decoded,
    snp_struct_from_frames,
)

from tests.synth import make_corpus

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native hostio required"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("tok")), n_variants=500)


def _struct_via_tokenizer(vcf, sample, chrom):
    vt = native.vcf_text(vcf, threads=2)
    try:
        dec = tokenize_vcf_device(vt, sample)
        assert not dec["long_line"].any()
        return snp_struct_from_decoded(dec, dec["chrom"], chrom_filter=chrom)
    finally:
        vt.close()


def _struct_via_frames(vcf, sample, chrom):
    fr = VCFSource(vcf).frame(sample=sample, region=chrom)
    return snp_struct_from_frames(fr.records, decode_frames_numpy(fr.records))


class TestTokenizerAgreesWithFramer:
    def test_synth_corpus_all_samples(self, corpus):
        for sample in corpus["samples"]:
            a = _struct_via_tokenizer(corpus["vcf"], sample, corpus["chrom"])
            b = _struct_via_frames(corpus["vcf"], sample, corpus["chrom"])
            assert a.shape == b.shape
            assert np.array_equal(a, b), sample

    def test_reference_corpus(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        sample = VCFSource(vcf).samples()[2]
        a = _struct_via_tokenizer(vcf, sample, "chr22")
        b = _struct_via_frames(vcf, sample, "chr22")
        assert np.array_equal(a, b)

    def test_no_sample_mode(self, corpus):
        vt = native.vcf_text(corpus["vcf"])
        try:
            dec = tokenize_vcf_device(vt, None)
            s = snp_struct_from_decoded(
                dec, dec["chrom"], with_sample=False, chrom_filter=corpus["chrom"]
            )
        finally:
            vt.close()
        fr = VCFSource(corpus["vcf"]).frame(region=corpus["chrom"])
        b = snp_struct_from_frames(
            fr.records, decode_frames_numpy(fr.records, with_sample=False), with_sample=False
        )
        assert np.array_equal(s, b)


class TestVCFText:
    def test_lines_and_samples(self, corpus):
        vt = native.vcf_text(corpus["vcf"])
        try:
            assert vt.samples == corpus["samples"]
            assert vt.n_lines == 500  # n_variants incl. indels
            # offsets point at line starts; text at offset is chrom name
            t = vt.text
            o = vt.line_offsets
            assert bytes(t[o[0] : o[0] + 5]) == corpus["chrom"].encode()[:5]
            lens = vt.line_lengths
            assert (lens > 0).all()
        finally:
            vt.close()

    def test_unknown_sample_raises(self, corpus):
        vt = native.vcf_text(corpus["vcf"])
        try:
            with pytest.raises(RuntimeError, match="sample not found"):
                tokenize_vcf_device(vt, "ghost")
        finally:
            vt.close()


class TestWindow:
    def test_choose_window(self):
        assert choose_window(90) == 128
        assert choose_window(129) == 256
        assert choose_window(100_000, cap=4096) == 4096

    def test_long_line_flagged(self, tmp_path):
        import gzip

        vcf = tmp_path / "long.vcf.gz"
        big_info = "X" * 9000
        with gzip.open(vcf, "wt") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n")
            f.write(f"chr1\t100\t.\tA\tG\t.\t.\t{big_info}\tGT\t1|0\n")
            f.write("chr1\t200\t.\tC\tT\t.\t.\t.\tGT\t0|1\n")
        vt = native.vcf_text(str(vcf))
        try:
            dec = tokenize_vcf_device(vt, "s1", window_cap=4096)
            assert dec["long_line"].tolist() == [True, False]
            assert not dec["valid"][0]  # long line excluded from device decode
            assert dec["valid"][1] and dec["snp_mask"][1]
        finally:
            vt.close()


class TestBGZF:
    def test_bgzf_roundtrip(self, tmp_path, corpus):
        import gzip

        from bench import bgzf_write

        with gzip.open(corpus["vcf"], "rb") as f:
            text = f.read()
        bg = tmp_path / "c.bgzf.vcf.gz"
        bgzf_write(str(bg), text)
        # native reader must produce identical structs from the BGZF copy
        for threads in (1, 4):
            vt = native.vcf_text(str(bg), threads=threads)
            try:
                assert vt.samples == corpus["samples"]
                a = tokenize_vcf_device(vt, corpus["samples"][0])
            finally:
                vt.close()
            sa = snp_struct_from_decoded(a, a["chrom"], chrom_filter=corpus["chrom"])
            sb = _struct_via_tokenizer(corpus["vcf"], corpus["samples"][0], corpus["chrom"])
            assert np.array_equal(sa, sb)


class TestWideCohort:
    def test_many_samples_window_growth(self, tmp_path):
        """200-sample lines (~1.7 kB) force a bigger tokenizer window; the
        decode must stay exact for early, middle and last sample columns."""
        import gzip

        rng = np.random.default_rng(9)
        n_samples, n_var = 200, 500
        samples = [f"s{i:03d}" for i in range(n_samples)]
        gts = rng.integers(0, 2, size=(n_var, n_samples, 2))
        vcf = tmp_path / "wide.vcf.gz"
        with gzip.open(vcf, "wt") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples) + "\n")
            for i in range(n_var):
                row = "\t".join(f"{gts[i, s, 0]}|{gts[i, s, 1]}" for s in range(n_samples))
                f.write(f"chr9\t{1000 + i * 7}\trs{i}\tA\tG\t.\tPASS\t.\tGT\t{row}\n")

        for col in (0, 97, 199):
            vt = native.vcf_text(str(vcf))
            try:
                assert int(vt.line_lengths.max()) > 128  # window must grow
                dec = tokenize_vcf_device(vt, samples[col])
                assert not dec["long_line"].any()
                s = snp_struct_from_decoded(dec, dec["chrom"], chrom_filter="chr9")
            finally:
                vt.close()
            assert s.shape[0] == n_var
            assert np.array_equal(s["phase1"], gts[:, col, 0].astype(np.int8))
            assert np.array_equal(s["phase2"], gts[:, col, 1].astype(np.int8))


class TestReferenceRepoData:
    def test_reads_reference_shipped_corpus(self):
        """The reference repo's own bundled VCF must parse identically
        through our stack (cross-ecosystem file compatibility)."""
        import os

        path = "/root/reference/tests/data/chr22.filtered.vcf.gz"
        if not os.path.exists(path):
            pytest.skip("reference corpus not mounted")
        src = VCFSource(path)
        samples = src.samples()
        assert len(samples) == 3
        a = _struct_via_tokenizer(path, samples[0], "chr22")
        b = _struct_via_frames(path, samples[0], "chr22")
        assert a.shape[0] == 1000
        assert np.array_equal(a, b)
