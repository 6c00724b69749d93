"""Single-pass multi-sample conversion (BASELINE config 4: 100+ sample
cohort, sample-sharded streaming).

The reference loops donors, each loop re-opening and re-decompressing the
whole VCF (reference src/haplohyped/vcf_to_h5.py:142-152 — at 100 donors the
file is decompressed 100x).  The single-pass converter frames each
chromosome's file ONCE (v2 layout) and extracts every donor's genotype
column from that pass; these tests pin the O(1)-decompressions property via
the native decompress counter and bit-parity of the artifact against the
per-donor path.
"""

import os

import h5py
import numpy as np
import pytest

from haplohyped_tpu.hostio import native, native_available
from haplohyped_tpu.hostio.bgzf import bgzf_write
from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter

N_DONORS = 100
N_VARIANTS = 5_000


@pytest.fixture(scope="module")
def cohort_dir(tmp_path_factory):
    """Synthetic 100-donor, 5K-variant, single-chromosome BGZF cohort."""
    d = tmp_path_factory.mktemp("cohort100")
    rng = np.random.default_rng(11)
    donors = [f"donor-{i:04d}" for i in range(N_DONORS)]
    (d / "samples.txt").write_text("\n".join(donors) + "\n")
    bases = np.array(list("ACGT"))
    pos = np.cumsum(rng.integers(10, 400, size=N_VARIANTS)) + 100
    refs = bases[rng.integers(0, 4, size=N_VARIANTS)]
    alts = bases[(np.searchsorted(bases, refs) + rng.integers(1, 4, N_VARIANTS)) % 4]
    gts = np.array(["0|0", "0|1", "1|0", "1|1", "./."])[
        rng.integers(0, 5, size=(N_VARIANTS, N_DONORS))
    ]
    rows = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr1,length=3000000>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(donors),
    ]
    rows += [
        f"chr1\t{pos[i]}\t.\t{refs[i]}\t{alts[i]}\t.\tPASS\t.\tGT\t"
        + "\t".join(gts[i])
        for i in range(N_VARIANTS)
    ]
    bgzf_write(str(d / "chr1.filtered.vcf.gz"), ("\n".join(rows) + "\n").encode())
    return d


def _convert(cohort_dir, out_dir, *, single_pass: bool, device=False):
    conv = VCFtoHDF5Converter(
        cohort_name="sp" if single_pass else "pd",
        vcf_dir=str(cohort_dir),
        out_dir=str(out_dir),
        sample_list_path=str(cohort_dir / "samples.txt"),
        cores=2,
        cxx_threads=2,
        chromosomes=[1],
        device_decode=device,
        single_pass=single_pass,
    )
    results = conv.run()
    assert not any(r.error for r in results)
    return conv.config.final_h5_path, results


class TestSinglePassCohort:
    def test_one_decompression_for_100_donors(self, cohort_dir, tmp_path):
        """The whole 100-donor cohort converts with exactly ONE framing
        decompression of the chromosome file (+0: the header read is
        block-bounded and uncounted)."""
        if not native_available():
            pytest.skip("native hostio shim not built")
        before = native.DECOMPRESS_COUNT
        path, results = _convert(cohort_dir, tmp_path, single_pass=True)
        framings = native.DECOMPRESS_COUNT - before
        assert framings == 1, f"expected 1 framing decompression, got {framings}"
        assert len(results) == N_DONORS

        with h5py.File(path) as f:
            assert len(f.keys()) == N_DONORS
            one = f["donor_donor-0000/chr_1/snp_data"][()]
            assert one.shape[0] > 0

    def test_per_donor_path_is_o_donors(self, cohort_dir, tmp_path):
        """Contrast: the reference-shaped path decompresses once per donor
        (this is the behavior single-pass replaces)."""
        if not native_available():
            pytest.skip("native hostio shim not built")
        donors10 = cohort_dir / "samples10.txt"
        with open(cohort_dir / "samples.txt") as f:
            ten = [next(f).strip() for _ in range(10)]
        donors10.write_text("\n".join(ten) + "\n")
        conv = VCFtoHDF5Converter(
            cohort_name="pd10",
            vcf_dir=str(cohort_dir),
            out_dir=str(tmp_path),
            sample_list_path=str(donors10),
            cores=2,
            cxx_threads=2,
            chromosomes=[1],
            device_decode=False,
            single_pass=False,
        )
        before = native.DECOMPRESS_COUNT
        conv.run()
        framings = native.DECOMPRESS_COUNT - before
        assert framings >= 10  # one per donor

    def test_artifact_parity_with_per_donor_path(self, cohort_dir, tmp_path):
        """Single-pass and per-donor paths produce identical snp_data for
        every donor (value-level parity of the cohort artifact)."""
        sp_path, _ = _convert(cohort_dir, tmp_path / "sp", single_pass=True)
        pd_path, _ = _convert(cohort_dir, tmp_path / "pd", single_pass=False)
        with h5py.File(sp_path) as fs, h5py.File(pd_path) as fp:
            assert sorted(fs.keys()) == sorted(fp.keys())
            for donor in fs.keys():
                a = fs[f"{donor}/chr_1/snp_data"][()]
                b = fp[f"{donor}/chr_1/snp_data"][()]
                np.testing.assert_array_equal(a, b, err_msg=donor)

    def test_direct_write_equals_merge_write(self, cohort_dir, tmp_path):
        """The direct-to-final single-writer path produces the same
        datasets (values, dtype, Blosc cd_values, chunking) as the
        reference-shaped temp-file + merge path."""
        conv_kw = dict(
            vcf_dir=str(cohort_dir),
            sample_list_path=str(cohort_dir / "samples.txt"),
            cores=2,
            cxx_threads=2,
            chromosomes=[1],
            device_decode=False,
            single_pass=True,
        )
        direct = VCFtoHDF5Converter(
            cohort_name="dw", out_dir=str(tmp_path / "dw"),
            direct_write=True, **conv_kw,
        )
        merged = VCFtoHDF5Converter(
            cohort_name="mw", out_dir=str(tmp_path / "mw"),
            direct_write=False, **conv_kw,
        )
        assert not any(r.error for r in direct.run())
        assert not any(r.error for r in merged.run())
        # direct mode must not leave temp shards behind
        assert not os.path.exists(direct.tmp_dir) or not os.listdir(direct.tmp_dir)
        with h5py.File(direct.config.final_h5_path) as fd, h5py.File(
            merged.config.final_h5_path
        ) as fm:
            assert sorted(fd.keys()) == sorted(fm.keys())
            for donor in fd.keys():
                a = fd[f"{donor}/chr_1/snp_data"]
                b = fm[f"{donor}/chr_1/snp_data"]
                assert a.dtype == b.dtype
                assert a.compression == b.compression
                assert a.compression_opts == b.compression_opts
                assert a.chunks == b.chunks
                np.testing.assert_array_equal(a[()], b[()], err_msg=donor)

    def test_resume_skips_existing_shards(self, cohort_dir, tmp_path):
        conv = VCFtoHDF5Converter(
            cohort_name="spr",
            vcf_dir=str(cohort_dir),
            out_dir=str(tmp_path),
            sample_list_path=str(cohort_dir / "samples.txt"),
            cores=2,
            cxx_threads=2,
            chromosomes=[1],
            device_decode=False,
            single_pass=True,
            resume=True,
        )
        # pre-create one donor's shard: it must be skipped
        os.makedirs(conv.tmp_dir, exist_ok=True)
        pre = conv.tmp_h5_path("donor-0007", 1)
        with h5py.File(pre, "w") as f:
            f.create_group("donor_donor-0007/chr_1")
        results = conv.run(cleanup=False)
        skipped = [r for r in results if r.skipped]
        assert [r.donor_id for r in skipped] == ["donor-0007"]
        done = [r for r in results if not r.skipped and not r.error]
        assert len(done) == N_DONORS - 1

    def test_missing_donor_isolated(self, cohort_dir, tmp_path):
        """A donor absent from the VCF header fails alone; the rest of the
        cohort still converts (the reference's executor.map dropped worker
        failures silently)."""
        bad = cohort_dir / "samples_bad.txt"
        with open(cohort_dir / "samples.txt") as f:
            names = [line.strip() for line in f if line.strip()][:5]
        bad.write_text("\n".join(names + ["ghost-donor"]) + "\n")
        conv = VCFtoHDF5Converter(
            cohort_name="spb",
            vcf_dir=str(cohort_dir),
            out_dir=str(tmp_path),
            sample_list_path=str(bad),
            cores=2,
            cxx_threads=2,
            chromosomes=[1],
            device_decode=False,
            single_pass=True,
        )
        results = conv.run(cleanup=False)
        errs = [r for r in results if r.error]
        assert len(errs) == 1 and errs[0].donor_id == "ghost-donor"
        assert sum(1 for r in results if not r.error) == 5
        with h5py.File(conv.config.final_h5_path) as f:
            assert len(f.keys()) == 5


class TestDirectWriteCrashRecovery:
    """A direct-write run that dies mid-write leaves a partial cohort file;
    rerunning with resume=True must rebuild a COMPLETE, correct artifact
    (resume routes through per-shard temp files + a truncating merge)."""

    def test_failed_direct_run_then_resume(self, cohort_dir, tmp_path, monkeypatch):
        import h5py

        from haplohyped_tpu.pipeline import vcf_to_h5 as V

        real = V.write_dataset_direct
        calls = {"n": 0}

        def flaky(group, name, data, kw, workers=4):
            calls["n"] += 1
            if calls["n"] == 3:  # die on the 3rd donor's write
                raise OSError("injected disk failure")
            return real(group, name, data, kw, workers=workers)

        monkeypatch.setattr(V, "write_dataset_direct", flaky)
        crashed = VCFtoHDF5Converter(
            cohort_name="cr",
            vcf_dir=str(cohort_dir),
            out_dir=str(tmp_path),
            sample_list_path=str(cohort_dir / "samples.txt"),
            cores=1,
            cxx_threads=2,
            chromosomes=[1],
            device_decode=False,
        )
        results = crashed.run()
        assert any(r.error for r in results)

        monkeypatch.setattr(V, "write_dataset_direct", real)
        resumed = VCFtoHDF5Converter(
            cohort_name="cr",
            vcf_dir=str(cohort_dir),
            out_dir=str(tmp_path),
            sample_list_path=str(cohort_dir / "samples.txt"),
            cores=1,
            cxx_threads=2,
            chromosomes=[1],
            device_decode=False,
            resume=True,
        )
        results = resumed.run()
        assert not any(r.error for r in results)

        clean_dir = tmp_path / "clean"
        clean = VCFtoHDF5Converter(
            cohort_name="cr",
            vcf_dir=str(cohort_dir),
            out_dir=str(clean_dir),
            sample_list_path=str(cohort_dir / "samples.txt"),
            cores=1,
            cxx_threads=2,
            chromosomes=[1],
            device_decode=False,
        )
        assert not any(r.error for r in clean.run())
        with h5py.File(resumed.config.final_h5_path) as fa, h5py.File(
            clean.config.final_h5_path
        ) as fb:
            assert sorted(fa.keys()) == sorted(fb.keys())
            for donor in fb.keys():
                np.testing.assert_array_equal(
                    fa[f"{donor}/chr_1/snp_data"][()],
                    fb[f"{donor}/chr_1/snp_data"][()],
                    err_msg=donor,
                )
