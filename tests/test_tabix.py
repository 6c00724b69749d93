"""Tabix index build/read + indexed region streaming."""

import gzip
import os

import numpy as np
import pytest

from haplohyped_tpu.hostio import native
from haplohyped_tpu.hostio.tabix import (
    TabixIndex,
    build_index,
    reg2bin,
    region_virtual_offset,
)
from haplohyped_tpu.ops.vcf_stream import tokenize_vcf_streaming
from haplohyped_tpu.pipeline.records import snp_struct_from_decoded

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native hostio required"
)


@pytest.fixture(scope="module")
def multichrom_vcf(tmp_path_factory):
    """A multi-chromosome BGZF VCF large enough to span many blocks."""
    from bench import bgzf_write

    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("tbx")
    lines = [
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
    ]
    truth = {}
    for chrom in ("chr1", "chr2", "chr3"):
        positions = np.sort(rng.choice(np.arange(100, 5_000_000), 20_000, replace=False))
        truth[chrom] = positions
        for i, p in enumerate(positions):
            ref, alt = ("A", "G") if i % 2 else ("C", "T")
            gt = ("0|1", "1|0", "1|1")[i % 3]
            lines.append(f"{chrom}\t{p + 1}\trs{i}\t{ref}\t{alt}\t.\tPASS\t.\tGT\t{gt}\n")
    path = str(d / "multi.vcf.gz")
    bgzf_write(path, "".join(lines).encode())
    return path, truth


class TestRegBin:
    def test_reg2bin_levels(self):
        assert reg2bin(0, 1) == 4681
        assert reg2bin(0, 1 << 14) == 4681
        assert reg2bin(0, (1 << 14) + 1) == 585
        assert reg2bin(1 << 26, (1 << 26) + 1) == 4681 + (1 << 12)


class TestBuildAndLoad:
    def test_roundtrip(self, multichrom_vcf):
        path, truth = multichrom_vcf
        tbi = build_index(path)
        assert os.path.exists(tbi)
        idx = TabixIndex.load(tbi)
        assert idx.names == ["chr1", "chr2", "chr3"]
        for chrom in idx.names:
            assert idx.min_offset(chrom, 0) is not None
        # min offset for later chrom must be strictly greater
        assert idx.min_offset("chr3", 0) > idx.min_offset("chr1", 0)
        # chunks cover queries
        assert idx.query_chunks("chr2", 1_000_000, 1_100_000)

    def test_region_virtual_offset_none_without_index(self, tmp_path):
        assert region_virtual_offset(str(tmp_path / "nope.vcf.gz"), "chr1") is None


class TestIndexedStreaming:
    def test_seeked_region_matches_full_scan(self, multichrom_vcf):
        path, truth = multichrom_vcf
        build_index(path)

        beg, end = 2_000_000, 3_000_000
        dec_full = tokenize_vcf_streaming(path, "s1", threads=2)
        full = snp_struct_from_decoded(dec_full, dec_full["chrom"], chrom_filter="chr2")
        keep = (full["start"] >= beg) & (full["start"] < end)
        expected = full[keep]

        dec_idx = tokenize_vcf_streaming(
            path, "s1", threads=2, chunk_bytes=1 << 20, region=("chr2", beg, end)
        )
        got = snp_struct_from_decoded(dec_idx, dec_idx["chrom"], chrom_filter="chr2")
        gkeep = (got["start"] >= beg) & (got["start"] < end)
        got = got[gkeep]
        assert got.shape[0] == expected.shape[0] > 0
        assert np.array_equal(got, expected)
        # the indexed scan should have decoded far fewer records
        assert dec_idx["start"].shape[0] < dec_full["start"].shape[0] / 2


class TestCSI:
    def test_csi_build_load_and_seek(self, multichrom_vcf):
        import os

        from haplohyped_tpu.hostio.tabix import CSIIndex, build_index

        path, truth = multichrom_vcf
        csi = build_index(path, fmt="csi")
        assert csi.endswith(".csi") and os.path.exists(csi)
        idx = CSIIndex.load(csi)
        assert idx.names == ["chr1", "chr2", "chr3"]
        assert idx.min_shift == 14 and idx.depth == 5
        o1 = idx.min_offset("chr1", 0)
        o3 = idx.min_offset("chr3", 0)
        assert o1 is not None and o3 is not None and o3 > o1
        # seek consistency with the .tbi linear index
        from haplohyped_tpu.hostio.tabix import TabixIndex

        tbi = build_index(path, fmt="tbi")
        tidx = TabixIndex.load(tbi)
        for chrom in idx.names:
            for beg in (0, 1_000_000, 4_000_000):
                co = idx.min_offset(chrom, beg)
                to = tidx.min_offset(chrom, beg)
                # CSI bin loffsets can be coarser (earlier) than the 16kb
                # linear index but must never skip past it
                assert co is not None and co <= to

    def test_csi_used_when_tbi_absent(self, multichrom_vcf, tmp_path):
        import shutil

        from haplohyped_tpu.hostio.tabix import build_index, region_virtual_offset

        path, _ = multichrom_vcf
        vcf2 = str(tmp_path / "m.vcf.gz")
        shutil.copy(path, vcf2)
        build_index(vcf2, fmt="csi")
        vo = region_virtual_offset(vcf2, "chr2", 1_000_000)
        assert vo is not None and vo > 0
