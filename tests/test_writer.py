"""VCF/BCF writer round-trips (vcfpp::BcfHeader/BcfWriter parity surface,
reference cpp/vcfpp.h:211-378, 1491-1660).

Everything written here is read back with the framework's own readers
(VCFSource text framer, native BCF parser, BgzfRangeReader, tabix builder) —
write→read equality is the contract.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pytest

from haplohyped_tpu.hostio import VCFSource, native
from haplohyped_tpu.hostio.bcf import bcf_decoded_columns, is_bcf
from haplohyped_tpu.hostio.bgzf import BgzfWriter, bgzf_compress, bgzf_write
from haplohyped_tpu.hostio.writer import BcfWriter, VcfHeader, VcfWriter


def _demo_header(samples=("s1", "s2")):
    h = VcfHeader("VCF4.2")
    h.add_contig("chr22", length=50_000)
    h.add_contig("chrX")
    h.add_filter("PASS", "All filters passed")
    h.add_info("AC", "A", "Integer", "Allele count")
    h.add_info("AF", "A", "Float", "Allele frequency")
    h.add_info("DB", "0", "Flag", "dbSNP membership")
    h.add_info("GENE", "1", "String", "Gene name")
    h.add_format("GT", "1", "String", "Genotype")
    h.set_samples(list(samples))
    return h


RECORDS = [
    # (chrom, pos1, ref, alt, id, qual, filters, info, gts, phased)
    ("chr22", 101, "A", "G", "rs1", 60.0, "PASS", {"AC": 2, "AF": 0.5}, [[0, 1], [1, 1]], True),
    ("chr22", 205, "C", "T", ".", None, "PASS", {"DB": True, "GENE": "BRCA"}, [[1, 0], [0, 0]], True),
    ("chr22", 300, "G", "A,C", ".", 10.5, "PASS", None, [[1, 2], [0, 1]], True),  # multi-allelic
    ("chr22", 412, "TA", "T", ".", None, "PASS", None, [[0, 1], [1, 1]], True),  # indel
    ("chr22", 500, "T", "C", ".", None, "PASS", None, [[-1, -1], [0, 1]], True),  # missing GT
    ("chr22", 6000, "G", "T", ".", 99.0, "PASS", {"AC": [1, 2]}, [[0, 0], [1, 0]], False),
]


def _write_all(path, mode=None):
    with VcfWriter(path, header=_demo_header(), mode=mode) as w:
        for chrom, pos, ref, alt, vid, qual, filt, info, gts, ph in RECORDS:
            w.write_record(chrom, pos, ref, alt, id=vid, qual=qual, filters=filt,
                           info=info, gts=np.array(gts), phased=ph)
    return path


# ---------------------------------------------------------------- header --


def test_header_builder_and_queries():
    h = _demo_header()
    assert h.get_seqnames() == ["chr22", "chrX"]
    assert h.get_samples() == ["s1", "s2"]
    assert h.info_type("AF") == "Float"
    text = h.as_string()
    assert text.startswith("##fileformat=VCF4.2\n")
    assert text.rstrip("\n").split("\n")[-1].split("\t")[:2] == ["#CHROM", "POS"]
    # round-trip through from_text
    h2 = VcfHeader.from_text(text)
    assert h2.get_seqnames() == h.get_seqnames()
    assert h2.get_samples() == h.get_samples()
    # removal (BcfHeader remove-line parity)
    h2.remove_contig("chrX")
    assert h2.get_seqnames() == ["chr22"]
    h2.remove_info("DB")
    assert h2.info_type("DB") is None
    assert h2.info_type("AC") == "Integer"


def test_header_bcf_dict_pass_is_zero():
    d = _demo_header().bcf_dict()
    assert d["PASS"] == 0
    assert d["GT"] > 0


def test_header_from_file_copies(tmp_path):
    p = _write_all(str(tmp_path / "h.vcf"))
    h = VcfHeader.from_file(p)
    assert h.get_samples() == ["s1", "s2"]
    assert "chr22" in h.get_seqnames()


# ------------------------------------------------------------------ text --


@pytest.mark.parametrize("suffix,mode", [("plain.vcf", None), ("bg.vcf.gz", None)])
def test_text_roundtrip_through_framer(tmp_path, suffix, mode):
    p = _write_all(str(tmp_path / suffix), mode=mode)
    src = VCFSource(p, use_native=False)
    assert src.samples() == ["s1", "s2"]
    assert src.seqnames() == ["chr22", "chrX"]
    fr = src.frame(sample="s2")
    assert fr.n == len(RECORDS)
    # native reader agrees when available
    if native.native_available():
        fr2 = VCFSource(p, use_native=True).frame(sample="s2")
        np.testing.assert_array_equal(fr.records, fr2.records)


def test_write_line_requires_contig(tmp_path):
    w = VcfWriter(str(tmp_path / "x.vcf"), header=_demo_header())
    with pytest.raises(RuntimeError, match="contig id chr9 not found"):
        w.write_line("chr9\t10\t.\tA\tG\t.\tPASS\t.")
    w.close()


def test_close_writes_header(tmp_path):
    p = str(tmp_path / "empty.vcf")
    VcfWriter(p, header=_demo_header()).close()
    with open(p) as f:
        assert f.read() == _demo_header().as_string()


# ------------------------------------------------------------------- bcf --


@pytest.mark.parametrize("mode", ["b", "bu"])
def test_bcf_roundtrip_matches_text(tmp_path, mode):
    if not native.native_available():
        pytest.skip("native shim unavailable")
    vcf_p = _write_all(str(tmp_path / "t.vcf"))
    bcf_p = str(tmp_path / "t.bcf")
    with BcfWriter(bcf_p, header=_demo_header(), mode=mode) as w:
        with open(vcf_p) as f:
            for line in f:
                if not line.startswith("#"):
                    w.write_line(line)
    assert is_bcf(bcf_p)
    for sample in ("s1", "s2"):
        cols = bcf_decoded_columns(bcf_p, sample)
        txt = VCFSource(vcf_p, use_native=False).frame(sample=sample)
        from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

        ref_cols = decode_frames_numpy(txt.records)
        np.testing.assert_array_equal(cols["start"], ref_cols["start"])
        np.testing.assert_array_equal(cols["snp_mask"], ref_cols["snp_mask"])
        np.testing.assert_array_equal(
            cols["phase1"][cols["snp_mask"]], ref_cols["phase1"][ref_cols["snp_mask"]]
        )
        np.testing.assert_array_equal(
            cols["phase2"][cols["snp_mask"]], ref_cols["phase2"][ref_cols["snp_mask"]]
        )


def test_bcf_stop_uses_ref_length(tmp_path):
    """End() = pos + rlen (vcfpp.h:1118-1127): the TA->T indel spans 2 bases."""
    if not native.native_available():
        pytest.skip("native shim unavailable")
    bcf_p = str(tmp_path / "s.bcf")
    with BcfWriter(bcf_p, header=_demo_header()) as w:
        w.write_record("chr22", 412, "TA", "T", gts=np.array([[0, 1], [1, 1]]))
    cols = bcf_decoded_columns(bcf_p, "s1")
    assert cols["start"][0] == 411
    assert cols["stop"][0] == 413
    assert not cols["snp_mask"][0]


# ------------------------------------------------------------------ bgzf --


def test_bgzf_compress_gzip_compatible():
    data = os.urandom(200_000) + b"tail" * 1000
    comp = bgzf_compress(data, level=4, threads=4)
    assert gzip.decompress(comp) == data


def test_bgzf_writer_streaming_and_virtual_offsets(tmp_path):
    p = str(tmp_path / "s.bin")
    payload = b"".join(f"line{i}\n".encode() for i in range(50_000))
    offs = []
    with BgzfWriter(p, level=1) as w:
        half = len(payload) // 2
        offs.append(w.tell_virtual())
        w.write(payload[:half])
        offs.append(w.tell_virtual())
        w.write(payload[half:])
        offs.append(w.tell_virtual())
    assert offs[0] == 0 and offs[0] < offs[1] < offs[2]
    with gzip.open(p, "rb") as f:
        assert f.read() == payload
    # virtual offsets decode: coffset points at a real block start (gzip magic)
    raw = open(p, "rb").read()
    for v in offs[1:]:
        coff = v >> 16
        assert raw[coff : coff + 2] == b"\x1f\x8b"


def test_bgzf_output_is_indexable(tmp_path):
    """A BGZF VCF from VcfWriter can be tabix-indexed and region-queried."""
    from haplohyped_tpu.hostio.tabix import build_index

    p = _write_all(str(tmp_path / "ix.vcf.gz"))
    idx = build_index(p)
    assert os.path.exists(idx)
    fr = VCFSource(p).frame(region="chr22:200-450")
    starts = [int(r) for r in _starts(fr.records)]
    assert starts == [204, 299, 411]


def _starts(records):
    from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

    return decode_frames_numpy(records)["start"]
