"""Decode kernel tests: device decode vs numpy twin vs an independent
pure-Python VCF parse of the bundled synthetic corpus."""

import gzip

import numpy as np
import pytest

from haplohyped_tpu.hostio import VCFSource, frames_to_fields
from haplohyped_tpu.hostio.frame_format import pack_frame
from haplohyped_tpu.ops.vcf_decode import (
    decode_frames,
    decode_frames_numpy,
    decoded_to_numpy,
)
from haplohyped_tpu.pipeline.records import snp_struct_from_frames

def corpus_samples(data_dir) -> list[str]:
    with open(data_dir / "ipscs_samples_test.txt") as f:
        return [line.strip() for line in f if line.strip()]


SAMPLE_IDXS = [0, 1, 2]


def reference_parse(vcf_path, sample):
    """Independent slow parse implementing the reference's intended
    semantics (vcfpp.h:990-1000 SNP filter, :508-531 GT decode)."""
    out = []
    with gzip.open(vcf_path, "rt") as f:
        sample_idx = None
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("#CHROM"):
                cols = line.split("\t")[9:]
                sample_idx = cols.index(sample)
                continue
            if line.startswith("#") or not line:
                continue
            fields = line.split("\t")
            chrom, pos, _, ref, alt = fields[0], int(fields[1]), fields[2], fields[3], fields[4]
            if len(ref) > 1 or "," in alt or alt not in "ACGT" or len(alt) != 1:
                continue
            gt = fields[9 + sample_idx].split(":")[0]
            if "." in gt:
                p1, p2 = 1, 0
            else:
                a1, a2 = gt.replace("|", "/").split("/")
                p1, p2 = int(int(a1) != 0), int(int(a2) != 0)
            out.append((chrom, pos - 1, pos - 1 + len(ref), ref, alt, p1, p2))
    return out


class TestDecodeAgainstIndependentParse:
    @pytest.mark.parametrize("sample_idx", SAMPLE_IDXS)
    def test_struct_matches(self, test_data_dir, sample_idx):
        sample = corpus_samples(test_data_dir)[sample_idx]
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        expected = reference_parse(vcf, sample)
        framed = VCFSource(vcf).frame(sample=sample, region="chr22")
        decoded = decoded_to_numpy(decode_frames(framed.records))
        struct = snp_struct_from_frames(framed.records, decoded)
        assert struct.shape[0] == len(expected)
        for i in (0, 1, len(expected) // 2, -1):
            e = expected[i]
            s = struct[i]
            assert s["chrom"] == e[0].encode()
            assert s["start"] == e[1]
            assert s["stop"] == e[2]
            assert s["ref"] == e[3].encode()
            assert s["alt"] == e[4].encode()
            assert s["phase1"] == e[5]
            assert s["phase2"] == e[6]
        # full-column equality
        assert np.array_equal(struct["start"], np.array([e[1] for e in expected], np.uint32))
        assert np.array_equal(struct["phase1"], np.array([e[5] for e in expected], np.int8))
        assert np.array_equal(struct["phase2"], np.array([e[6] for e in expected], np.int8))


class TestDeviceNumpyAgreement:
    def test_device_vs_numpy(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        framed = VCFSource(vcf).frame(sample=corpus_samples(test_data_dir)[0], region="chr22")
        dev = decoded_to_numpy(decode_frames(framed.records))
        ref = decode_frames_numpy(framed.records)
        for k in ref:
            assert np.array_equal(dev[k], ref[k]), k


def _mk_frames(rows):
    return np.stack([pack_frame(*r) for r in rows])


class TestDecodeEdgeCases:
    def test_missing_genotype_codes_het(self):
        frames = _mk_frames(
            [
                (b"chr1", b"100", b"A", b"G", b"./."),
                (b"chr1", b"101", b"A", b"G", b".|."),
                (b"chr1", b"102", b"A", b"G", b".|1"),
                (b"chr1", b"103", b"A", b"G", b"1|."),
            ]
        )
        d = decode_frames_numpy(frames)
        assert np.array_equal(d["phase1"], [1, 1, 1, 1])
        assert np.array_equal(d["phase2"], [0, 0, 0, 0])
        assert d["missing"].all()

    def test_allele_presence_not_index(self):
        # any non-zero allele index counts as ALT presence (vcfpp.h:524)
        frames = _mk_frames(
            [
                (b"chr1", b"100", b"A", b"G", b"2|0"),
                (b"chr1", b"101", b"A", b"G", b"0/1"),
            ]
        )
        d = decode_frames_numpy(frames)
        assert np.array_equal(d["phase1"], [1, 0])
        assert np.array_equal(d["phase2"], [0, 1])
        assert np.array_equal(d["phased"], [True, False])

    def test_snp_filter(self):
        frames = _mk_frames(
            [
                (b"chr1", b"100", b"A", b"G", b"1|0"),  # SNP
                (b"chr1", b"101", b"AT", b"G", b"1|0"),  # indel REF
                (b"chr1", b"102", b"A", b"GT", b"1|0"),  # indel ALT
                (b"chr1", b"103", b"A", b"G,T", b"1|2"),  # multiallelic
                (b"chr1", b"104", b"A", b".", b"0|0"),  # no ALT
                (b"chr1", b"105", b"A", b"*", b"1|0"),  # spanning deletion
                (b"chr1", b"106", b"A", b"g", b"1|0"),  # lowercase fails
                (b"chr1", b"107", b"N", b"G", b"1|0"),  # REF=N passes (only ALT checked)
            ]
        )
        d = decode_frames_numpy(frames)
        assert np.array_equal(
            d["snp_mask"], [True, False, False, False, False, False, False, True]
        )

    def test_coordinates(self):
        frames = _mk_frames([(b"chr1", b"123456789", b"C", b"T", b"0|1")])
        d = decode_frames_numpy(frames)
        assert d["start"][0] == 123456788
        assert d["stop"][0] == 123456789

    def test_haploid_rejected(self):
        frames = _mk_frames([(b"chr1", b"100", b"A", b"G", b"1")])
        d = decode_frames_numpy(frames)
        assert not d["valid"][0]


class TestFraming:
    def test_region_window(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        all_fr = VCFSource(vcf).frame(region="chr22")
        all_starts = decode_frames_numpy(all_fr.records, with_sample=False)["start"]
        lo1, hi1 = int(all_starts[100]) + 1, int(all_starts[400]) + 1
        win = VCFSource(vcf).frame(region=f"chr22:{lo1}-{hi1}")
        d = decode_frames_numpy(win.records, with_sample=False)
        assert win.n < all_fr.n
        assert d["start"].min() >= lo1 - 1
        assert d["start"].max() <= hi1 - 1

    def test_region_other_chrom_empty(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        assert VCFSource(vcf).frame(region="chr21").n == 0

    def test_sample_not_found(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        with pytest.raises(RuntimeError, match="sample not found"):
            VCFSource(vcf).frame(sample="nope")
        with pytest.raises(RuntimeError, match="sample not found"):
            VCFSource(vcf, use_native=False).frame(sample="nope")

    def test_count_variants(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        assert VCFSource(vcf).count_variants("chr22") == 1000

    def test_fields_roundtrip(self, test_data_dir):
        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        fr = VCFSource(vcf).frame(sample=corpus_samples(test_data_dir)[1], region="chr22")
        f = frames_to_fields(fr.records)
        assert bytes(f["chrom"][0][: f["chrom_len"][0]]) == b"chr22"
        assert f["flags"].min() == 3  # all well-formed with GT


class TestPlanes12:
    """Plane (struct-of-arrays) layout decode: bit-equal to the row-major
    decode_frames12 on the transposed wire buffer (TPU tiling: a (12, N)
    plane uses all 128 lanes; (N, 12) rows waste ~90% of each tile)."""

    def test_planes_match_frames12(self, test_data_dir):
        import numpy as np

        from haplohyped_tpu.hostio import native
        from haplohyped_tpu.ops.vcf_decode import decode_frames12, decode_planes12

        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        with open(test_data_dir / "ipscs_samples_test.txt") as f:
            sample = next(line.strip() for line in f if line.strip())
        rec, chroms, _ = native.vcf_frame12(vcf, sample, None, threads=2)
        a = decode_frames12(rec)
        b = decode_planes12(np.ascontiguousarray(rec.T))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )

    def test_planes_no_sample(self, test_data_dir):
        import numpy as np

        from haplohyped_tpu.hostio import native
        from haplohyped_tpu.ops.vcf_decode import decode_frames12, decode_planes12

        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        rec, chroms, _ = native.vcf_frame12(vcf, None, None, threads=2)
        a = decode_frames12(rec, with_sample=False)
        b = decode_planes12(np.ascontiguousarray(rec.T), with_sample=False)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


class TestPacked12:
    """The production TPU decode: XLA decode packed into the Pallas
    kernel's 3-int32 wire format (12 B/record d2h).  Unpacked columns
    must match the dict decode exactly."""

    def test_packed_roundtrip_matches_dict(self, test_data_dir):
        import numpy as np

        from haplohyped_tpu.hostio import native
        from haplohyped_tpu.ops.vcf_decode import (
            decode_frames12,
            decode_frames12_packed,
            unpack12_columns,
        )

        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        with open(test_data_dir / "ipscs_samples_test.txt") as f:
            sample = next(line.strip() for line in f if line.strip())
        rec, chroms, _ = native.vcf_frame12(vcf, sample, None, threads=2)
        ref = {k: np.asarray(v) for k, v in decode_frames12(rec).items()}
        start, meta, ref_len = (np.asarray(x) for x in decode_frames12_packed(rec))
        got = unpack12_columns(start, meta, ref_len)
        for k in ref:
            np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    def test_packed_matches_pallas_interpret(self, test_data_dir):
        import numpy as np

        from haplohyped_tpu.hostio import native
        from haplohyped_tpu.ops.pallas_decode import decode_frames12_pallas
        from haplohyped_tpu.ops.vcf_decode import (
            decode_frames12_packed,
            unpack12_columns,
        )

        vcf = str(test_data_dir / "chr22.filtered.vcf.gz")
        with open(test_data_dir / "ipscs_samples_test.txt") as f:
            sample = next(line.strip() for line in f if line.strip())
        rec, chroms, _ = native.vcf_frame12(vcf, sample, None, threads=2)
        a = decode_frames12_pallas(rec, interpret=True)
        start, meta, ref_len = (np.asarray(x) for x in decode_frames12_packed(rec))
        b = unpack12_columns(start, meta, ref_len)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )
