"""VariantTable: the vectorized BcfRecord query surface
(reference cpp/vcfpp.h:399-1296 — predicates, genotype forms, tag getters)."""

from __future__ import annotations

import numpy as np
import pytest

from haplohyped_tpu.hostio.variants import VariantTable
from haplohyped_tpu.hostio.writer import VcfHeader, VcfWriter


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vt") / "t.vcf.gz")
    h = VcfHeader("VCF4.2")
    h.add_contig("chr1", length=100_000)
    h.add_filter("PASS", "ok")
    h.add_filter("q10", "low qual")
    h.add_info("AC", "A", "Integer", "Allele count")
    h.add_info("AF", "A", "Float", "Allele frequency")
    h.add_info("DB", "0", "Flag", "dbSNP")
    h.add_info("SVTYPE", "1", "String", "SV type")
    h.add_format("GT", "1", "String", "Genotype")
    h.add_format("DP", "1", "Integer", "Depth")
    h.set_samples(["sA", "sB"])
    with VcfWriter(p, header=h) as w:
        w.write_line("chr1\t100\trs1\tA\tG\t50\tPASS\tAC=1;AF=0.25;DB\tGT:DP\t0|1:30\t0|0:12")
        w.write_line("chr1\t200\t.\tC\tT\t.\tq10\tAC=2\tGT:DP\t1|1:7\t0/1:9")
        w.write_line("chr1\t300\t.\tG\tA,T\t9.5\tPASS\t.\tGT\t1|2\t0|1")  # multiallelic SNP
        w.write_line("chr1\t400\t.\tTA\tT\t.\tPASS\t.\tGT\t0|1\t1|1")  # indel (del)
        w.write_line("chr1\t500\t.\tT\tTGG\t.\tPASS\t.\tGT\t0|1\t.|.")  # indel (ins), missing GT
        w.write_line("chr1\t600\t.\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL\tGT\t0|1\t0|0")  # SV
    return VariantTable.from_vcf(p)


def test_columns_and_coordinates(table):
    assert table.n == 6
    assert list(table.pos) == [100, 200, 300, 400, 500, 600]
    np.testing.assert_array_equal(table.start, table.pos - 1)
    # End = start + len(REF) (vcfpp.h:1118-1127)
    assert table.end[0] == 100
    assert table.end[3] == 401  # REF "TA" spans 2 bases
    assert table.id[0] == "rs1"
    assert table.filter[1] == "q10"
    assert table.qual[0] == 50.0
    assert np.isnan(table.qual[1])


def test_predicates(table):
    np.testing.assert_array_equal(
        table.is_snp(), [True, True, False, False, False, False]
    )
    np.testing.assert_array_equal(
        table.is_multiallelic_snp(), [False, False, True, False, False, False]
    )
    np.testing.assert_array_equal(
        table.is_multiallelics(), [False, False, True, False, False, False]
    )
    np.testing.assert_array_equal(
        table.is_indel(), [False, False, False, True, True, False]
    )
    np.testing.assert_array_equal(
        table.is_sv(), [False, False, False, False, False, True]
    )


def test_genotypes_int_form_missing_is_minus9(table):
    g = table.genotypes()
    assert g.shape == (6, 2, 2)
    np.testing.assert_array_equal(g[0], [[0, 1], [0, 0]])
    np.testing.assert_array_equal(g[2], [[1, 2], [0, 1]])  # allele INDEX, not presence
    np.testing.assert_array_equal(g[4, 1], [-9, -9])  # ".|." -> -9 (vcfpp.h:572)


def test_genotypes_presence_form_missing_is_het(table):
    g = table.genotypes(presence=True)
    np.testing.assert_array_equal(g[2], [[1, 1], [0, 1]])  # any ALT -> 1 (vcfpp.h:524)
    np.testing.assert_array_equal(g[4, 1], [1, 0])  # missing sample -> (1,0) (vcfpp.h:512-517)


def test_phase_tracking(table):
    ph = table.gt_phase()
    assert ph[0].tolist() == [True, True]
    assert ph[1].tolist() == [True, False]  # sB is 0/1
    assert table.is_all_phased().tolist() == [True, False, True, True, True, True]
    assert table.ploidy() == 2


def test_info_tags(table):
    ac = table.info_tag("AC")
    assert ac[0] == 1.0 and ac[1] == 2.0 and np.isnan(ac[2])
    af = table.info_tag("AF")
    assert af[0] == 0.25
    db = table.info_tag("DB")
    assert db.tolist() == [True, False, False, False, False, False]
    sv = table.info_tag("SVTYPE")
    assert sv[5] == "DEL" and sv[0] == ""


def test_format_tags(table):
    dp = table.format_tag("DP")
    assert dp[0].tolist() == [30.0, 12.0]
    assert np.isnan(dp[2, 0])  # record 3 has no DP in FORMAT
    gt = table.format_tag("GT")
    assert gt[1, 1] == "0/1"


def test_region_filter(tmp_path_factory):
    base = tmp_path_factory.mktemp("vt2")
    p = str(base / "r.vcf")
    h = VcfHeader()
    h.add_contig("chr1")
    h.add_contig("chr2")
    h.set_samples([])
    with VcfWriter(p, header=h) as w:
        w.write_line("chr1\t10\t.\tA\tG\t.\tPASS\t.")
        w.write_line("chr1\t50\t.\tC\tT\t.\tPASS\t.")
        w.write_line("chr2\t10\t.\tG\tA\t.\tPASS\t.")
    t = VariantTable.from_vcf(p, region="chr1:20-100")
    assert t.n == 1 and t.pos[0] == 50
    t2 = VariantTable.from_vcf(p, region="chr2")
    assert t2.n == 1 and t2.chrom[0] == "chr2"


def test_snp_mask_matches_pipeline(tmp_path_factory):
    """VariantTable.is_snp agrees with the device decode snp_mask on the
    bundled corpus."""
    from haplohyped_tpu.hostio import VCFSource
    from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

    path = "tests/data/chr22.filtered.vcf.gz"
    t = VariantTable.from_vcf(path)
    fr = VCFSource(path, use_native=False).frame()
    dec = decode_frames_numpy(fr.records, with_sample=False)
    np.testing.assert_array_equal(t.is_snp(), dec["snp_mask"])
    np.testing.assert_array_equal(t.start, dec["start"])


def test_vectorized_construction_scale(tmp_path):
    """Construction is vectorized (native index pass + array ops): 200K
    records build in well under a second of per-record-Python-free work,
    and the object conveniences stay lazy until touched."""
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    n = 200_000
    pos = np.cumsum(rng.integers(5, 50, size=n)) + 1
    bases = np.array(list("ACGT"))
    refs = bases[rng.integers(0, 4, n)]
    alts = bases[(np.searchsorted(bases, refs) + rng.integers(1, 4, n)) % 4]
    rows = ["##fileformat=VCFv4.2",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1"]
    rows += [
        f"chr1\t{pos[i]}\trs{i}\t{refs[i]}\t{alts[i]}\t.\tPASS\t.\tGT\t0|1"
        for i in range(n)
    ]
    p = tmp_path / "big.vcf"
    p.write_text("\n".join(rows) + "\n")

    t0 = time.time()
    t = VariantTable.from_vcf(str(p))
    built = time.time() - t0
    assert t.n == n
    assert "id" not in t._cache and "info" not in t._cache  # lazy
    np.testing.assert_array_equal(t.pos, pos)
    assert t.is_snp().all()
    assert not t.is_indel().any()
    assert built < 5.0, f"vectorized construction took {built:.2f}s for {n} records"
    # lazy columns materialize correctly on first touch
    assert t.id[123] == "rs123"
    assert t.ref[0] == refs[0]
