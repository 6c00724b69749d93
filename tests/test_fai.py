"""faidx-compatible FASTA indexing (hostio/fai.py) — the htslib role the
reference reaches through pysam.FastaFile (fasta_encoder.py:86)."""

import numpy as np
import pytest

from haplohyped_tpu.hostio.fai import FaidxFasta, build_fai, read_fai
from haplohyped_tpu.hostio.fasta import FastaReader


@pytest.fixture()
def fasta(tmp_path):
    rng = np.random.default_rng(0)
    seqs = {
        "chr1": bytes(np.frombuffer(b"ACGTN", np.uint8)[rng.integers(0, 5, 1000)]),
        "chr2": bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 357)]),
        "chrM": b"ACGT",  # shorter than one line
    }
    p = tmp_path / "g.fa"
    with open(p, "wb") as f:
        for name, seq in seqs.items():
            f.write(b">" + name.encode() + b" description ignored\n")
            for lo in range(0, len(seq), 60):
                f.write(seq[lo : lo + 60] + b"\n")
    return str(p), seqs


class TestFai:
    def test_build_format_is_samtools_exact(self, fasta, tmp_path):
        path, seqs = fasta
        build_fai(path)
        lines = open(path + ".fai").read().splitlines()
        assert lines[0] == "chr1\t1000\t26\t60\t61"
        # chr1 spans 26 + 16*61 + 41 bytes; chr2 header follows
        assert lines[1].startswith("chr2\t357\t")
        assert lines[2].split("\t")[1] == "4"

    def test_roundtrip_and_ranges(self, fasta):
        path, seqs = fasta
        fx = FaidxFasta(path)  # auto-builds
        assert fx.names() == list(seqs)
        for name, seq in seqs.items():
            assert fx.length(name) == len(seq)
            assert fx.fetch(name, 0, len(seq)) == seq
            assert fx.fetch(name, 3, 7) == seq[3:7]
            # line-boundary crossings
            assert fx.fetch(name, 59, 61) == seq[59:61]
            assert fx.fetch(name, 0, 0) == b""
            assert fx.fetch(name, -5, 10_000) == seq
        fx.close()

    def test_fasta_reader_prefers_fai(self, fasta):
        path, seqs = fasta
        build_fai(path)
        r = FastaReader(path)
        assert isinstance(r._impl, FaidxFasta)
        assert r.fetch("chr1", 10, 20) == seqs["chr1"][10:20]
        assert r.fetch("chr2") == seqs["chr2"]
        r.close()

    def test_reader_matches_whole_file_impl(self, fasta):
        path, seqs = fasta
        plain = FastaReader(path)  # no .fai yet: native/python impl
        build_fai(path)
        idx = FastaReader(path)
        for name in seqs:
            assert plain.fetch(name) == idx.fetch(name)
        plain.close()
        idx.close()

    def test_read_fai(self, fasta):
        path, _ = fasta
        build_fai(path)
        idx = read_fai(path + ".fai")
        assert idx["chr1"].linewidth == 61

    def test_gzip_rejected(self, tmp_path):
        import gzip

        p = tmp_path / "g.fa.gz"
        with gzip.open(p, "wb") as f:
            f.write(b">c\nACGT\n")
        with pytest.raises(ValueError, match="uncompressed"):
            build_fai(str(p))

    def test_irregular_lines_rejected(self, tmp_path):
        p = tmp_path / "bad.fa"
        p.write_bytes(b">c\nACGT\nAC\nGGGG\n")
        with pytest.raises(ValueError, match="irregular"):
            build_fai(str(p))

    def test_cli(self, fasta):
        from click.testing import CliRunner

        from haplohyped_tpu.pipeline.main import main as cli

        path, _ = fasta
        res = CliRunner().invoke(cli, ["faidx", path])
        assert res.exit_code == 0, res.output
        assert "3 sequences indexed" in res.output


class TestFaiStrictness:
    """ADVICE r3: inputs samtools faidx rejects must not be silently
    indexed — a longer-than-linebases FINAL line or a blank interior line
    makes seek-fetch serve wrong bases."""

    def test_long_final_line_rejected(self, tmp_path):
        p = tmp_path / "longfinal.fa"
        p.write_bytes(b">c\nACGT\nACGTACGT\n")
        with pytest.raises(ValueError, match="final line"):
            build_fai(str(p))

    def test_blank_interior_line_rejected(self, tmp_path):
        p = tmp_path / "blank.fa"
        p.write_bytes(b">c\nACGT\n\nGGTT\n")
        with pytest.raises(ValueError, match="blank line"):
            build_fai(str(p))

    def test_blank_after_header_rejected(self, tmp_path):
        p = tmp_path / "blankhdr.fa"
        p.write_bytes(b">c\n\nACGT\n")
        with pytest.raises(ValueError, match="blank line"):
            build_fai(str(p))

    def test_trailing_blank_lines_ok(self, tmp_path):
        p = tmp_path / "trail.fa"
        p.write_bytes(b">c\nACGT\nAC\n\n\n>d\nGGGG\n")
        recs = build_fai(str(p))
        assert recs["c"].length == 6 and recs["d"].length == 4
        fx = FaidxFasta(str(p))
        assert fx.fetch("c", 0, 6) == b"ACGTAC"
        fx.close()

    def test_short_final_line_ok(self, tmp_path):
        p = tmp_path / "short.fa"
        p.write_bytes(b">c\nACGT\nAC\n")
        recs = build_fai(str(p))
        assert recs["c"].length == 6


class TestFaiStaleness:
    """ADVICE r3: a FASTA rewritten after indexing must not be served by
    seek math from the stale index."""

    def test_stale_index_falls_back(self, tmp_path):
        import os
        import time

        p = tmp_path / "s.fa"
        p.write_bytes(b">c\n" + b"A" * 60 + b"\n" + b"C" * 60 + b"\n")
        build_fai(str(p))
        # rewrite SHORTER after indexing: computed end exceeds file size
        time.sleep(0.01)
        p.write_bytes(b">c\n" + b"G" * 30 + b"\n")
        os.utime(str(p) + ".fai", (0, 0))  # make the index older too
        r = FastaReader(str(p))
        # whole-file fallback serves the REWRITTEN truth
        assert r.fetch("c", 0, 30) == b"G" * 30
        assert r.length("c") == 30
        r.close()

    def test_fresh_index_still_preferred(self, fasta):
        from haplohyped_tpu.hostio.fai import FaidxFasta as FF

        path, seqs = fasta
        build_fai(path)
        r = FastaReader(path)
        assert isinstance(r._impl, FF)
        assert r.fetch("chr1", 10, 50) == seqs["chr1"][10:50]
        r.close()
