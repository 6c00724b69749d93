"""Deterministic generator for the bundled synthetic test corpus.

Mirrors the shape of the reference's ``tests/data`` fixtures (synthetic
chr22: phased biallelic SNP VCF with 3 UUID samples + GT:GQ:DP and AC/AF/AN
fields, a reference FASTA, 20 1kb BED regions, a sample list) with one
intentional difference: all coordinates lie INSIDE the FASTA, so
window-sampling tests exercise real variant substitution.

Run from the repo root:  python tests/data/make_data.py
"""

from __future__ import annotations

import os
import sys
import uuid

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))

CHROM = "chr22"
LENGTH = 400_000
N_VARIANTS = 1000
N_SAMPLES = 3
N_REGIONS = 20
SEED = 20260817

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main() -> None:
    from bench import bgzf_write

    rng = np.random.default_rng(SEED)

    # FASTA ------------------------------------------------------------
    seq = rng.choice(BASES, size=LENGTH)
    with open(os.path.join(HERE, f"{CHROM}.fasta"), "w") as f:
        f.write(f">{CHROM}\n")
        s = seq.tobytes().decode()
        for i in range(0, LENGTH, 80):
            f.write(s[i : i + 80] + "\n")

    # samples ----------------------------------------------------------
    su = np.random.RandomState(SEED)  # uuid via bytes for determinism
    samples = [str(uuid.UUID(bytes=su.bytes(16), version=4)) for _ in range(N_SAMPLES)]
    with open(os.path.join(HERE, "ipscs_samples_test.txt"), "w") as f:
        f.write("\n".join(samples) + "\n")

    # VCF --------------------------------------------------------------
    positions = np.sort(
        rng.choice(np.arange(10_000, LENGTH - 10_000), size=N_VARIANTS, replace=False)
    )
    lines = [
        "##fileformat=VCFv4.2\n"
        '##FILTER=<ID=PASS,Description="All filters passed">\n'
        f"##contig=<ID={CHROM},length={LENGTH}>\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype Quality">\n'
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read Depth">\n'
        '##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele count in genotypes">\n'
        '##INFO=<ID=AF,Number=A,Type=Float,Description="Allele Frequency">\n'
        '##INFO=<ID=AN,Number=1,Type=Integer,Description="Total number of alleles">\n'
        "##source=SyntheticTestData\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples) + "\n"
    ]
    for i, pos0 in enumerate(positions):
        ref = chr(seq[pos0])
        alt = [b for b in "ACGT" if b != ref][rng.integers(0, 3)]
        gts, ac = [], 0
        for _ in range(N_SAMPLES):
            a1, a2 = int(rng.integers(0, 2)), int(rng.integers(0, 2))
            ac += a1 + a2
            gts.append(f"{a1}|{a2}:{rng.integers(20, 99)}:{rng.integers(10, 50)}")
        an = 2 * N_SAMPLES
        info = f"AC={ac};AF={ac / an:.4f};AN={an}"
        lines.append(
            f"{CHROM}\t{pos0 + 1}\trs{i}\t{ref}\t{alt}\t.\tPASS\t{info}\tGT:GQ:DP\t"
            + "\t".join(gts)
            + "\n"
        )
    bgzf_write(os.path.join(HERE, f"{CHROM}.filtered.vcf.gz"), "".join(lines).encode())

    # BED --------------------------------------------------------------
    starts = np.sort(rng.choice(np.arange(10_000, LENGTH - 11_000), size=N_REGIONS, replace=False))
    with open(os.path.join(HERE, "test_regions.bed"), "w") as f:
        for s0 in starts:
            f.write(f"{CHROM}\t{s0}\t{s0 + 1000}\n")

    print(f"corpus written to {HERE}: {N_VARIANTS} SNPs, {N_SAMPLES} samples")


if __name__ == "__main__":
    main()
