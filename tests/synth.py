"""Synthetic mini-corpus generator for tests.

Builds a deterministic (seeded) FASTA + phased VCF + BED + sample list whose
coordinates all fall inside the FASTA, so variant-aware windows really
contain variants (the bundled reference corpus places variants at 10-20 Mb
against a 1 Mb FASTA, which can never exercise the substitution path).
"""

from __future__ import annotations

import gzip
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_corpus(
    out_dir: str,
    chrom: str = "chr22",
    chrom_num: int = 22,
    length: int = 20_000,
    n_variants: int = 300,
    n_samples: int = 3,
    n_regions: int = 12,
    seed: int = 7,
    missing_rate: float = 0.02,
    indel_rate: float = 0.05,
):
    """Returns dict with paths: vcf, fasta, bed, samples; plus truth arrays."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    seq = rng.choice(BASES, size=length)
    fasta_path = os.path.join(out_dir, f"{chrom}.fasta")
    with open(fasta_path, "w") as f:
        f.write(f">{chrom}\n")
        s = seq.tobytes().decode()
        for i in range(0, length, 80):
            f.write(s[i : i + 80] + "\n")

    samples = [f"donor-{i:04d}-aaaa-bbbb-cccc" for i in range(n_samples)]
    samples_path = os.path.join(out_dir, "samples.txt")
    with open(samples_path, "w") as f:
        f.write("\n".join(samples) + "\n")

    positions = np.sort(
        rng.choice(np.arange(100, length - 100), size=n_variants, replace=False)
    )
    vcf_path = os.path.join(out_dir, f"{chrom}.filtered.vcf.gz")
    truth = []  # (pos0, ref, alt, [(p1, p2) per sample]) for SNP records only
    with gzip.open(vcf_path, "wt") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={chrom},length={length}>\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples) + "\n")
        for i, pos0 in enumerate(positions):
            ref = chr(seq[pos0])
            is_indel = rng.random() < indel_rate
            if is_indel:
                alt = ref + "T"
            else:
                choices = [b for b in "ACGT" if b != ref]
                alt = choices[rng.integers(0, 3)]
            gts = []
            sample_truth = []
            for _ in range(n_samples):
                if rng.random() < missing_rate:
                    gts.append("./.")
                    sample_truth.append((1, 0))
                else:
                    a1, a2 = int(rng.integers(0, 2)), int(rng.integers(0, 2))
                    gts.append(f"{a1}|{a2}")
                    sample_truth.append((a1, a2))
            f.write(
                f"{chrom}\t{pos0 + 1}\trs{i}\t{ref}\t{alt}\t.\tPASS\t.\tGT:DP\t"
                + "\t".join(f"{g}:{rng.integers(10, 99)}" for g in gts)
                + "\n"
            )
            if not is_indel:
                truth.append((int(pos0), ref, alt, sample_truth))

    bed_path = os.path.join(out_dir, "regions.bed")
    with open(bed_path, "w") as f:
        for _ in range(n_regions):
            s = int(rng.integers(0, length - 2000))
            f.write(f"{chrom}\t{s}\t{s + 1500}\n")

    return {
        "dir": out_dir,
        "chrom": chrom,
        "chrom_num": chrom_num,
        "length": length,
        "vcf": vcf_path,
        "fasta": fasta_path,
        "bed": bed_path,
        "samples_file": samples_path,
        "samples": samples,
        "seq": seq,
        "truth": truth,
    }
