"""Basic pipeline: VCF cohort + FASTA -> HDF5 artifacts -> random windows.

Mirrors the reference's examples/01_basic_pipeline.py — except that here the
conversion actually runs (the reference kept ``converter.run()`` commented
out because its native module needed a bespoke build).

Run from the repo root:  python examples/01_basic_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def main() -> None:
    from haplohyped_tpu.core.config import FastaEncodeConfig
    from haplohyped_tpu.pipeline.fasta_encoder import encode_fasta
    from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter
    from haplohyped_tpu.storage import VCFH5Reader

    outdir = tempfile.mkdtemp(prefix="hh_example_")
    print(f"output -> {outdir}")

    # 1. cohort VCF -> genotype HDF5 --------------------------------------
    converter = VCFtoHDF5Converter(
        cohort_name="example_cohort",
        vcf_dir=DATA,
        out_dir=outdir,
        sample_list_path=os.path.join(DATA, "ipscs_samples_test.txt"),
        cores=2,
        cxx_threads=2,
        chromosomes=[22],
    )
    results = converter.run()
    print(f"converted {sum(r.n_snps for r in results)} SNPs "
          f"across {len(results)} (donor, chromosome) tasks")

    # 2. reference FASTA -> one-hot HDF5 ----------------------------------
    ref_h5 = encode_fasta(
        FastaEncodeConfig(
            fasta_path=os.path.join(DATA, "chr22.fasta"),
            out_dir=outdir,
            cores=2,
            chromosomes=("chr22",),
        )
    )
    print(f"reference genome -> {ref_h5}")

    # 3. read back --------------------------------------------------------
    with VCFH5Reader(converter.config.final_h5_path) as reader:
        donor = reader.donors()[0]
        table = reader.fetch_genotypes(donor, 22)
        print(f"donor {donor}: {table.shape[0]} SNPs, first: {table[0]}")


if __name__ == "__main__":
    main()
