"""On-device sampling + training: the TPU-native data path end to end.

The reference feeds training through a CPU DataLoader
(examples/01_basic_pipeline.py:89-96 there); here batches never touch the
host: a jit sampler draws (region, donor, chromosome), builds variant-aware
haplotype windows with the fused gather/substitute/one-hot kernel, and feeds
a sharded HaploFormer training step.

Run from the repo root:  python examples/02_device_sampler_training.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def main() -> None:
    from haplohyped_tpu.core.config import FastaEncodeConfig, SamplerConfig
    from haplohyped_tpu.data import DeviceHaplotypeSampler
    from haplohyped_tpu.models import HaploFormer, HaploFormerConfig
    from haplohyped_tpu.models.train import train_on_sampler
    from haplohyped_tpu.pipeline.fasta_encoder import encode_fasta
    from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter

    outdir = tempfile.mkdtemp(prefix="hh_train_")

    converter = VCFtoHDF5Converter(
        cohort_name="train_cohort",
        vcf_dir=DATA,
        out_dir=outdir,
        sample_list_path=os.path.join(DATA, "ipscs_samples_test.txt"),
        cores=2,
        cxx_threads=2,
        chromosomes=[22],
    )
    converter.run()
    ref_h5 = encode_fasta(
        FastaEncodeConfig(
            fasta_path=os.path.join(DATA, "chr22.fasta"),
            out_dir=outdir,
            cores=2,
            chromosomes=("chr22",),
        )
    )

    sampler = DeviceHaplotypeSampler.from_files(
        bed_file=os.path.join(DATA, "test_regions.bed"),
        cohort_h5=converter.config.final_h5_path,
        reference_h5=ref_h5,
        samples_file=os.path.join(DATA, "ipscs_samples_test.txt"),
        config=SamplerConfig(seq_length=1000, batch_size=16, seed=0),
    )

    model = HaploFormer(HaploFormerConfig(d_model=128, num_heads=4, num_layers=2))
    state, losses = train_on_sampler(sampler, model, steps=100, log_every=20)
    print(f"trained {int(state.step)} steps; losses: {[round(l, 4) for l in losses]}")


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    main()
