"""Umbrella ``haplohyped`` CLI (reference ``src/haplohyped/main.py:6-12``,
which registered a nonexistent module — fixed here)."""

import click

from haplohyped_tpu.pipeline.doctor import main as doctor_cmd
from haplohyped_tpu.pipeline.fasta_encoder import main as fasta_encoder_cmd
from haplohyped_tpu.pipeline.vcf_to_h5 import main as vcf_to_h5_cmd


@click.group()
def main():
    """haplohyped_tpu — TPU-native genotype-tensor engine."""


@click.command()
@click.argument("fasta", type=click.Path(exists=True))
def faidx_cmd(fasta):
    """Build a samtools-compatible .fai index for a plain FASTA."""
    from haplohyped_tpu.hostio.fai import build_fai

    records = build_fai(fasta)
    click.echo(f"{fasta}.fai: {len(records)} sequences indexed")


main.add_command(vcf_to_h5_cmd, name="vcf_to_h5")
main.add_command(fasta_encoder_cmd, name="fasta_encoder")
main.add_command(doctor_cmd, name="doctor")
main.add_command(faidx_cmd, name="faidx")


if __name__ == "__main__":
    main()
