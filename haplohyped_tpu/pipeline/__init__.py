from haplohyped_tpu.pipeline.records import snp_struct_from_frames
from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter
from haplohyped_tpu.pipeline.fasta_encoder import ReferenceGenome, HDF5Handler

__all__ = [
    "snp_struct_from_frames",
    "VCFtoHDF5Converter",
    "ReferenceGenome",
    "HDF5Handler",
]
