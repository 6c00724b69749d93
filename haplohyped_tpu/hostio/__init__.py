from haplohyped_tpu.hostio.frame_format import (
    REC_SIZE,
    FramedRecords,
    frames_to_fields,
)
from haplohyped_tpu.hostio.vcf import VCFSource
from haplohyped_tpu.hostio.fasta import FastaReader
from haplohyped_tpu.hostio.native import native_available
from haplohyped_tpu.hostio.bgzf import BgzfWriter, bgzf_compress, bgzf_write
from haplohyped_tpu.hostio.writer import BcfWriter, VcfHeader, VcfWriter
from haplohyped_tpu.hostio.variants import VariantTable

__all__ = [
    "REC_SIZE",
    "FramedRecords",
    "frames_to_fields",
    "VCFSource",
    "FastaReader",
    "native_available",
    "BgzfWriter",
    "bgzf_compress",
    "bgzf_write",
    "BcfWriter",
    "VcfHeader",
    "VcfWriter",
    "VariantTable",
]
