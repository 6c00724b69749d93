from haplohyped_tpu.ops.vcf_decode import decode_frames, decoded_to_numpy
from haplohyped_tpu.ops.onehot import ascii_to_codes, codes_to_onehot

__all__ = [
    "decode_frames",
    "decoded_to_numpy",
    "ascii_to_codes",
    "codes_to_onehot",
]
