from haplohyped_tpu.utils.common_utils import (
    array_to_onehot,
    encode_sequence,
    nucleotide_to_index,
    parse_encode_dict,
)
from haplohyped_tpu.utils.bitpack import (
    bitpack_indices,
    index_to_onehot,
    unpack_bits,
    pack_2bit,
    unpack_2bit,
)

__all__ = [
    "array_to_onehot",
    "encode_sequence",
    "nucleotide_to_index",
    "parse_encode_dict",
    "bitpack_indices",
    "index_to_onehot",
    "unpack_bits",
    "pack_2bit",
    "unpack_2bit",
]
