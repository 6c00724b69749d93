"""Tests for encoding utilities.

Carries the reference's test assertions (``tests/test_utils.py``) where they
reflect intent: default spec, list/dict specs, TypeError on bad input, one-hot
shape ``(len, 5)``, row-sum 1, uppercase normalisation, |S1 input, ambiguous
bases -> N.  The reference asserted N at a buggy column; here the pinned
channel order is ``[A, C, G, T, N]`` (N = column 4).
"""

import numpy as np
import pytest

from haplohyped_tpu.utils import (
    array_to_onehot,
    bitpack_indices,
    encode_sequence,
    index_to_onehot,
    nucleotide_to_index,
    pack_2bit,
    parse_encode_dict,
    unpack_2bit,
    unpack_bits,
)


class TestParseEncodeDict:
    def test_default_encoding(self):
        assert parse_encode_dict(None) == {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}

    def test_list_encoding(self):
        assert parse_encode_dict(["A", "C", "G", "T"]) == {"A": 0, "C": 1, "G": 2, "T": 3}

    def test_str_encoding(self):
        assert parse_encode_dict("ACGT") == {"A": 0, "C": 1, "G": 2, "T": 3}

    def test_bytes_list_encoding(self):
        assert parse_encode_dict([b"A", b"C"]) == {"A": 0, "C": 1}

    def test_dict_encoding(self):
        d = {"A": 0, "C": 1, "G": 2, "T": 3}
        assert parse_encode_dict(d) == d

    def test_invalid_type(self):
        with pytest.raises(TypeError):
            parse_encode_dict(123)


class TestEncodeSequence:
    def test_string_encoding(self):
        result = encode_sequence("ACGT")
        assert result.shape == (4, 5)
        assert result.sum() == 4
        # identity part of the one-hot: A->0, C->1, G->2, T->3
        assert np.array_equal(np.argmax(result, axis=1), [0, 1, 2, 3])

    def test_uppercase_conversion(self):
        result = encode_sequence("acgt")
        assert result.shape == (4, 5)
        assert result.sum() == 4
        assert np.array_equal(np.argmax(result, axis=1), [0, 1, 2, 3])

    def test_numpy_array_input(self):
        seq = np.array([b"A", b"C", b"G", b"T"], dtype="|S1")
        result = encode_sequence(seq)
        assert result.shape == (4, 5)
        assert result.sum() == 4

    def test_ambiguous_bases(self):
        result = encode_sequence("ACGTN")
        assert result.shape == (5, 5)
        assert result[4, 4] == 1  # N channel is column 4

    def test_iupac_collapses_to_n(self):
        result = encode_sequence("RYKM")
        assert result.shape == (4, 5)
        assert np.array_equal(result[:, 4], [1, 1, 1, 1])

    def test_row_sums_always_one(self):
        result = encode_sequence("AaCcGgTtNnXx-")
        assert np.array_equal(result.sum(axis=1), np.ones(13))

    def test_invalid_input_type(self):
        with pytest.raises(TypeError):
            encode_sequence([1, 2, 3, 4])


class TestNucleotideToIndex:
    def test_default(self):
        assert np.array_equal(nucleotide_to_index("ACGTN"), [0, 1, 2, 3, 4])

    def test_unknown_maps_to_n(self):
        assert np.array_equal(nucleotide_to_index("AXZ"), [0, 4, 4])

    def test_lowercase(self):
        assert np.array_equal(nucleotide_to_index("acgt"), [0, 1, 2, 3])

    def test_matches_onehot_argmax(self):
        rng = np.random.default_rng(0)
        seq = "".join(rng.choice(list("ACGTN"), size=1000))
        codes = nucleotide_to_index(seq)
        onehot = encode_sequence(seq)
        assert np.array_equal(codes, np.argmax(onehot, axis=1))


class TestArrayToOnehot:
    def test_custom_base_order(self):
        seq = np.array([b"T", b"A"], dtype="|S1")
        out = array_to_onehot(seq, [b"T", b"A", b"C", b"G", b"N"])
        assert out[0, 0] == 1 and out[1, 1] == 1


class TestBitpack:
    def test_4bit_roundtrip(self):
        rng = np.random.default_rng(1)
        codes = rng.integers(0, 5, size=1001).astype(np.int8)
        packed = bitpack_indices(codes)
        assert packed.size == 501
        assert np.array_equal(unpack_bits(packed, 1001), codes)

    def test_2bit_roundtrip(self):
        rng = np.random.default_rng(2)
        codes = rng.integers(0, 5, size=4097).astype(np.int8)
        packed, n_mask, length = pack_2bit(codes)
        assert packed.size == 1025
        assert np.array_equal(unpack_2bit(packed, n_mask, length), codes)

    def test_2bit_compression_factor(self):
        codes = np.zeros(4000, dtype=np.int8)
        packed, n_mask, _ = pack_2bit(codes)
        assert packed.size == 1000

    def test_index_to_onehot(self):
        out = index_to_onehot(np.array([0, 4, 2]))
        assert out.shape == (3, 5)
        assert np.array_equal(np.argmax(out, axis=1), [0, 4, 2])
