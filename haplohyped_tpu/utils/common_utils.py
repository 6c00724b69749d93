"""Sequence-encoding utilities.

API surface mirrors the reference's ``src/utils/common_utils.py`` (the working
intent, not its defects): ``parse_encode_dict`` semantics from
``common_utils.py:62-79``; ``encode_sequence``/``array_to_onehot`` produce a
real ``(length, n_channels)`` one-hot with channel order = encode-spec order
(default ``[A, C, G, T, N]``; the shipped reference's pandas reindex returned
all-zeros, reference defect — here bases map via a 256-entry LUT).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from haplohyped_tpu.core.constants import DEFAULT_ENCODE_DICT


def parse_encode_dict(encode_spec=None) -> dict[str, int]:
    """Parse an encoding specification into a ``{base: index}`` dict.

    Accepts ``None`` (default ``{A:0, C:1, G:2, T:3, N:4}``), a list/tuple/str
    of bases (enumerated in order), or a dict (returned as-is).
    """
    if not encode_spec:
        return dict(DEFAULT_ENCODE_DICT)
    if isinstance(encode_spec, (list, tuple, str)):
        return {_as_str(base): i for i, base in enumerate(encode_spec)}
    if isinstance(encode_spec, Mapping):
        return {_as_str(k): int(v) for k, v in encode_spec.items()}
    raise TypeError("Please input as dict, list or string!")


def _as_str(base) -> str:
    return base.decode() if isinstance(base, (bytes, np.bytes_)) else str(base)


def _build_lut(encode_spec: Mapping[str, int], unknown_code: int) -> np.ndarray:
    """ASCII byte -> code LUT honoring an arbitrary encode spec."""
    lut = np.full(256, unknown_code, dtype=np.int16)
    for base, code in encode_spec.items():
        lut[ord(base.upper())] = code
        lut[ord(base.lower())] = code
    return lut


def _coerce_bytes(seq_data, ignore_case: bool) -> np.ndarray:
    """Coerce str / |S1 ndarray input to a uint8 ASCII array (upper-cased)."""
    if isinstance(seq_data, str):
        if ignore_case:
            seq_data = seq_data.upper()
        return np.frombuffer(seq_data.encode("ascii"), dtype=np.uint8).copy()
    if isinstance(seq_data, np.ndarray):
        if seq_data.dtype != np.dtype("|S1"):
            seq_data = seq_data.astype("|S1")
        arr = seq_data.view(np.uint8).copy()
        if ignore_case:
            lower = (arr >= ord("a")) & (arr <= ord("z"))
            arr[lower] = arr[lower] - 32
        return arr
    raise TypeError("Please input as string or numpy array!")


def nucleotide_to_index(seq, encode_spec=None, ignore_case: bool = True) -> np.ndarray:
    """Convert a DNA sequence (str or |S1 array) to int8 base codes.

    Bases not in the spec map to the spec's ``N`` code (or the max code + 1 is
    never used — unknowns collapse to N like the reference's
    ``array_to_onehot`` ambiguous-base handling).
    """
    spec = parse_encode_dict(encode_spec)
    unknown = spec.get("N", len(spec) - 1)
    lut = _build_lut(spec, unknown)
    raw = _coerce_bytes(seq, ignore_case)
    return lut[raw].astype(np.int8)


def array_to_onehot(seq_array: np.ndarray, base_list: Sequence) -> np.ndarray:
    """One-hot encode an ``|S1`` byte array with channels ordered by
    ``base_list``.  Any base outside {A, C, G, T} becomes ``N`` first
    (reference semantics, ``common_utils.py:85``)."""
    bases = [_as_str(b) for b in base_list]
    spec = {b: i for i, b in enumerate(bases)}
    raw = _coerce_bytes(np.asarray(seq_array), ignore_case=False)
    # collapse ambiguity codes to N before encoding
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    is_acgt = np.isin(raw, acgt)
    raw = np.where(is_acgt, raw, np.uint8(ord("N")))
    unknown = spec.get("N", len(spec))  # out-of-range => all-zero row
    lut = _build_lut(spec, unknown)
    codes = lut[raw]
    onehot = np.zeros((codes.shape[0], len(bases)), dtype=np.uint8)
    valid = codes < len(bases)
    onehot[np.nonzero(valid)[0], codes[valid]] = 1
    return onehot


def encode_sequence(seq_data, encode_spec=None, ignore_case: bool = True) -> np.ndarray:
    """One-hot encode a sequence: ``(length, n_channels)`` uint8.

    Channel order follows the encode spec (default ``[A, C, G, T, N]``).
    """
    spec = parse_encode_dict(encode_spec)
    base_list = list(spec.keys())
    raw = _coerce_bytes(seq_data, ignore_case)
    return array_to_onehot(raw.view("|S1"), base_list)
