"""Framed VCF record layout (must stay in sync with cpp/hostio.cpp).

A framed record is 64 bytes: the host shim packs the variable-width text
fields the pipeline needs into fixed slots so the accelerator can decode them
with pure vector ops.

    [0:8)   chrom bytes      [8]   chrom_len
    [9:21)  pos ASCII digits [21]  pos_len
    [22:38) ref bytes        [38]  ref_len (true length, capped 255)
    [39:55) alt bytes        [55]  alt_len (true length, capped 255)
    [56:62) gt bytes         [62]  gt_len  (capped 6)
    [63]    flags: bit0 = well-formed line, bit1 = GT subfield present
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

REC_SIZE = 64

CHROM_OFF, CHROM_CAP, CHROM_LEN_OFF = 0, 8, 8
POS_OFF, POS_CAP, POS_LEN_OFF = 9, 12, 21
REF_OFF, REF_CAP, REF_LEN_OFF = 22, 16, 38
ALT_OFF, ALT_CAP, ALT_LEN_OFF = 39, 16, 55
GT_OFF, GT_CAP, GT_LEN_OFF = 56, 6, 62
FLAGS_OFF = 63

FLAG_WELL_FORMED = 1
FLAG_HAS_GT = 2


@dataclass
class FramedRecords:
    """A batch of framed VCF records plus provenance counts."""

    #: (n, 64) uint8 matrix of framed records
    records: np.ndarray
    #: total data lines inspected by the framer (pre region-filter)
    total_seen: int

    @property
    def n(self) -> int:
        return int(self.records.shape[0])


def frames_to_fields(records: np.ndarray) -> dict[str, np.ndarray]:
    """Destructure an (n, 64) frame matrix into named column views."""
    r = np.ascontiguousarray(records, dtype=np.uint8)
    return {
        "chrom": r[:, CHROM_OFF : CHROM_OFF + CHROM_CAP],
        "chrom_len": r[:, CHROM_LEN_OFF],
        "pos": r[:, POS_OFF : POS_OFF + POS_CAP],
        "pos_len": r[:, POS_LEN_OFF],
        "ref": r[:, REF_OFF : REF_OFF + REF_CAP],
        "ref_len": r[:, REF_LEN_OFF],
        "alt": r[:, ALT_OFF : ALT_OFF + ALT_CAP],
        "alt_len": r[:, ALT_LEN_OFF],
        "gt": r[:, GT_OFF : GT_OFF + GT_CAP],
        "gt_len": r[:, GT_LEN_OFF],
        "flags": r[:, FLAGS_OFF],
    }


def pack_frame(
    chrom: bytes,
    pos: bytes,
    ref: bytes,
    alt: bytes,
    gt: bytes | None,
) -> np.ndarray:
    """Build one framed record (pure-Python fallback framer helper)."""
    rec = np.zeros(REC_SIZE, dtype=np.uint8)

    def put(data: bytes, off: int, cap: int, len_off: int, true_len_cap=255):
        view = data[:cap]
        rec[off : off + len(view)] = np.frombuffer(view, dtype=np.uint8)
        rec[len_off] = min(len(data), true_len_cap)

    put(chrom, CHROM_OFF, CHROM_CAP, CHROM_LEN_OFF, true_len_cap=CHROM_CAP)
    put(pos, POS_OFF, POS_CAP, POS_LEN_OFF, true_len_cap=POS_CAP)
    put(ref, REF_OFF, REF_CAP, REF_LEN_OFF)
    put(alt, ALT_OFF, ALT_CAP, ALT_LEN_OFF)
    flags = FLAG_WELL_FORMED
    if gt is not None:
        put(gt, GT_OFF, GT_CAP, GT_LEN_OFF, true_len_cap=GT_CAP)
        flags |= FLAG_HAS_GT
    rec[FLAGS_OFF] = flags
    return rec
