"""Minimal BCF2.2 writer for tests — an independent, spec-derived
implementation (BCF2 spec §6) used to cross-check the native parser.

Converts a text VCF (as produced by tests/synth.py) into a BGZF-wrapped
BCF with the fields the pipeline consumes (CHROM/POS/REF/ALT/GT); INFO is
dropped, FILTER is written as PASS.
"""

from __future__ import annotations

import gzip
import struct


def _typed_str(s: bytes) -> bytes:
    n = len(s)
    if n < 15:
        return bytes([(n << 4) | 7]) + s
    return bytes([0xF7]) + _typed_int(n) + s


def _typed_int(v: int) -> bytes:
    if -120 <= v <= 127:
        return bytes([0x11]) + struct.pack("<b", v)
    if -(1 << 15) <= v < (1 << 15):
        return bytes([0x12]) + struct.pack("<h", v)
    return bytes([0x13]) + struct.pack("<i", v)


def vcf_text_to_bcf(vcf_gz_path: str, bcf_path: str) -> str:
    from bench import bgzf_write

    with gzip.open(vcf_gz_path, "rt") as f:
        lines = f.read().split("\n")

    header_lines = [l for l in lines if l.startswith("#")]
    data_lines = [l for l in lines if l and not l.startswith("#")]

    # dictionary order: PASS id 0, then FILTER/INFO/FORMAT ids by appearance
    dict_ids = ["PASS"]
    contigs = []
    for l in header_lines:
        for kind in ("##FILTER=", "##INFO=", "##FORMAT="):
            if l.startswith(kind):
                ident = l.split("ID=")[1].split(",")[0].split(">")[0]
                if ident not in dict_ids:
                    dict_ids.append(ident)
        if l.startswith("##contig="):
            contigs.append(l.split("ID=")[1].split(",")[0].split(">")[0])
    gt_id = dict_ids.index("GT")

    samples = header_lines[-1].split("\t")[9:]
    n_sample = len(samples)

    htext = ("\n".join(header_lines) + "\n").encode() + b"\x00"
    out = bytearray()
    out += b"BCF\x02\x02"
    out += struct.pack("<I", len(htext))
    out += htext

    for l in data_lines:
        f = l.split("\t")
        chrom, pos1, vid, ref, alt = f[0], int(f[1]), f[2], f[3], f[4]
        rid = contigs.index(chrom)
        alts = alt.split(",") if alt != "." else []
        alleles = [ref.encode()] + [a.encode() for a in alts]
        n_allele = len(alleles)

        shared = bytearray()
        shared += struct.pack("<iii", rid, pos1 - 1, len(ref))
        shared += struct.pack("<I", 0x7F800001)  # missing qual
        shared += struct.pack("<I", (n_allele << 16) | 0)  # n_info = 0
        shared += struct.pack("<I", (1 << 24) | n_sample)  # one FORMAT field
        shared += _typed_str(vid.encode())
        for a in alleles:
            shared += _typed_str(a)
        shared += bytes([0x11, 0x00])  # FILTER: one int8 value, PASS (=0)
        # no INFO

        indiv = bytearray()
        indiv += _typed_int(gt_id)
        indiv += bytes([0x21])  # 2 values per sample, int8
        fmt_i = f[8].split(":").index("GT")
        for s in range(n_sample):
            gt = f[9 + s].split(":")[fmt_i]
            sep = "|" if "|" in gt else "/"
            a = gt.split(sep)
            vals = []
            for j, av in enumerate(a[:2]):
                if av == ".":
                    enc = 0  # missing allele
                else:
                    enc = (int(av) + 1) << 1
                if j == 1 and sep == "|":
                    enc |= 1
                vals.append(enc)
            while len(vals) < 2:
                vals.append(0x81)  # vector-end for shorter ploidy
            indiv += struct.pack("<bb", *(struct.unpack("<b", bytes([v & 0xFF]))[0] for v in vals))

        out += struct.pack("<II", len(shared), len(indiv))
        out += shared
        out += indiv

    bgzf_write(bcf_path, bytes(out))
    return bcf_path
