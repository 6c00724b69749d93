"""VCF/BCF output: header builder + record writers.

First-class write side of the host I/O layer — the TPU-repo equivalent of the
reference's ``vcfpp::BcfHeader`` mutation surface (add INFO/FORMAT/FILTER/
contig lines, set samples — ``cpp/vcfpp.h:211-378``) and ``vcfpp::BcfWriter``
(``cpp/vcfpp.h:1491-1660``): open VCF/BCF for writing with an explicit or
suffix-inferred mode (``w`` plain VCF, ``z`` BGZF VCF, ``b`` compressed BCF,
``bu`` uncompressed BCF), stream a header then records, with ``write_line``
(text-line in, matching ``BcfWriter::writeLine`` incl. the undefined-contig
check, ``vcfpp.h:1620-1637``) and structured ``write_record``.

The BCF path emits BCF2.2 (spec §6) typed records directly — no htslib.  GT
semantics mirror the read side: allele index+1 shifted left, bit0 = phase of
the non-first allele, 0 = missing (``cpp/vcfpp.h:483-533``).
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

from haplohyped_tpu.hostio.bgzf import BgzfWriter

_MISSING_QUAL = 0x7F800001  # bcf_float_missing

# BCF2 typed-value type codes (spec table 3)
_BT_INT8, _BT_INT16, _BT_INT32, _BT_FLOAT, _BT_CHAR = 1, 2, 3, 5, 7


def _typed_scalar_int(v: int) -> bytes:
    """One typed int value (count=1), narrowest width."""
    if -120 <= v <= 127:
        return bytes([0x10 | _BT_INT8]) + struct.pack("<b", v)
    if -(1 << 15) + 8 <= v < (1 << 15):
        return bytes([0x10 | _BT_INT16]) + struct.pack("<h", v)
    return bytes([0x10 | _BT_INT32]) + struct.pack("<i", v)


def _size_prefix(type_code: int, count: int) -> bytes:
    if count < 15:
        return bytes([(count << 4) | type_code])
    return bytes([0xF0 | type_code]) + _typed_scalar_int(count)


def _typed_str(s: bytes) -> bytes:
    return _size_prefix(_BT_CHAR, len(s)) + s


def _typed_int_vec(vals: list[int]) -> bytes:
    lo, hi = min(vals), max(vals)
    if -120 <= lo and hi <= 127:
        return _size_prefix(_BT_INT8, len(vals)) + struct.pack(f"<{len(vals)}b", *vals)
    if -(1 << 15) + 8 <= lo and hi < (1 << 15):
        return _size_prefix(_BT_INT16, len(vals)) + struct.pack(f"<{len(vals)}h", *vals)
    return _size_prefix(_BT_INT32, len(vals)) + struct.pack(f"<{len(vals)}i", *vals)


def _typed_float_vec(vals: list[float]) -> bytes:
    return _size_prefix(_BT_FLOAT, len(vals)) + struct.pack(f"<{len(vals)}f", *vals)


class VcfHeader:
    """Mutable VCF header (meta lines + sample names).

    Parity surface: ``BcfHeader::addINFO/addFORMAT/addFILTER/addContig/addLine``
    (``cpp/vcfpp.h:211-267``), ``setSamples`` (``:369-378``), ``getSamples``
    (``:295``), ``getSeqnames`` (``:306``), ``setVersion``, ``asString``.
    """

    def __init__(self, version: str = "VCF4.2"):
        self.lines: list[str] = [f"##fileformat={version}"]
        self.samples: list[str] = []

    # -- construction ----------------------------------------------------

    @classmethod
    def from_text(cls, text: str) -> "VcfHeader":
        h = cls.__new__(cls)
        h.lines = []
        h.samples = []
        for line in text.split("\n"):
            line = line.rstrip("\r")
            if line.startswith("##"):
                h.lines.append(line)
            elif line.startswith("#CHROM"):
                h.samples = line.split("\t")[9:]
                break
            elif line:
                break
        if not any(l.startswith("##fileformat=") for l in h.lines):
            h.lines.insert(0, "##fileformat=VCF4.2")
        return h

    @classmethod
    def from_file(cls, path: str) -> "VcfHeader":
        """Copy another VCF's header (``BcfWriter::copyHeader`` parity,
        ``cpp/vcfpp.h:1612-1618``)."""
        with open(path, "rb") as f:
            gzipped = f.read(2) == b"\x1f\x8b"
        opener = gzip.open if gzipped else open
        chunks = []
        with opener(path, "rb") as f:
            for raw in f:
                if not raw.startswith(b"#"):
                    break
                chunks.append(raw.decode())
                if raw.startswith(b"#CHROM"):
                    break
        return cls.from_text("".join(chunks))

    # -- mutation ----------------------------------------------------------

    def set_version(self, version: str) -> None:
        self.lines = [l for l in self.lines if not l.startswith("##fileformat=")]
        self.lines.insert(0, f"##fileformat={version}")

    def add_line(self, line: str) -> None:
        if not line.startswith("##"):
            raise ValueError(f"not a meta line: {line}")
        self.lines.append(line)

    def add_info(self, id: str, number: str, type: str, description: str) -> None:
        self.add_line(f'##INFO=<ID={id},Number={number},Type={type},Description="{description}">')

    def add_format(self, id: str, number: str, type: str, description: str) -> None:
        self.add_line(
            f'##FORMAT=<ID={id},Number={number},Type={type},Description="{description}">'
        )

    def add_filter(self, id: str, description: str) -> None:
        self.add_line(f'##FILTER=<ID={id},Description="{description}">')

    def add_contig(self, id: str, length: int | None = None) -> None:
        if length is None:
            self.add_line(f"##contig=<ID={id}>")
        else:
            self.add_line(f"##contig=<ID={id},length={length}>")

    def _remove(self, kind: str, id: str) -> None:
        prefix = f"##{kind}=<"
        self.lines = [
            l
            for l in self.lines
            if not (l.startswith(prefix) and self._line_id(l) == id)
        ]

    def remove_contig(self, id: str) -> None:
        self._remove("contig", id)

    def remove_info(self, id: str) -> None:
        self._remove("INFO", id)

    def remove_format(self, id: str) -> None:
        self._remove("FORMAT", id)

    def remove_filter(self, id: str) -> None:
        self._remove("FILTER", id)

    def set_samples(self, samples: list[str]) -> None:
        self.samples = list(samples)

    # -- queries -----------------------------------------------------------

    @staticmethod
    def _line_id(line: str) -> str:
        return line.split("ID=", 1)[1].split(",", 1)[0].split(">", 1)[0]

    def get_samples(self) -> list[str]:
        return list(self.samples)

    def get_seqnames(self) -> list[str]:
        return [self._line_id(l) for l in self.lines if l.startswith("##contig=<")]

    def _ids_of(self, kind: str) -> list[str]:
        return [self._line_id(l) for l in self.lines if l.startswith(f"##{kind}=<")]

    def info_type(self, id: str) -> str | None:
        for l in self.lines:
            if l.startswith("##INFO=<") and self._line_id(l) == id:
                if "Type=" in l:
                    return l.split("Type=", 1)[1].split(",", 1)[0].split(">", 1)[0]
        return None

    def as_string(self) -> str:
        cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]
        if self.samples:
            cols += ["FORMAT"] + self.samples
        return "\n".join(self.lines) + "\n" + "\t".join(cols) + "\n"

    # -- BCF dictionaries ----------------------------------------------------

    def bcf_dict(self) -> dict[str, int]:
        """ID→offset dictionary-of-strings (BCF2 spec §6.2): PASS is 0, then
        FILTER/INFO/FORMAT ids by order of appearance."""
        ids = ["PASS"]
        for l in self.lines:
            for kind in ("##FILTER=<", "##INFO=<", "##FORMAT=<"):
                if l.startswith(kind):
                    ident = self._line_id(l)
                    if ident not in ids:
                        ids.append(ident)
        return {name: i for i, name in enumerate(ids)}

    def bcf_contig_dict(self) -> dict[str, int]:
        return {name: i for i, name in enumerate(self.get_seqnames())}


def _infer_mode(path: str) -> str:
    if path.endswith(".bcf"):
        return "b"
    if path.endswith(".gz"):
        return "z"
    return "w"


class VcfWriter:
    """Write VCF/BCF files (``vcfpp::BcfWriter`` parity, ``cpp/vcfpp.h:1491``).

    Modes (matching the reference's hts mode strings, ``vcfpp.h:1534-1544``):
    ``w`` plain-text VCF, ``z`` BGZF-compressed VCF, ``b`` BGZF-compressed
    BCF2.2, ``bu`` uncompressed BCF2.2.  ``mode=None`` infers from the file
    suffix (``.bcf``→b, ``.gz``→z, else w) like ``BcfWriter::open``
    (``vcfpp.h:1567-1572``).
    """

    def __init__(
        self,
        path: str,
        header: VcfHeader | None = None,
        version: str = "VCF4.2",
        mode: str | None = None,
        level: int = 6,
    ):
        self.path = path
        self.mode = (mode or _infer_mode(path)).lstrip("w") or "w"
        if self.mode not in ("w", "z", "b", "bu"):
            raise ValueError(f"bad mode: {mode}")
        self.header = header if header is not None else VcfHeader(version)
        self._header_written = False
        self._closed = False
        self._dict: dict[str, int] = {}
        self._contig_dict: dict[str, int] = {}
        if self.mode in ("z", "b"):
            self._out: BgzfWriter | object = BgzfWriter(path, level=level)
        else:
            self._out = open(path, "wb")

    # -- plumbing ----------------------------------------------------------

    def _emit(self, data: bytes) -> None:
        self._out.write(data)

    def write_header(self) -> None:
        if self._header_written:
            return
        self._dict = self.header.bcf_dict()
        self._contig_dict = self.header.bcf_contig_dict()
        if self.mode in ("b", "bu"):
            htext = self.header.as_string().encode() + b"\x00"
            self._emit(b"BCF\x02\x02" + struct.pack("<I", len(htext)) + htext)
        else:
            self._emit(self.header.as_string().encode())
        self._header_written = True

    def close(self) -> None:
        """Flush + close; writes the header first if never written
        (``BcfWriter::close`` parity, ``vcfpp.h:1591-1596``)."""
        if self._closed:
            return
        if not self._header_written:
            self.write_header()
        self._out.close()
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- records -------------------------------------------------------------

    def write_line(self, vcfline: str) -> None:
        """Write one pre-formatted VCF text line (``BcfWriter::writeLine``
        parity incl. the BCF_ERR_CTG_UNDEF check, ``vcfpp.h:1620-1637``)."""
        if not self._header_written:
            self.write_header()
        line = vcfline.rstrip("\n")
        fields = line.split("\t")
        if len(fields) < 8:
            raise RuntimeError(f"error parsing: {vcfline}")
        chrom = fields[0]
        if chrom not in self._contig_dict:
            raise RuntimeError(
                f"contig id {chrom} not found in the header. "
                "please run header.add_contig() first."
            )
        if self.mode in ("b", "bu"):
            self._emit(self._encode_bcf(fields))
        else:
            self._emit((line + "\n").encode())

    def write_record(
        self,
        chrom: str,
        pos: int,
        ref: str,
        alt: str,
        id: str = ".",
        qual: float | None = None,
        filters: str = "PASS",
        info: dict | None = None,
        gts: np.ndarray | list | None = None,
        phased: bool = True,
    ) -> None:
        """Write one structured record.  ``pos`` is 1-based (VCF convention);
        ``gts`` is an (n_samples, ploidy) int array of allele indices with
        -1 = missing; ``phased`` applies to every sample."""
        qual_s = "." if qual is None else f"{qual:g}"
        if info is None:
            info_s = "."
        else:
            parts = []
            for k, v in info.items():
                if v is True:
                    parts.append(k)
                elif isinstance(v, (list, tuple)):
                    parts.append(f"{k}={','.join(str(x) for x in v)}")
                else:
                    parts.append(f"{k}={v}")
            info_s = ";".join(parts) if parts else "."
        fields = [chrom, str(pos), id, ref, alt, qual_s, filters, info_s]
        if gts is not None:
            g = np.asarray(gts)
            if g.ndim == 1:
                g = g[None, :]
            sep = "|" if phased else "/"
            fields.append("GT")
            for row in g:
                fields.append(sep.join("." if a < 0 else str(int(a)) for a in row))
        self.write_line("\t".join(fields))

    # -- BCF2 record encoding ------------------------------------------------

    def _encode_bcf(self, f: list[str]) -> bytes:
        chrom, pos1, vid, ref, alt = f[0], int(f[1]), f[2], f[3], f[4]
        qual_s, filt_s, info_s = f[5], f[6], f[7]
        rid = self._contig_dict[chrom]
        alts = [] if alt == "." else alt.split(",")
        alleles = [ref.encode()] + [a.encode() for a in alts]
        n_allele = len(alleles)
        n_sample = len(self.header.samples)

        info_pairs = []
        if info_s not in (".", ""):
            for item in info_s.split(";"):
                if not item:
                    continue
                if "=" in item:
                    k, v = item.split("=", 1)
                else:
                    k, v = item, None
                if k not in self._dict:
                    raise RuntimeError(f"INFO tag {k} not found in the header")
                info_pairs.append((k, v))

        shared = bytearray()
        shared += struct.pack("<iii", rid, pos1 - 1, len(ref))
        if qual_s in (".", ""):
            shared += struct.pack("<I", _MISSING_QUAL)
        else:
            shared += struct.pack("<f", float(qual_s))
        shared += struct.pack("<I", (n_allele << 16) | len(info_pairs))
        has_gt = len(f) > 8 and "GT" in f[8].split(":")
        n_fmt = 1 if (has_gt and n_sample) else 0
        shared += struct.pack("<I", (n_fmt << 24) | n_sample)
        shared += _typed_str(vid.encode()) if vid not in (".", "") else bytes([0x07])
        for a in alleles:
            shared += _typed_str(a)
        if filt_s in (".", ""):
            shared += bytes([0x00])
        else:
            fids = [self._dict[x] for x in filt_s.split(";")]
            shared += _typed_int_vec(fids)
        for k, v in info_pairs:
            shared += _typed_scalar_int(self._dict[k])
            shared += self._encode_info_value(k, v)

        indiv = bytearray()
        if n_fmt:
            fmt_i = f[8].split(":").index("GT")
            indiv += _typed_scalar_int(self._dict["GT"])
            gt_texts = [f[9 + s].split(":")[fmt_i] for s in range(n_sample)]
            ploidy = max(
                (len(g.replace("|", "/").split("/")) for g in gt_texts), default=2
            )
            indiv += _size_prefix(_BT_INT8, ploidy)
            for g in gt_texts:
                sep = "|" if "|" in g else "/"
                avals = g.split(sep)
                enc = []
                for j, av in enumerate(avals[:ploidy]):
                    e = 0 if av == "." else ((int(av) + 1) << 1)
                    if j >= 1 and sep == "|":
                        e |= 1
                    enc.append(e)
                while len(enc) < ploidy:
                    enc.append(0x81)  # int8 vector-end padding
                indiv += struct.pack(
                    f"<{ploidy}b", *(e - 256 if e > 127 else e for e in enc)
                )

        return struct.pack("<II", len(shared), len(indiv)) + shared + indiv

    def _encode_info_value(self, key: str, value: str | None) -> bytes:
        if value is None:
            return bytes([0x00])  # Flag: typed MISSING, count 0
        itype = self.header.info_type(key)
        vals = value.split(",")
        if itype == "Integer":
            return _typed_int_vec([int(x) for x in vals])
        if itype == "Float":
            return _typed_float_vec([float(x) for x in vals])
        return _typed_str(value.encode())


class BcfWriter(VcfWriter):
    """Convenience subclass fixing the output format to BCF
    (compressed unless ``mode='bu'``) — mirrors constructing the reference's
    ``BcfWriter`` with a ``b``/``bu`` mode string (``cpp/vcfpp.h:1530-1544``)."""

    def __init__(self, path: str, header: VcfHeader | None = None, version: str = "VCF4.2", mode: str = "b", level: int = 6):
        if mode not in ("b", "bu"):
            raise ValueError("BcfWriter mode must be 'b' or 'bu'")
        super().__init__(path, header=header, version=version, mode=mode, level=level)
