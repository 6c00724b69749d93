"""Column-oriented variant table: the full ``vcfpp::BcfRecord`` query surface.

The pipeline's hot path only needs the framed biallelic-SNP subset
(``hostio/frame_format.py`` → device decode).  This module is the *analysis*
surface: everything else the reference's record API exposes, re-shaped from
per-record C++ accessors into vectorized columns over the whole file —
predicates become boolean masks, genotype extraction returns one
``(n_variants, n_samples, ploidy)`` array.

Parity map (reference ``cpp/vcfpp.h``):

- ``CHROM/POS/Start/End/REF/ALT/QUAL`` accessors (``:1076-1154``;
  ``End = pos + rlen``, ``:1118-1127``) → columns.
- ``isSNP`` (``:990-1000``), ``isIndel`` (``:951-963``), ``isMultiAllelics``
  (``:965-970``), ``isMultiAllelicSNP`` (``:973-987``), ``isSV``
  (SVTYPE INFO present, ``:943-949``) → vectorized predicates.
- ``getGenotypes`` int form: allele index with missing = -9
  (``:546-589``); presence form: 0/1 with the whole missing sample coded
  het (1,0) (``:483-533``) → :meth:`VariantTable.genotypes`.
- ``gtPhase`` / ``isAllPhased`` / ``ploidy()`` (``:528-533``, ``:1270``) →
  :meth:`gt_phase`, :meth:`is_all_phased`, :meth:`ploidy`.
- ``getINFO``/``getFORMAT`` tag getters (``:591-950``) → :meth:`info_tag`,
  :meth:`format_tag` (typed via the header's declared Type).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from haplohyped_tpu.hostio.vcf import _parse_region, _read_text
from haplohyped_tpu.hostio.writer import VcfHeader

_MISSING_GT = -9  # vcfpp.h:572


@dataclass
class VariantTable:
    """All records of one VCF, as columns."""

    header: VcfHeader
    chrom: np.ndarray  # (n,) object
    pos: np.ndarray  # (n,) int64, 1-based
    id: np.ndarray  # (n,) object
    ref: np.ndarray  # (n,) object
    alts: list[tuple[str, ...]]  # per-record ALT allele tuple ('.' -> empty)
    qual: np.ndarray  # (n,) float32, NaN = missing
    filter: np.ndarray  # (n,) object
    info: list[dict]  # per-record {tag: str | True}
    format_keys: list[tuple[str, ...]]
    sample_fields: list[list[str]]  # per-record raw sample column strings
    samples: list[str] = field(default_factory=list)

    # -- construction -----------------------------------------------------

    @classmethod
    def from_vcf(cls, path: str, region: str | None = None) -> "VariantTable":
        text = _read_text(path)
        chrom_f, beg, end = _parse_region(region)
        header_chunks: list[str] = []
        chrom_c, pos_c, id_c, ref_c, qual_c, filt_c = [], [], [], [], [], []
        alts_c: list[tuple[str, ...]] = []
        info_c: list[dict] = []
        fmt_c: list[tuple[str, ...]] = []
        sf_c: list[list[str]] = []
        for raw in text.split(b"\n"):
            raw = raw.rstrip(b"\r")
            if not raw:
                continue
            if raw.startswith(b"#"):
                header_chunks.append(raw.decode() + "\n")
                continue
            f = raw.decode().split("\t")
            if len(f) < 8:
                continue
            if chrom_f and f[0] != chrom_f:
                continue
            p = int(f[1])
            if (beg >= 0 and p - 1 < beg) or (end >= 0 and p - 1 >= end):
                continue
            chrom_c.append(f[0])
            pos_c.append(p)
            id_c.append(f[2])
            ref_c.append(f[3])
            alts_c.append(() if f[4] == "." else tuple(f[4].split(",")))
            qual_c.append(np.nan if f[5] in (".", "") else float(f[5]))
            filt_c.append(f[6])
            d: dict = {}
            if f[7] not in (".", ""):
                for item in f[7].split(";"):
                    if "=" in item:
                        k, v = item.split("=", 1)
                        d[k] = v
                    elif item:
                        d[item] = True
            info_c.append(d)
            fmt_c.append(tuple(f[8].split(":")) if len(f) > 8 else ())
            sf_c.append(f[9:])
        header = VcfHeader.from_text("".join(header_chunks))
        return cls(
            header=header,
            chrom=np.array(chrom_c, dtype=object),
            pos=np.array(pos_c, dtype=np.int64),
            id=np.array(id_c, dtype=object),
            ref=np.array(ref_c, dtype=object),
            alts=alts_c,
            qual=np.array(qual_c, dtype=np.float32),
            filter=np.array(filt_c, dtype=object),
            info=info_c,
            format_keys=fmt_c,
            sample_fields=sf_c,
            samples=header.get_samples(),
        )

    # -- coordinates --------------------------------------------------------

    @property
    def n(self) -> int:
        return int(self.pos.shape[0])

    @property
    def start(self) -> np.ndarray:
        """0-based start (``BcfRecord::Start``, vcfpp.h:1118)."""
        return self.pos - 1

    @property
    def end(self) -> np.ndarray:
        """0-based exclusive end = start + len(REF) (``End()``, vcfpp.h:1127)."""
        return self.pos - 1 + np.array([len(r) for r in self.ref], dtype=np.int64)

    def _n_allele(self) -> np.ndarray:
        return np.array([1 + len(a) for a in self.alts], dtype=np.int32)

    # -- predicates (vectorized BcfRecord::is*) -------------------------------

    def is_sv(self) -> np.ndarray:
        """SVTYPE INFO tag present (vcfpp.h:943-949)."""
        return np.array(["SVTYPE" in d for d in self.info], dtype=bool)

    def is_snp(self) -> np.ndarray:
        """Exclusively biallelic SNP: one ALT ∈ {A,C,G,T}, REF length 1
        (vcfpp.h:990-1000)."""
        out = np.zeros(self.n, dtype=bool)
        for i, (r, a) in enumerate(zip(self.ref, self.alts)):
            out[i] = len(r) == 1 and len(a) == 1 and a[0] in ("A", "C", "G", "T")
        return out

    def is_indel(self) -> np.ndarray:
        """Exclusively INDEL (vcfpp.h:951-963): length-changing allele (or
        missing ALT '.') at a non-SV site."""
        sv = self.is_sv()
        out = np.zeros(self.n, dtype=bool)
        for i, (r, a) in enumerate(zip(self.ref, self.alts)):
            if len(r) > 1 and not sv[i]:
                out[i] = True
                continue
            for alt in a:
                if alt == ".":
                    out[i] = True
                    break
                if len(alt) != len(r) and not sv[i]:
                    out[i] = True
                    break
        return out

    def is_multiallelics(self) -> np.ndarray:
        """More than 2 alleles (vcfpp.h:965-970)."""
        return self._n_allele() > 2

    def is_multiallelic_snp(self) -> np.ndarray:
        """Multiallelic with REF length 1 and all single-base ALTs
        (vcfpp.h:973-987)."""
        out = np.zeros(self.n, dtype=bool)
        for i, (r, a) in enumerate(zip(self.ref, self.alts)):
            out[i] = len(r) == 1 and len(a) >= 2 and all(len(x) == 1 for x in a)
        return out

    # -- genotypes -------------------------------------------------------------

    def ploidy(self) -> int:
        """Max ploidy across the first record's samples (vcfpp nploidy)."""
        for gts, fmt in zip(self.sample_fields, self.format_keys):
            if "GT" in fmt and gts:
                gi = fmt.index("GT")
                return max(
                    len(g.split(":")[gi].replace("|", "/").split("/")) for g in gts
                )
        return 0

    def _gt_iter(self):
        for fmt, row in zip(self.format_keys, self.sample_fields):
            gi = fmt.index("GT") if "GT" in fmt else -1
            yield gi, row

    def genotypes(self, presence: bool = False) -> np.ndarray:
        """(n_variants, n_samples, ploidy) int8 allele matrix.

        ``presence=False`` → allele index, missing allele = -9
        (``getGenotypes(vector<int>&)``, vcfpp.h:546-589).
        ``presence=True`` → allele presence 0/1 with a missing *sample*
        coded (1, 0) (``getGenotypes<T>``, vcfpp.h:483-533) — the form the
        cohort pipeline stores as phase1/phase2.
        """
        P = max(self.ploidy(), 1)
        S = len(self.samples)
        out = np.full((self.n, S, P), _MISSING_GT, dtype=np.int8)
        for i, (gi, row) in enumerate(self._gt_iter()):
            if gi < 0:
                continue
            for s, cell in enumerate(row[:S]):
                g = cell.split(":")[gi]
                parts = g.replace("|", "/").split("/")
                if presence and any(x == "." for x in parts):
                    out[i, s, 0] = 1
                    out[i, s, 1:] = 0
                    continue
                for j, av in enumerate(parts[:P]):
                    if av == ".":
                        out[i, s, j] = _MISSING_GT
                    elif presence:
                        out[i, s, j] = 1 if int(av) != 0 else 0
                    else:
                        out[i, s, j] = min(int(av), 127)
        if presence:
            out[out == _MISSING_GT] = 0
        return out

    def gt_phase(self) -> np.ndarray:
        """(n_variants, n_samples) bool: every allele separator is '|'
        (gtPhase semantics — phase bit of the non-first alleles,
        vcfpp.h:528; haploid calls are unphased like htslib's text parser)."""
        S = len(self.samples)
        out = np.zeros((self.n, S), dtype=bool)
        for i, (gi, row) in enumerate(self._gt_iter()):
            if gi < 0:
                continue
            for s, cell in enumerate(row[:S]):
                g = cell.split(":")[gi]
                out[i, s] = "|" in g and "/" not in g
        return out

    def is_all_phased(self) -> np.ndarray:
        """(n_variants,) bool (isAllPhased, vcfpp.h:533)."""
        ph = self.gt_phase()
        return ph.all(axis=1) if ph.size else np.zeros(self.n, dtype=bool)

    # -- tags --------------------------------------------------------------------

    def info_tag(self, tag: str):
        """Typed INFO column: Integer/Float → float64 array (NaN missing,
        first value of vectors), Flag → bool array, else object array of
        raw strings (getINFO parity, vcfpp.h:591-697)."""
        itype = self.header.info_type(tag)
        if itype == "Flag":
            return np.array([bool(d.get(tag, False)) for d in self.info], dtype=bool)
        raw = [d.get(tag) for d in self.info]
        if itype in ("Integer", "Float"):
            out = np.full(self.n, np.nan)
            for i, v in enumerate(raw):
                if v is not None and v is not True:
                    out[i] = float(str(v).split(",")[0])
            return out
        return np.array([v if v is not None else "" for v in raw], dtype=object)

    def format_tag(self, tag: str) -> np.ndarray:
        """(n_variants, n_samples) FORMAT subfield values ('' when absent),
        numeric dtype when the header declares Integer/Float
        (getFORMAT parity, vcfpp.h:596-653)."""
        S = len(self.samples)
        vals = np.empty((self.n, S), dtype=object)
        vals[:] = ""
        for i, (fmt, row) in enumerate(zip(self.format_keys, self.sample_fields)):
            if tag not in fmt:
                continue
            ti = fmt.index(tag)
            for s, cell in enumerate(row[:S]):
                parts = cell.split(":")
                if ti < len(parts):
                    vals[i, s] = parts[ti]
        ftype = None
        for l in self.header.lines:
            if l.startswith("##FORMAT=<") and VcfHeader._line_id(l) == tag and "Type=" in l:
                ftype = l.split("Type=", 1)[1].split(",", 1)[0].split(">", 1)[0]
        if ftype in ("Integer", "Float"):
            num = np.full((self.n, S), np.nan)
            for i in range(self.n):
                for s in range(S):
                    v = vals[i, s]
                    if v not in ("", "."):
                        num[i, s] = float(str(v).split(",")[0])
            return num
        return vals
