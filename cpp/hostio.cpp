/*
 * hostio — host-side I/O shim for the TPU-native genotype engine.
 *
 * Covers exactly the un-accelerable work htslib does for the reference
 * (BGZF block decompression, record access, FASTA access; see reference
 * cpp/vcfpp.h BcfReader + pysam FastaFile usage in fasta_encoder.py:86):
 *
 *   - BGZF/gzip/plain VCF decompression (multithreaded BGZF block decode —
 *     the counterpart of htslib's hts_set_threads, vcfpp.h:1388).
 *   - VCF record framing: tab-tokenizes each data line and packs the fields
 *     the pipeline needs (CHROM, POS digits, REF, ALT, one sample's GT
 *     subfield) into fixed 64-byte record slots.  Everything semantic —
 *     integer parsing, SNP predicate, genotype/phase decode — happens on the
 *     accelerator (haplohyped_tpu/ops/vcf_decode.py).
 *   - FASTA indexing + subsequence fetch (the pysam-faidx role).
 *
 * Exposed as a plain C ABI for ctypes (no pybind11 on this system).
 *
 * Framed record layout (stride 64, little-endian; mirrored in
 * haplohyped_tpu/hostio/frame_format.py — keep in sync):
 *   [0:8)   chrom bytes     [8]  chrom_len
 *   [9:21)  pos ASCII digits[21] pos_len
 *   [22:38) ref bytes       [38] ref_len (capped at 255; bytes capped at 16)
 *   [39:55) alt bytes       [55] alt_len (capped at 255; bytes capped at 16)
 *   [56:62) gt bytes        [62] gt_len  (capped at 6)
 *   [63]    flags: bit0 = line well-formed (>= 8 tab-separated fields)
 *                  bit1 = sample GT subfield present
 */

#include "hostio_common.h"

using namespace hh;

namespace {

/* Short-field separator scan: VCF's fixed fields (CHROM..FORMAT) and
 * per-sample GT columns are a handful of bytes, where glibc memchr's
 * call + vector-setup overhead (~15 ns) dominates the scan itself —
 * measured ~10% of the whole frame_v2 pass at 9 hops/line.  A tight
 * byte loop covers the first 24 bytes; anything longer (rare wide INFO
 * fields) falls back to SIMD memchr.  Semantics identical to
 * memchr(p, c, n). */
static inline const uint8_t *find_sep(const uint8_t *p, size_t n, uint8_t c) {
    size_t lim = n < 24 ? n : 24;
    for (size_t i = 0; i < lim; i++)
        if (p[i] == c) return p + i;
    if (n > 24) return (const uint8_t *)memchr(p + 24, c, n - 24);
    return nullptr;
}

constexpr size_t kRecSize = 64;
constexpr size_t kRec12 = 12;
constexpr size_t kRec12ChromIdOff = 9; /* keep in sync with pack_rec12 */

/* ------------------------------------------------------------------ */
/* VCF framing                                                         */
/* ------------------------------------------------------------------ */

struct Region {
    std::string chrom;  /* empty = no filter */
    int64_t beg = -1;   /* 0-based inclusive; -1 = unbounded */
    int64_t end = -1;   /* 0-based exclusive; -1 = unbounded */
};

/* Parse "chr22" / "chr22:100-200" (1-based inclusive, htslib style). */
Region parse_region(const char *region) {
    Region r;
    if (!region || !*region) return r;
    std::string s(region);
    size_t colon = s.rfind(':');
    if (colon == std::string::npos || s.find('-', colon) == std::string::npos) {
        r.chrom = s;
        return r;
    }
    r.chrom = s.substr(0, colon);
    size_t dash = s.find('-', colon);
    std::string b = s.substr(colon + 1, dash - colon - 1);
    std::string e = s.substr(dash + 1);
    if (!b.empty()) r.beg = atoll(b.c_str()) - 1;
    if (!e.empty()) r.end = atoll(e.c_str());
    return r;
}

struct HeaderInfo {
    std::vector<std::string> samples;
    size_t data_start = 0;  /* byte offset of first data line */
    bool found_chrom_line = false;
};

bool parse_header(const std::vector<uint8_t> &text, HeaderInfo &hi,
                  std::string &err) {
    size_t off = 0, n = text.size();
    while (off < n && text[off] == '#') {
        const uint8_t *nl = (const uint8_t *)memchr(text.data() + off, '\n', n - off);
        size_t line_end = nl ? (size_t)(nl - text.data()) : n;
        if (off + 6 <= n && memcmp(text.data() + off, "#CHROM", 6) == 0) {
            hi.found_chrom_line = true;
            /* sample names are fields 9.. */
            size_t p = off;
            int field = 0;
            size_t fstart = off;
            while (p <= line_end) {
                if (p == line_end || text[p] == '\t') {
                    if (field >= 9) {
                        size_t flen = p - fstart;
                        /* strip trailing \r */
                        while (flen > 0 && text[fstart + flen - 1] == '\r') flen--;
                        hi.samples.emplace_back((const char *)text.data() + fstart, flen);
                    }
                    field++;
                    fstart = p + 1;
                }
                if (p == line_end) break;
                p++;
            }
        }
        off = line_end + 1;
    }
    hi.data_start = off;
    if (!hi.found_chrom_line) {
        err = "VCF has no #CHROM header line";
        return false;
    }
    return true;
}

/* Located fields of one data line (tab offsets of the fixed prefix plus the
 * target sample's GT subfield span). */
struct LineFields {
    size_t fstart[9];
    size_t flen[9];
    size_t len = 0;      /* line length after \r strip */
    size_t gt_start = 0; /* GT subfield span (valid when has_gt) */
    size_t gt_len = 0;
    bool has_gt = false;
};

/* Tokenize one data line: locate fields 0..8 (and the sample GT subfield
 * when sample_col >= 0) and apply the region filter.  Returns false if the
 * record should be skipped (region mismatch / malformed beyond use). */
inline bool locate_line(const uint8_t *line, size_t len, const Region &region,
                        int sample_col /* -1 = none */, int gt_subfield,
                        LineFields &lf) {
    /* strip \r */
    while (len > 0 && line[len - 1] == '\r') len--;
    if (len == 0) return false;
    lf.len = len;

    /* Locate tab offsets for the fixed prefix (fields 0..8). */
    size_t p = 0;
    int field = 0;
    size_t start = 0;
    int want_fields = sample_col >= 0 ? 9 : 8;
    while (field < want_fields && p <= len) {
        if (p == len || line[p] == '\t') {
            lf.fstart[field] = start;
            lf.flen[field] = p - start;
            field++;
            start = p + 1;
        }
        if (p == len) break;
        p++;
    }
    if (field < 8) return false; /* malformed */

    /* region filter on CHROM */
    if (!region.chrom.empty()) {
        if (lf.flen[0] != region.chrom.size() ||
            memcmp(line + lf.fstart[0], region.chrom.data(), lf.flen[0]) != 0)
            return false;
        if (region.beg >= 0 || region.end >= 0) {
            int64_t pos = 0;
            for (size_t i = 0; i < lf.flen[1]; i++) {
                uint8_t c = line[lf.fstart[1] + i];
                if (c < '0' || c > '9') { pos = -1; break; }
                pos = pos * 10 + (c - '0');
            }
            int64_t start0 = pos - 1;
            if (pos < 0) return false;
            if (region.beg >= 0 && start0 < region.beg) {
                /* htslib region semantics: keep records overlapping the
                 * region; an SNP at start0 < beg doesn't overlap. */
                return false;
            }
            if (region.end >= 0 && start0 >= region.end) return false;
        }
    }

    /* sample GT subfield */
    lf.has_gt = false;
    if (sample_col >= 0) {
        /* walk to tab #(9 + sample_col) */
        size_t sp = start; /* start of field 9 (if field==9 reached) */
        int cur = 9;
        if (field < 9) return false;
        while (cur < 9 + sample_col && sp < len) {
            const uint8_t *tab = find_sep(line + sp, len - sp, '\t');
            if (!tab) break;
            sp = (size_t)(tab - line) + 1;
            cur++;
        }
        if (cur == 9 + sample_col && sp <= len) {
            const uint8_t *tab = find_sep(line + sp, len - sp, '\t');
            size_t fend = tab ? (size_t)(tab - line) : len;
            /* select the gt_subfield-th ':'-separated subfield */
            size_t gs = sp;
            for (int k = 0; k < gt_subfield && gs < fend; k++) {
                const uint8_t *col = find_sep(line + gs, fend - gs, ':');
                if (!col) { gs = fend; break; }
                gs = (size_t)(col - line) + 1;
            }
            if (gs < fend) {
                const uint8_t *col = find_sep(line + gs, fend - gs, ':');
                size_t gend = col ? (size_t)(col - line) : fend;
                lf.gt_start = gs;
                lf.gt_len = gend - gs;
                lf.has_gt = true;
            }
        }
    }
    return true;
}

/* Pack located fields into the 64-byte record layout (header comment). */
inline void pack_rec64(const uint8_t *line, const LineFields &lf, uint8_t *rec) {
    memset(rec, 0, kRecSize);
    uint8_t flags = 1;
    /* chrom */
    size_t cl = lf.flen[0] < 8 ? lf.flen[0] : 8;
    memcpy(rec + 0, line + lf.fstart[0], cl);
    rec[8] = (uint8_t)cl;
    /* pos digits */
    size_t pl = lf.flen[1] < 12 ? lf.flen[1] : 12;
    memcpy(rec + 9, line + lf.fstart[1], pl);
    rec[21] = (uint8_t)pl;
    /* ref */
    size_t rl = lf.flen[3] < 16 ? lf.flen[3] : 16;
    memcpy(rec + 22, line + lf.fstart[3], rl);
    rec[38] = lf.flen[3] < 255 ? (uint8_t)lf.flen[3] : 255;
    /* alt */
    size_t al = lf.flen[4] < 16 ? lf.flen[4] : 16;
    memcpy(rec + 39, line + lf.fstart[4], al);
    rec[55] = lf.flen[4] < 255 ? (uint8_t)lf.flen[4] : 255;
    if (lf.has_gt) {
        size_t gcap = lf.gt_len < 6 ? lf.gt_len : 6;
        memcpy(rec + 56, line + lf.gt_start, gcap);
        rec[62] = (uint8_t)gcap;
        flags |= 2;
    }
    rec[63] = flags;
}

/* GT character -> 4-bit class used by the compact layout: digits keep their
 * value (presence decode on device is nibble != 0), '.' -> 0xA (missing),
 * anything else -> 0xB.  Keep in sync with frame_format.py GT_NIBBLE_*. */
inline uint8_t gt_nibble(uint8_t c) {
    if (c >= '0' && c <= '9') return c - '0';
    if (c == '.') return 0xA;
    return 0xB;
}

/* Pack located fields into the compact 12-byte record layout used by the
 * SNP pipeline fast path (mirrored in frame_format.py — keep in sync):
 *   [0:5)  POS as 10 BCD nibbles, most-significant first, zero-padded left
 *          (device parse: sum(nibble_i * 10^(9-i)) — no length needed)
 *   [5]    ref first byte    [6] alt first byte
 *   [7]    ref_len (capped 255)  [8] alt_len (capped 255)
 *   [9]    chrom_id (index into the per-call chrom table)
 *   [10]   GT nibbles: first-allele class << 4 | second-allele class
 *   [11]   flags: bit0 well-formed (>= 8 fields AND POS is 1-10 digits)
 *                 bit1 GT subfield present
 *                 bit2 GT has >= 3 chars (diploid length)
 *                 bit3 GT separator is '|'   bit4 separator is '/'
 * Only the first REF/ALT byte is kept: the SNP predicate needs lengths, and
 * post-filter records are single-base by definition (vcfpp.h isSNP).  The
 * host only tokenizes and re-codes bytes; POS integer value, the SNP
 * predicate, and genotype presence/missing/phase semantics are decoded on
 * the accelerator (ops/vcf_decode.py decode_frames12). */
inline void pack_rec12(const uint8_t *line, const LineFields &lf,
                       uint8_t chrom_id, uint8_t *rec) {
    memset(rec, 0, kRec12);
    uint8_t flags = 0;
    /* POS -> BCD nibbles (validated: all digits, 1..10 of them) */
    size_t pl = lf.flen[1];
    if (pl >= 1 && pl <= 10) {
        bool ok = true;
        for (size_t j = 0; j < pl; j++) {
            uint8_t c = line[lf.fstart[1] + j];
            if (c < '0' || c > '9') { ok = false; break; }
            size_t slot = 10 - pl + j; /* zero-padded left */
            rec[slot >> 1] |= (uint8_t)((c - '0') << ((slot & 1) ? 0 : 4));
        }
        if (ok) flags |= 1;
        else memset(rec, 0, 5);
    }
    rec[5] = lf.flen[3] ? line[lf.fstart[3]] : 0;
    rec[6] = lf.flen[4] ? line[lf.fstart[4]] : 0;
    rec[7] = lf.flen[3] < 255 ? (uint8_t)lf.flen[3] : 255;
    rec[8] = lf.flen[4] < 255 ? (uint8_t)lf.flen[4] : 255;
    rec[9] = chrom_id;
    if (lf.has_gt) {
        flags |= 2;
        uint8_t g0 = lf.gt_len > 0 ? gt_nibble(line[lf.gt_start]) : 0xB;
        uint8_t g2 = lf.gt_len > 2 ? gt_nibble(line[lf.gt_start + 2]) : 0xB;
        rec[10] = (uint8_t)(g0 << 4) | g2;
        if (lf.gt_len >= 3) {
            flags |= 4;
            uint8_t sep = line[lf.gt_start + 1];
            if (sep == '|') flags |= 8;
            else if (sep == '/') flags |= 16;
        }
    }
    rec[11] = flags;
}

/* Find index of "GT" in a FORMAT field (colon separated); -1 if absent. */
inline int gt_subfield_index(const uint8_t *fmt, size_t len) {
    int idx = 0;
    size_t p = 0;
    while (p < len) {
        const uint8_t *col = (const uint8_t *)memchr(fmt + p, ':', len - p);
        size_t fend = col ? (size_t)(col - fmt) : len;
        if (fend - p == 2 && fmt[p] == 'G' && fmt[p + 1] == 'T') return idx;
        idx++;
        p = fend + 1;
    }
    return -1;
}

struct FrameOutput {
    std::vector<uint8_t> records;
    int64_t total_seen = 0;
    std::vector<std::string> chroms; /* compact mode: thread-local chrom table */
    bool chrom_overflow = false;     /* compact mode: > 255 distinct chroms */
};

/* Frame a byte range [lo, hi) of data lines (lo must sit at a line start).
 * compact=false packs 64-byte records; compact=true packs 24-byte records
 * with chrom strings interned into out.chroms (ids are thread-local; the
 * caller remaps to a global table). */
void frame_range(const std::vector<uint8_t> &text, size_t lo, size_t hi,
                 const Region &region, int sample_col, bool compact,
                 FrameOutput &out) {
    const size_t rec_size = compact ? kRec12 : kRecSize;
    uint8_t rec[kRecSize];
    size_t off = lo;
    out.records.reserve((hi - lo) / 80 * rec_size);
    int last_chrom = -1;
    auto intern_chrom = [&](const uint8_t *c, size_t l) -> int {
        if (last_chrom >= 0 && out.chroms[(size_t)last_chrom].size() == l &&
            memcmp(out.chroms[(size_t)last_chrom].data(), c, l) == 0)
            return last_chrom;
        for (size_t i = 0; i < out.chroms.size(); i++) {
            if (out.chroms[i].size() == l && memcmp(out.chroms[i].data(), c, l) == 0) {
                last_chrom = (int)i;
                return last_chrom;
            }
        }
        if (out.chroms.size() >= 255) {
            out.chrom_overflow = true;
            return -1;
        }
        out.chroms.emplace_back((const char *)c, l);
        last_chrom = (int)out.chroms.size() - 1;
        return last_chrom;
    };
    while (off < hi) {
        const uint8_t *nl =
            (const uint8_t *)memchr(text.data() + off, '\n', text.size() - off);
        size_t line_end = nl ? (size_t)(nl - text.data()) : text.size();
        size_t len = line_end - off;
        if (len > 0 && text[off] != '#') {
            out.total_seen++;
            /* GT subfield index: per-line FORMAT lookup is cheap relative to
             * the sample walk; most files have GT first. Fast path: check
             * FORMAT starts with "GT" at framing time inside frame_line is
             * messy, so locate FORMAT here only when a sample is wanted. */
            int gt_idx = 0;
            if (sample_col >= 0) {
                /* find field 8 (FORMAT) */
                size_t p = off;
                int f = 0;
                size_t fs = off;
                size_t fmt_start = 0, fmt_len = 0;
                while (p <= line_end && f <= 8) {
                    if (p == line_end || text[p] == '\t') {
                        if (f == 8) {
                            fmt_start = fs;
                            fmt_len = p - fs;
                            break;
                        }
                        f++;
                        fs = p + 1;
                    }
                    if (p == line_end) break;
                    p++;
                }
                if (fmt_len >= 2) {
                    if (fmt_len == 2 && text[fmt_start] == 'G' &&
                        text[fmt_start + 1] == 'T')
                        gt_idx = 0;
                    else if (text[fmt_start] == 'G' && text[fmt_start + 1] == 'T' &&
                             text[fmt_start + 2] == ':')
                        gt_idx = 0;
                    else
                        gt_idx = gt_subfield_index(text.data() + fmt_start, fmt_len);
                } else {
                    gt_idx = -1;
                }
            }
            LineFields lf;
            if (gt_idx >= 0 &&
                locate_line(text.data() + off, len, region, sample_col, gt_idx, lf)) {
                if (compact) {
                    const uint8_t *line = text.data() + off;
                    int cid = intern_chrom(line + lf.fstart[0], lf.flen[0]);
                    if (cid >= 0) {
                        pack_rec12(line, lf, (uint8_t)cid, rec);
                        out.records.insert(out.records.end(), rec, rec + kRec12);
                    }
                } else {
                    pack_rec64(text.data() + off, lf, rec);
                    out.records.insert(out.records.end(), rec, rec + kRecSize);
                }
            }
        }
        off = line_end + 1;
    }
}

/* Shared framing driver: decompress, parse header, resolve sample column,
 * split into line-snapped thread ranges, frame.  Returns 0 on success,
 * 1 on I/O/header error, 2 on unknown sample. */
int frame_vcf_threaded(const char *path, const char *sample, const char *region,
                       int threads, bool compact,
                       std::vector<FrameOutput> &parts, std::string &err) {
    std::vector<uint8_t> text;
    if (!load_text(path, threads, text, err)) return 1;
    HeaderInfo hi;
    if (!parse_header(text, hi, err)) return 1;
    int sample_col = -1;
    if (sample && *sample) {
        for (size_t i = 0; i < hi.samples.size(); i++) {
            if (hi.samples[i] == sample) {
                sample_col = (int)i;
                break;
            }
        }
        if (sample_col < 0) {
            err = std::string("sample not found in VCF header: ") + sample;
            return 2;
        }
    }
    Region reg = parse_region(region);

    /* Split data region into nthreads chunks snapped to line starts. */
    int nthreads = threads > 0 ? threads : 1;
    size_t lo = hi.data_start, n = text.size();
    size_t span = n - lo;
    if (span / 1000000 < (size_t)nthreads) {
        nthreads = (int)(span / 1000000) + 1; /* small inputs: fewer threads */
    }
    std::vector<size_t> bounds;
    bounds.push_back(lo);
    for (int t = 1; t < nthreads; t++) {
        size_t target = lo + span * (size_t)t / (size_t)nthreads;
        const uint8_t *nl =
            (const uint8_t *)memchr(text.data() + target, '\n', n - target);
        size_t b = nl ? (size_t)(nl - text.data()) + 1 : n;
        if (b <= bounds.back()) b = bounds.back();
        bounds.push_back(b);
    }
    bounds.push_back(n);

    parts.assign((size_t)nthreads, FrameOutput());
    {
        std::vector<std::thread> pool;
        for (int t = 1; t < nthreads; t++) {
            pool.emplace_back([&, t]() {
                frame_range(text, bounds[t], bounds[t + 1], reg, sample_col,
                            compact, parts[t]);
            });
        }
        frame_range(text, bounds[0], bounds[1], reg, sample_col, compact,
                    parts[0]);
        for (auto &th : pool) th.join();
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* v2 compact framing: 5-byte fixed records + (N, S) GT byte matrix    */
/*                                                                     */
/* The round-2 wire format: half the single-sample bytes of the 12-    */
/* byte layout and S-sample extraction in ONE file pass (the reference */
/* re-reads the file per donor, vcf_to_h5.py:142-152).  Layout is      */
/* mirrored in haplohyped_tpu/hostio/frame_format.py (V2_*) — keep in  */
/* sync.  Fixed record (5 bytes):                                      */
/*   [0:2) POS delta from previous record, u16 LE (0 + ESCAPE flag     */
/*         when first-in-chunk / chrom change / negative / > 65535 /   */
/*         malformed; the absolute POS goes to the exceptions arrays)  */
/*   [2]   first REF byte   [3] first ALT byte                         */
/*   [4]   flags: bit0 WELL_FORMED (>= 8 fields, POS 1-10 digits       */
/*               fitting u32), bit1 REF1 (ref_len == 1), bit2 ALT1,    */
/*               bit3 POS_ESCAPE                                       */
/* Per-sample GT byte:                                                 */
/*   bits0-1 first-allele class  (0 '0', 1 nonzero digit, 2 '.',       */
/*           3 other/absent)                                           */
/*   bits2-3 second-allele class (same)                                */
/*   bits4-5 separator (0 none/short, 1 '|', 2 '/', 3 other)           */
/*   bit6 HAS_GT   bit7 DIPLOID_LEN (>= 3 chars)                       */
/* Side arrays (device reconstructs POS via cumsum + exception fix-up, */
/* chrom ids via run-length searchsorted):                             */
/*   exc_idx/exc_pos — global record index + absolute POS of escapes   */
/*   run_counts/run_ids — chrom run lengths + table ids                */
/* POS integer reconstruction, the SNP predicate, and genotype         */
/* presence/missing/phase semantics all decode on the accelerator      */
/* (ops/vcf_decode.py decode_frames_v2).                               */
/* ------------------------------------------------------------------ */

constexpr size_t kV2Fixed = 5;

/* 2-bit GT allele class (see layout comment). */
inline uint8_t gt_class2(uint8_t c) {
    if (c == '0') return 0;
    if (c >= '1' && c <= '9') return 1;
    if (c == '.') return 2;
    return 3;
}

struct V2Part {
    std::vector<uint8_t> fixed;      /* n * 5 */
    std::vector<uint8_t> gts;        /* n * S */
    std::vector<int64_t> exc_idx;    /* part-local record indices */
    std::vector<uint32_t> exc_pos;   /* absolute POS (1-based; 0 = malformed) */
    std::vector<int64_t> run_counts; /* chrom run lengths */
    std::vector<uint8_t> run_ids;    /* part-local chrom ids */
    std::vector<std::string> chroms; /* part-local chrom table */
    int64_t total_seen = 0;
    bool chrom_overflow = false;
    int64_t n = 0;
};

/* Frame byte range [lo, hi) of data lines into the v2 layout.
 * col_to_slot maps sample column index -> output GT slot (-1 = unwanted);
 * n_slots is S.  Threads get independent parts; the caller merges. */
void frame_range_v2(const std::vector<uint8_t> &text, size_t lo, size_t hi,
                    const Region &region, const std::vector<int> &col_to_slot,
                    int n_slots, V2Part &out) {
    const size_t S = (size_t)n_slots;
    /* Reserve to avoid regrowth copies. Lines average ~50 bytes on narrow
     * cohorts, but wide-cohort lines are ~4*S bytes, so (hi-lo)/40*S wildly
     * overshoots (and can bad_alloc) at large S.  Each emitted GT byte
     * consumes >= 2 input bytes ("0|" at minimum), so (hi-lo)/2 is a hard
     * output bound; take the smaller estimate. */
    out.fixed.reserve(std::min((hi - lo) / 40 * kV2Fixed, (hi - lo)));
    out.gts.reserve(std::min((hi - lo) / 40 * (S ? S : 1), (hi - lo) / 2 + 1));
    /* last sample column anyone wants: the GT walk can stop there instead
     * of memchr-hopping every remaining column of wide cohort lines */
    int max_col = -1;
    for (size_t i = 0; i < col_to_slot.size(); i++)
        if (col_to_slot[i] >= 0) max_col = (int)i;
    std::vector<uint8_t> gt_row(S, 0);
    int64_t prev_pos = -1; /* -1 = next record must escape */
    int last_chrom = -1;
    size_t off = lo;
    auto intern_chrom = [&](const uint8_t *c, size_t l) -> int {
        if (last_chrom >= 0 && out.chroms[(size_t)last_chrom].size() == l &&
            memcmp(out.chroms[(size_t)last_chrom].data(), c, l) == 0)
            return last_chrom;
        for (size_t i = 0; i < out.chroms.size(); i++) {
            if (out.chroms[i].size() == l &&
                memcmp(out.chroms[i].data(), c, l) == 0)
                return (int)i;
        }
        if (out.chroms.size() >= 255) {
            out.chrom_overflow = true;
            return -1;
        }
        out.chroms.emplace_back((const char *)c, l);
        return (int)out.chroms.size() - 1;
    };
    while (off < hi) {
        const uint8_t *nl =
            (const uint8_t *)memchr(text.data() + off, '\n', text.size() - off);
        size_t line_end = nl ? (size_t)(nl - text.data()) : text.size();
        size_t len = line_end - off;
        const uint8_t *line = text.data() + off;
        while (len > 0 && line[len - 1] == '\r') len--;
        if (len == 0 || line[0] == '#') {
            off = line_end + 1;
            continue;
        }
        out.total_seen++;

        /* --- locate fields 0..8 via short-scan hops (find_sep) ------ */
        size_t fstart[9], flen[9];
        size_t start = 0;
        int field = 0;
        while (field < 9) {
            const uint8_t *tab =
                start < len ? find_sep(line + start, len - start, '\t')
                            : nullptr;
            fstart[field] = start;
            flen[field] = tab ? (size_t)(tab - line) - start : len - start;
            field++;
            if (!tab) break;
            start = (size_t)(tab - line) + 1;
        }
        if (field < 8) {
            off = line_end + 1;
            continue; /* malformed beyond use (reference skips too) */
        }

        /* --- region filter ------------------------------------------ */
        if (!region.chrom.empty()) {
            if (flen[0] != region.chrom.size() ||
                memcmp(line + fstart[0], region.chrom.data(), flen[0]) != 0) {
                off = line_end + 1;
                continue;
            }
        }

        /* --- POS parse (host validates; device reconstructs) -------- */
        int64_t pos = 0;
        bool pos_ok = flen[1] >= 1 && flen[1] <= 10;
        if (pos_ok) {
            for (size_t i = 0; i < flen[1]; i++) {
                uint8_t c = line[fstart[1] + i];
                if (c < '0' || c > '9') {
                    pos_ok = false;
                    break;
                }
                pos = pos * 10 + (c - '0');
            }
        }
        if (pos_ok && pos > 0xFFFFFFFFll) pos_ok = false;
        if (!region.chrom.empty() && (region.beg >= 0 || region.end >= 0)) {
            if (!pos_ok) {
                off = line_end + 1;
                continue;
            }
            int64_t start0 = pos - 1;
            if ((region.beg >= 0 && start0 < region.beg) ||
                (region.end >= 0 && start0 >= region.end)) {
                off = line_end + 1;
                continue;
            }
        }

        int cid = intern_chrom(line + fstart[0], flen[0]);
        if (cid < 0) return; /* chrom overflow — caller falls back */

        /* --- GT subfield index from FORMAT -------------------------- */
        int gt_idx = 0;
        if (S > 0) {
            if (field < 9 || flen[8] < 2) {
                gt_idx = -1;
            } else if (line[fstart[8]] == 'G' && line[fstart[8] + 1] == 'T' &&
                       (flen[8] == 2 || line[fstart[8] + 2] == ':')) {
                gt_idx = 0;
            } else {
                gt_idx = gt_subfield_index(line + fstart[8], flen[8]);
            }
            if (gt_idx < 0) {
                /* no GT in FORMAT: skip the record (reference parity — a
                 * sample fetch with no GT yields nothing, vcfpp.h:483) */
                off = line_end + 1;
                continue;
            }
        }

        /* --- per-sample GT bytes (one walk over columns 9..) -------- */
        if (S > 0) {
            std::fill(gt_row.begin(), gt_row.end(), (uint8_t)0);
            size_t sp = start; /* start of field 9 */
            size_t col = 0;
            const size_t n_cols =
                max_col >= 0 ? (size_t)max_col + 1 : col_to_slot.size();
            while (col < n_cols && sp <= len) {
                const uint8_t *tab = find_sep(line + sp, len - sp, '\t');
                size_t fend = tab ? (size_t)(tab - line) : len;
                int slot = col_to_slot[col];
                if (slot >= 0) {
                    /* select the gt_idx-th ':' subfield */
                    size_t gs = sp;
                    bool found = true;
                    for (int k = 0; k < gt_idx; k++) {
                        const uint8_t *c = find_sep(line + gs, fend - gs, ':');
                        if (!c) {
                            found = false;
                            break;
                        }
                        gs = (size_t)(c - line) + 1;
                    }
                    if (found && gs < fend) {
                        const uint8_t *c = find_sep(line + gs, fend - gs, ':');
                        size_t gend = c ? (size_t)(c - line) : fend;
                        size_t gl = gend - gs;
                        uint8_t g = 0x40; /* HAS_GT */
                        g |= gt_class2(gl > 0 ? line[gs] : 0);
                        g |= (uint8_t)(gt_class2(gl > 2 ? line[gs + 2] : 0) << 2);
                        if (gl >= 2) {
                            uint8_t sep = line[gs + 1];
                            uint8_t sc = sep == '|' ? 1 : (sep == '/' ? 2 : 3);
                            g |= (uint8_t)(sc << 4);
                        }
                        if (gl >= 3) g |= 0x80; /* DIPLOID_LEN */
                        gt_row[(size_t)slot] = g;
                    }
                }
                if (!tab) break;
                sp = fend + 1;
                col++;
            }
        }

        /* --- fixed record ------------------------------------------- */
        uint8_t rec[kV2Fixed] = {0, 0, 0, 0, 0};
        uint8_t flags = 0;
        if (pos_ok) flags |= 1; /* WELL_FORMED */
        if (flen[3] == 1) flags |= 2;
        if (flen[4] == 1) flags |= 4;
        rec[2] = flen[3] ? line[fstart[3]] : 0;
        rec[3] = flen[4] ? line[fstart[4]] : 0;
        int64_t delta = pos_ok ? pos - prev_pos : -1;
        if (!pos_ok || prev_pos < 0 || cid != last_chrom || delta < 0 ||
            delta > 0xFFFF) {
            flags |= 8; /* POS_ESCAPE */
            out.exc_idx.push_back(out.n);
            out.exc_pos.push_back(pos_ok ? (uint32_t)pos : 0);
        } else {
            rec[0] = (uint8_t)(delta & 0xFF);
            rec[1] = (uint8_t)(delta >> 8);
        }
        prev_pos = pos_ok ? pos : -1;
        rec[4] = flags;
        out.fixed.insert(out.fixed.end(), rec, rec + kV2Fixed);
        if (S > 0) out.gts.insert(out.gts.end(), gt_row.begin(), gt_row.end());

        /* --- chrom run-length --------------------------------------- */
        if (last_chrom == cid && !out.run_counts.empty()) {
            out.run_counts.back()++;
        } else {
            out.run_counts.push_back(1);
            out.run_ids.push_back((uint8_t)cid);
        }
        last_chrom = cid;
        out.n++;
        off = line_end + 1;
    }
}

/* Decompress only the blocks needed for (header + [c_lo, c_hi]) of a BGZF
 * file.  c_lo/c_hi are compressed offsets of the first/last block to decode
 * (from tabix virtual offsets); u_skip is the in-block uncompressed offset
 * of the first record.  Output `text` = header bytes + body bytes and
 * `frame_from` = offset where framing starts.  Counts decoded blocks. */
bool load_text_range(const char *path, int64_t c_lo, int64_t u_skip,
                     int64_t c_hi, std::vector<uint8_t> &text,
                     size_t &frame_from, int64_t &blocks_decoded,
                     std::string &err) {
    std::vector<uint8_t> raw;
    if (!read_file(path, raw, err)) return false;
    if (!is_bgzf(raw)) {
        err = "range framing requires a BGZF file";
        return false;
    }
    std::vector<BgzfBlock> blocks;
    size_t total = 0;
    if (!scan_bgzf_blocks(raw, blocks, total, err)) return false;
    blocks_decoded = 0;

    auto decode_one = [&](size_t i, uint8_t *dst) -> bool {
        const BgzfBlock &b = blocks[i];
        if (b.usize == 0) return true;
        size_t xlen = raw[b.coffset + 10] | (raw[b.coffset + 11] << 8);
        size_t data_off = b.coffset + 12 + xlen;
        size_t data_len = b.csize - (12 + xlen) - 8;
        blocks_decoded++;
        return inflate_raw_block(raw.data() + data_off, data_len, dst, b.usize);
    };

    /* header: decode blocks from 0 until #CHROM + first data line found */
    std::vector<uint8_t> head;
    HeaderInfo hi;
    size_t hb = 0;
    for (; hb < blocks.size(); hb++) {
        size_t old = head.size();
        head.resize(old + blocks[hb].usize);
        if (!decode_one(hb, head.data() + old)) {
            err = "BGZF block decompression failed (header)";
            return false;
        }
        hi = HeaderInfo();
        std::string herr;
        if (parse_header(head, hi, herr) && hi.data_start < head.size()) break;
    }
    if (hb == blocks.size()) {
        err = "VCF has no #CHROM header line";
        return false;
    }

    /* body block range from compressed offsets */
    size_t b_lo = 0;
    {
        size_t lo = 0, hi2 = blocks.size();
        while (lo < hi2) {
            size_t mid = (lo + hi2) / 2;
            if ((int64_t)blocks[mid].coffset < c_lo)
                lo = mid + 1;
            else
                hi2 = mid;
        }
        b_lo = (lo < blocks.size() && (int64_t)blocks[lo].coffset == c_lo)
                   ? lo
                   : (lo > 0 ? lo - 1 : 0);
    }
    size_t b_hi = b_lo; /* inclusive */
    while (b_hi + 1 < blocks.size() && (int64_t)blocks[b_hi].coffset < c_hi)
        b_hi++;

    /* absolute uncompressed start of the first record */
    size_t abs_u = blocks[b_lo].uoffset + (size_t)(u_skip > 0 ? u_skip : 0);
    if (abs_u < hi.data_start) abs_u = hi.data_start;

    /* decode the body range (extend while the final line is unterminated) */
    std::vector<uint8_t> body;
    size_t body_base = blocks[b_lo].uoffset;
    for (size_t i = b_lo; i <= b_hi && i < blocks.size(); i++) {
        size_t old = body.size();
        body.resize(old + blocks[i].usize);
        if (!decode_one(i, body.data() + old)) {
            err = "BGZF block decompression failed (body)";
            return false;
        }
    }
    while (!body.empty() && body.back() != '\n' && b_hi + 1 < blocks.size()) {
        b_hi++;
        size_t old = body.size();
        body.resize(old + blocks[b_hi].usize);
        if (!decode_one(b_hi, body.data() + old)) {
            err = "BGZF block decompression failed (extend)";
            return false;
        }
    }

    /* compose: header prefix + body from the record start */
    size_t skip_in_body = abs_u > body_base ? abs_u - body_base : 0;
    if (skip_in_body > body.size()) skip_in_body = body.size();
    text.assign(head.begin(), head.begin() + (long)hi.data_start);
    frame_from = text.size();
    text.insert(text.end(), body.begin() + (long)skip_in_body, body.end());
    return true;
}

/* Shared v2 framing driver.  samples: NULL/"" = no GT (S=0), "*" = all
 * header samples, else newline-joined names.  c_lo >= 0 selects indexed
 * range mode (BGZF only).  Returns 0 ok, 1 I/O/header error, 2 unknown
 * sample, 3 chrom-table overflow. */
int frame_vcf_v2(const char *path, const char *samples, const char *region,
                 int threads, int64_t c_lo, int64_t u_skip, int64_t c_hi,
                 std::vector<V2Part> &parts, std::vector<std::string> &order,
                 int64_t &blocks_decoded, std::string &err) {
    std::vector<uint8_t> text;
    size_t frame_from = 0;
    blocks_decoded = -1; /* -1 = full scan (no range accounting) */
    if (c_lo >= 0) {
        if (!load_text_range(path, c_lo, u_skip, c_hi, text, frame_from,
                             blocks_decoded, err))
            return 1;
    } else {
        if (!load_text(path, threads, text, err)) return 1;
    }
    HeaderInfo hi;
    if (!parse_header(text, hi, err)) return 1;
    if (c_lo < 0) frame_from = hi.data_start;

    /* resolve sample set -> column slots */
    std::vector<int> col_to_slot(hi.samples.size(), -1);
    int n_slots = 0;
    if (samples && *samples) {
        if (strcmp(samples, "*") == 0) {
            for (size_t i = 0; i < hi.samples.size(); i++)
                col_to_slot[i] = (int)i;
            n_slots = (int)hi.samples.size();
            order = hi.samples;
        } else {
            std::string s(samples);
            size_t p = 0;
            while (p <= s.size()) {
                size_t nlp = s.find('\n', p);
                std::string name =
                    s.substr(p, nlp == std::string::npos ? nlp : nlp - p);
                if (!name.empty()) {
                    int colidx = -1;
                    for (size_t i = 0; i < hi.samples.size(); i++) {
                        if (hi.samples[i] == name) {
                            colidx = (int)i;
                            break;
                        }
                    }
                    if (colidx < 0) {
                        err = "sample not found in VCF header: " + name;
                        return 2;
                    }
                    col_to_slot[(size_t)colidx] = n_slots++;
                    order.push_back(name);
                }
                if (nlp == std::string::npos) break;
                p = nlp + 1;
            }
        }
    }
    Region reg = parse_region(region);

    /* line-snapped thread ranges over the data span */
    int nthreads = threads > 0 ? threads : 1;
    size_t lo = frame_from, n = text.size();
    size_t span = n > lo ? n - lo : 0;
    if (span / 1000000 < (size_t)nthreads)
        nthreads = (int)(span / 1000000) + 1;
    std::vector<size_t> bounds;
    bounds.push_back(lo);
    for (int t = 1; t < nthreads; t++) {
        size_t target = lo + span * (size_t)t / (size_t)nthreads;
        const uint8_t *nl =
            (const uint8_t *)memchr(text.data() + target, '\n', n - target);
        size_t b = nl ? (size_t)(nl - text.data()) + 1 : n;
        if (b <= bounds.back()) b = bounds.back();
        bounds.push_back(b);
    }
    bounds.push_back(n);

    parts.assign((size_t)nthreads, V2Part());
    {
        std::vector<std::thread> pool;
        for (int t = 1; t < nthreads; t++) {
            pool.emplace_back([&, t]() {
                frame_range_v2(text, bounds[t], bounds[t + 1], reg,
                               col_to_slot, n_slots, parts[t]);
            });
        }
        frame_range_v2(text, bounds[0], bounds[1], reg, col_to_slot, n_slots,
                       parts[0]);
        for (auto &th : pool) th.join();
    }
    for (auto &pt : parts) {
        if (pt.chrom_overflow) {
            err = "more than 255 distinct chroms; use the 64-byte framer";
            return 3;
        }
    }
    return 0;
}

}  // namespace

/* ------------------------------------------------------------------ */
/* C API                                                               */
/* ------------------------------------------------------------------ */

extern "C" {

void hh_free(void *p) { free(p); }

/* Decompress a VCF (bgzf/gzip/plain) and return sample names, newline
 * joined.  BGZF files stop decompressing once the header is complete
 * (header-only cost instead of a full file pass).  Returns 0 on success. */
int hh_vcf_samples(const char *path, int threads, char **out, int64_t *n_samples,
                   char *errbuf, int errlen) {
    ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<uint8_t> text;
    HeaderInfo hi;
    {
        std::vector<uint8_t> raw;
        bool header_done = false;
        if (read_file(path, raw, err) && is_bgzf(raw)) {
            std::vector<BgzfBlock> blocks;
            size_t total = 0;
            if (scan_bgzf_blocks(raw, blocks, total, err)) {
                for (size_t i = 0; i < blocks.size(); i++) {
                    const BgzfBlock &b = blocks[i];
                    size_t old = text.size();
                    text.resize(old + b.usize);
                    if (b.usize) {
                        size_t xlen =
                            raw[b.coffset + 10] | (raw[b.coffset + 11] << 8);
                        if (!inflate_raw_block(
                                raw.data() + b.coffset + 12 + xlen,
                                b.csize - (12 + xlen) - 8, text.data() + old,
                                b.usize)) {
                            eb.set("BGZF block decompression failed");
                            return 1;
                        }
                    }
                    hi = HeaderInfo();
                    std::string herr;
                    if (parse_header(text, hi, herr) &&
                        hi.data_start <= text.size()) {
                        header_done = true;
                        break;
                    }
                }
                if (!header_done) {
                    eb.set("VCF has no #CHROM header line");
                    return 1;
                }
            }
        }
        if (!header_done) {
            text.clear();
            if (!load_text(path, threads, text, err)) {
                eb.set(err);
                return 1;
            }
            hi = HeaderInfo();
            if (!parse_header(text, hi, err)) {
                eb.set(err);
                return 1;
            }
        }
    }
    std::string joined;
    for (size_t i = 0; i < hi.samples.size(); i++) {
        if (i) joined += '\n';
        joined += hi.samples[i];
    }
    char *buf = (char *)malloc(joined.size() + 1);
    memcpy(buf, joined.c_str(), joined.size() + 1);
    *out = buf;
    *n_samples = (int64_t)hi.samples.size();
    return 0;
}

/*
 * Frame a VCF into 64-byte records.
 *   sample: sample name to extract GT for, or NULL/"" for no-sample framing.
 *   region: "chr22" / "chr22:100-200" / NULL.
 * On success *out is a malloc'd buffer of (*out_n) * 64 bytes.
 */
int hh_vcf_frame(const char *path, const char *sample, const char *region,
                 int threads, uint8_t **out, int64_t *out_n,
                 int64_t *total_seen, char *errbuf, int errlen) {
    ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<FrameOutput> parts;
    int rc = frame_vcf_threaded(path, sample, region, threads, false, parts, err);
    if (rc != 0) {
        eb.set(err);
        return rc;
    }

    size_t total_bytes = 0;
    int64_t seen = 0;
    for (auto &pt : parts) {
        total_bytes += pt.records.size();
        seen += pt.total_seen;
    }
    uint8_t *buf = (uint8_t *)malloc(total_bytes ? total_bytes : 1);
    size_t off = 0;
    for (auto &pt : parts) {
        memcpy(buf + off, pt.records.data(), pt.records.size());
        off += pt.records.size();
    }
    *out = buf;
    *out_n = (int64_t)(total_bytes / kRecSize);
    if (total_seen) *total_seen = seen;
    return 0;
}

/*
 * Frame a VCF into compact 12-byte records (SNP-pipeline fast path:
 * 5.3x fewer bytes shipped to the accelerator than the 64-byte layout).
 * On success *out is a malloc'd (*out_n) * 12 buffer and *chroms_out a
 * malloc'd newline-joined chrom table indexed by each record's chrom_id.
 * Returns 3 if the file has > 255 distinct chroms (caller should fall back
 * to the 64-byte layout, which stores chrom strings inline).
 */
int hh_vcf_frame12(const char *path, const char *sample, const char *region,
                   int threads, uint8_t **out, int64_t *out_n,
                   int64_t *total_seen, char **chroms_out, char *errbuf,
                   int errlen) {
    ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<FrameOutput> parts;
    int rc = frame_vcf_threaded(path, sample, region, threads, true, parts, err);
    if (rc != 0) {
        eb.set(err);
        return rc;
    }

    /* Merge thread-local chrom tables into one global table (first-seen
     * order across parts) and remap each part's ids while concatenating. */
    std::vector<std::string> chroms;
    size_t total_bytes = 0;
    int64_t seen = 0;
    for (auto &pt : parts) {
        if (pt.chrom_overflow) {
            eb.set("more than 255 distinct chroms; use the 64-byte framer");
            return 3;
        }
        total_bytes += pt.records.size();
        seen += pt.total_seen;
        for (auto &c : pt.chroms) {
            bool found = false;
            for (auto &g : chroms)
                if (g == c) { found = true; break; }
            if (!found) chroms.push_back(c);
        }
    }
    if (chroms.size() > 255) {
        eb.set("more than 255 distinct chroms; use the 64-byte framer");
        return 3;
    }
    uint8_t *buf = (uint8_t *)malloc(total_bytes ? total_bytes : 1);
    size_t off = 0;
    for (auto &pt : parts) {
        uint8_t remap[256] = {0};
        for (size_t i = 0; i < pt.chroms.size(); i++) {
            for (size_t g = 0; g < chroms.size(); g++) {
                if (chroms[g] == pt.chroms[i]) {
                    remap[i] = (uint8_t)g;
                    break;
                }
            }
        }
        memcpy(buf + off, pt.records.data(), pt.records.size());
        for (size_t r = off; r < off + pt.records.size(); r += kRec12)
            buf[r + kRec12ChromIdOff] = remap[buf[r + kRec12ChromIdOff]];
        off += pt.records.size();
    }
    std::string joined;
    for (size_t i = 0; i < chroms.size(); i++) {
        if (i) joined += '\n';
        joined += chroms[i];
    }
    char *cbuf = (char *)malloc(joined.size() + 1);
    memcpy(cbuf, joined.c_str(), joined.size() + 1);
    *chroms_out = cbuf;
    *out = buf;
    *out_n = (int64_t)(total_bytes / kRec12);
    if (total_seen) *total_seen = seen;
    return 0;
}

/*
 * Frame a VCF into the v2 compact layout (5-byte fixed records + an (n, S)
 * GT byte matrix + POS-exception and chrom-run side arrays; see the layout
 * comment above frame_range_v2).  samples: NULL/"" = no genotypes, "*" =
 * every header sample, else newline-joined names (output GT slot order
 * follows the given order; *samples_out echoes it resolved).  c_lo >= 0
 * selects indexed range mode: only BGZF blocks [c_lo, c_hi] (compressed
 * offsets, e.g. from a tabix virtual offset) plus the header blocks are
 * decompressed, u_skip giving the first record's in-block offset;
 * *blocks_decoded reports how many blocks were actually inflated (-1 for a
 * full scan).  Returns 0 ok, 1 I/O error, 2 unknown sample, 3 > 255 chroms.
 */
int hh_vcf_frame_v2(const char *path, const char *samples, const char *region,
                    int threads, int64_t c_lo, int64_t u_skip, int64_t c_hi,
                    uint8_t **fixed_out, uint8_t **gt_out, int64_t *out_n,
                    int32_t *out_s, int64_t **exc_idx_out,
                    uint32_t **exc_pos_out, int64_t *n_exc,
                    int64_t **run_counts_out, uint8_t **run_ids_out,
                    int64_t *n_runs, char **chroms_out, char **samples_out,
                    int64_t *total_seen, int64_t *blocks_decoded, char *errbuf,
                    int errlen) {
    ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<V2Part> parts;
    std::vector<std::string> order;
    int64_t nblk = -1;
    int rc = frame_vcf_v2(path, samples, region, threads, c_lo, u_skip, c_hi,
                          parts, order, nblk, err);
    if (rc != 0) {
        eb.set(err);
        return rc;
    }

    /* global chrom table (first-seen across parts, in part order) */
    std::vector<std::string> chroms;
    int64_t n = 0, seen = 0, total_exc = 0;
    size_t total_runs = 0, s = 0;
    for (auto &pt : parts) {
        n += pt.n;
        seen += pt.total_seen;
        total_exc += (int64_t)pt.exc_idx.size();
        total_runs += pt.run_counts.size();
        for (auto &c : pt.chroms) {
            bool found = false;
            for (auto &g : chroms)
                if (g == c) {
                    found = true;
                    break;
                }
            if (!found) chroms.push_back(c);
        }
    }
    s = order.size();
    if (chroms.size() > 255) {
        eb.set("more than 255 distinct chroms; use the 64-byte framer");
        return 3;
    }

    uint8_t *fbuf = (uint8_t *)malloc((size_t)n * kV2Fixed + 1);
    uint8_t *gbuf = (uint8_t *)malloc((size_t)n * (s ? s : 1) + 1);
    int64_t *ebuf = (int64_t *)malloc((size_t)total_exc * 8 + 1);
    uint32_t *pbuf = (uint32_t *)malloc((size_t)total_exc * 4 + 1);
    int64_t *rcbuf = (int64_t *)malloc(total_runs * 8 + 1);
    uint8_t *ribuf = (uint8_t *)malloc(total_runs + 1);

    size_t foff = 0, goff = 0, eoff = 0, roff = 0;
    int64_t rec_off = 0;
    int prev_run_id = -1;
    for (auto &pt : parts) {
        uint8_t remap[256] = {0};
        for (size_t i = 0; i < pt.chroms.size(); i++) {
            for (size_t g = 0; g < chroms.size(); g++) {
                if (chroms[g] == pt.chroms[i]) {
                    remap[i] = (uint8_t)g;
                    break;
                }
            }
        }
        memcpy(fbuf + foff, pt.fixed.data(), pt.fixed.size());
        foff += pt.fixed.size();
        if (s) {
            memcpy(gbuf + goff, pt.gts.data(), pt.gts.size());
            goff += pt.gts.size();
        }
        for (size_t i = 0; i < pt.exc_idx.size(); i++) {
            ebuf[eoff] = pt.exc_idx[i] + rec_off;
            pbuf[eoff] = pt.exc_pos[i];
            eoff++;
        }
        for (size_t i = 0; i < pt.run_counts.size(); i++) {
            int gid = remap[pt.run_ids[i]];
            if (gid == prev_run_id && roff > 0) {
                rcbuf[roff - 1] += pt.run_counts[i]; /* coalesce across parts */
            } else {
                rcbuf[roff] = pt.run_counts[i];
                ribuf[roff] = (uint8_t)gid;
                roff++;
                prev_run_id = gid;
            }
        }
        rec_off += pt.n;
    }

    auto join = [](const std::vector<std::string> &v) -> char * {
        std::string joined;
        for (size_t i = 0; i < v.size(); i++) {
            if (i) joined += '\n';
            joined += v[i];
        }
        char *b = (char *)malloc(joined.size() + 1);
        memcpy(b, joined.c_str(), joined.size() + 1);
        return b;
    };
    *fixed_out = fbuf;
    *gt_out = gbuf;
    *out_n = n;
    *out_s = (int32_t)s;
    *exc_idx_out = ebuf;
    *exc_pos_out = pbuf;
    *n_exc = (int64_t)eoff;
    *run_counts_out = rcbuf;
    *run_ids_out = ribuf;
    *n_runs = (int64_t)roff;
    *chroms_out = join(chroms);
    *samples_out = join(order);
    if (total_seen) *total_seen = seen;
    if (blocks_decoded) *blocks_decoded = nblk;
    return 0;
}

/*
 * Decompress a VCF and return the raw text plus data-line offsets/lengths —
 * the minimal host work for the on-device tokenizer path: the accelerator
 * does all tab-scanning and field decoding from (text, offsets).
 *
 * Outputs (all malloc'd, caller frees with hh_free):
 *   text_out/text_len   decompressed bytes
 *   line_off / line_len n_lines data-line start offsets + lengths (no \n)
 *   samples_out         newline-joined sample names from #CHROM
 */
int hh_vcf_text(const char *path, int threads, uint8_t **text_out,
                int64_t *text_len, int64_t **line_off_out,
                int32_t **line_len_out, int64_t *n_lines, char **samples_out,
                char *errbuf, int errlen) {
    ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<uint8_t> raw;
    if (!read_file(path, raw, err)) {
        eb.set(err);
        return 1;
    }

    uint8_t *tbuf = nullptr;
    size_t n = 0;
    std::vector<std::vector<int64_t>> nl_parts; /* per-worker newline offsets */

    if (is_bgzf(raw)) {
        /* BGZF: decompress blocks in parallel straight into the output
         * buffer AND scan newlines while each block is cache-hot. */
        std::vector<BgzfBlock> blocks;
        size_t total = 0;
        if (!scan_bgzf_blocks(raw, blocks, total, err)) {
            eb.set(err);
            return 1;
        }
        n = total;
        tbuf = (uint8_t *)malloc(n ? n : 1);
        int nthreads = threads > 0 ? threads : 1;
        if ((size_t)nthreads > blocks.size()) nthreads = blocks.size() ? (int)blocks.size() : 1;
        nl_parts.resize((size_t)nthreads);
        std::atomic<bool> ok{true};
        auto worker = [&](int t) {
            size_t lo = blocks.size() * (size_t)t / (size_t)nthreads;
            size_t hi2 = blocks.size() * (size_t)(t + 1) / (size_t)nthreads;
            auto &nls = nl_parts[(size_t)t];
            for (size_t i = lo; i < hi2 && ok.load(); i++) {
                const BgzfBlock &b = blocks[i];
                if (b.usize == 0) continue;
                size_t xlen = raw[b.coffset + 10] | (raw[b.coffset + 11] << 8);
                size_t data_off = b.coffset + 12 + xlen;
                size_t data_len = b.csize - (12 + xlen) - 8;
                uint8_t *dst = tbuf + b.uoffset;
                if (!inflate_raw_block(raw.data() + data_off, data_len, dst,
                                       b.usize)) {
                    ok.store(false);
                    return;
                }
                const uint8_t *p = dst, *end = dst + b.usize;
                while ((p = (const uint8_t *)memchr(p, '\n', (size_t)(end - p)))) {
                    nls.push_back((int64_t)(p - tbuf));
                    p++;
                }
            }
        };
        std::vector<std::thread> pool;
        for (int t = 1; t < nthreads; t++) pool.emplace_back(worker, t);
        worker(0);
        for (auto &th : pool) th.join();
        if (!ok.load()) {
            free(tbuf);
            eb.set("BGZF block decompression failed");
            return 1;
        }
    } else {
        /* gzip / plain: decompress (single stream) then scan newlines. */
        std::vector<uint8_t> text;
        if (is_gzip(raw)) {
            if (!decompress_gzip(raw, text, err)) {
                eb.set(err);
                return 1;
            }
        } else {
            text = std::move(raw);
        }
        n = text.size();
        tbuf = (uint8_t *)malloc(n ? n : 1);
        memcpy(tbuf, text.data(), n);
        nl_parts.resize(1);
        const uint8_t *p = tbuf, *end = tbuf + n;
        while ((p = (const uint8_t *)memchr(p, '\n', (size_t)(end - p)))) {
            nl_parts[0].push_back((int64_t)(p - tbuf));
            p++;
        }
    }

    /* header: find data_start + samples from the decompressed text */
    std::vector<uint8_t> view;  /* cheap header-only copy (first lines) */
    {
        size_t head_span = n < (1u << 20) ? n : (1u << 20);
        /* headers can exceed 1MB (big contig lists) — grow until #CHROM */
        HeaderInfo tmp;
        std::string herr;
        for (;;) {
            view.assign(tbuf, tbuf + head_span);
            tmp = HeaderInfo();
            if (parse_header(view, tmp, herr) && tmp.data_start <= head_span)
                break;
            if (head_span == n) {
                free(tbuf);
                eb.set("VCF has no #CHROM header line");
                return 1;
            }
            head_span = head_span * 4 < n ? head_span * 4 : n;
        }
        /* success path falls through with tmp valid */
        std::string joined;
        for (size_t i = 0; i < tmp.samples.size(); i++) {
            if (i) joined += '\n';
            joined += tmp.samples[i];
        }
        char *sbuf0 = (char *)malloc(joined.size() + 1);
        memcpy(sbuf0, joined.c_str(), joined.size() + 1);
        *samples_out = sbuf0;

        /* derive data-line offsets/lengths from newline offsets */
        size_t total_nl = 0;
        for (auto &v : nl_parts) total_nl += v.size();
        int64_t *obuf = (int64_t *)malloc((total_nl + 1) * sizeof(int64_t) + 1);
        int32_t *lbuf = (int32_t *)malloc((total_nl + 1) * sizeof(int32_t) + 1);
        size_t cnt = 0;
        int64_t prev_nl = -1;
        int64_t ds = (int64_t)tmp.data_start;
        auto emit = [&](int64_t line_start, int64_t line_end) {
            if (line_start < ds) return;
            int64_t len = line_end - line_start;
            while (len > 0 && tbuf[line_start + len - 1] == '\r') len--;
            if (len > 0 && tbuf[line_start] != '#') {
                obuf[cnt] = line_start;
                lbuf[cnt] = (int32_t)len;
                cnt++;
            }
        };
        for (auto &v : nl_parts) {
            for (int64_t nlpos : v) {
                emit(prev_nl + 1, nlpos);
                prev_nl = nlpos;
            }
        }
        if (prev_nl + 1 < (int64_t)n) emit(prev_nl + 1, (int64_t)n);
        *line_off_out = obuf;
        *line_len_out = lbuf;
        *n_lines = (int64_t)cnt;
    }

    *text_out = tbuf;
    *text_len = (int64_t)n;
    return 0;
}

/*
 * Decompress a VCF and return text + per-data-line structure for the
 * columnar analysis surface (hostio/variants.py VariantTable): line
 * offsets/lengths, the positions of each line's first 9 tabs (int32,
 * relative to line start; clipped to line length when fewer), and the
 * parsed POS value (0 when malformed / > 12 digits).  One threaded pass
 * over the decompressed text — the Python side does no per-record work.
 */
int hh_vcf_index(const char *path, int threads, uint8_t **text_out,
                 int64_t *text_len, int64_t **line_off_out,
                 int32_t **line_len_out, int64_t *n_lines,
                 int32_t **bounds_out, int64_t **pos_out, char **samples_out,
                 char *errbuf, int errlen) {
    ErrBuf eb{errbuf, errlen};
    /* reuse hh_vcf_text for decompress + line indexing + samples */
    int rc = hh_vcf_text(path, threads, text_out, text_len, line_off_out,
                         line_len_out, n_lines, samples_out, errbuf, errlen);
    if (rc != 0) return rc;
    const uint8_t *text = *text_out;
    const int64_t *offs = *line_off_out;
    const int32_t *lens = *line_len_out;
    int64_t n = *n_lines;

    int32_t *bounds = (int32_t *)malloc((size_t)n * 9 * 4 + 1);
    int64_t *pos = (int64_t *)malloc((size_t)n * 8 + 1);
    if (!bounds || !pos) {
        free(bounds);
        free(pos);
        eb.set("out of memory");
        return 1;
    }
    int nthreads = threads > 0 ? threads : 1;
    auto worker = [&](int t) {
        int64_t lo = n * t / nthreads, hi = n * (t + 1) / nthreads;
        for (int64_t i = lo; i < hi; i++) {
            const uint8_t *line = text + offs[i];
            int32_t len = lens[i];
            int32_t *b = bounds + i * 9;
            int32_t p = 0;
            for (int k = 0; k < 9; k++) {
                const uint8_t *tab = p < len
                    ? (const uint8_t *)memchr(line + p, '\t', (size_t)(len - p))
                    : nullptr;
                b[k] = tab ? (int32_t)(tab - line) : len;
                p = b[k] + 1;
            }
            /* POS: digits between tab0 and tab1 */
            int64_t v = 0;
            int32_t s = b[0] + 1, e = b[1];
            bool ok = e > s && e - s <= 12;
            for (int32_t j = s; ok && j < e; j++) {
                uint8_t c = line[j];
                if (c < '0' || c > '9') { ok = false; break; }
                v = v * 10 + (c - '0');
            }
            pos[i] = ok ? v : 0;
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 1; t < nthreads; t++) pool.emplace_back(worker, t);
        worker(0);
        for (auto &th : pool) th.join();
    }
    *bounds_out = bounds;
    *pos_out = pos;
    return 0;
}

/* ------------------------------------------------------------------ */
/* Streaming BGZF range decoder                                        */
/*                                                                     */
/* Lets the Python driver pipeline host decompression against device   */
/* upload/compute: open once (block scan only), then decode contiguous */
/* block ranges into caller-provided buffers, newline offsets fused.   */
/* ------------------------------------------------------------------ */

struct HHBgzf {
    std::vector<uint8_t> raw;
    std::vector<BgzfBlock> blocks;
    size_t total_usize = 0;
};

void *hh_bgzf_open(const char *path, int64_t *total_usize, int64_t *n_blocks,
                   char *errbuf, int errlen) {
    ErrBuf eb{errbuf, errlen};
    std::string err;
    auto h = std::make_unique<HHBgzf>();
    if (!read_file(path, h->raw, err)) {
        eb.set(err);
        return nullptr;
    }
    if (!is_bgzf(h->raw)) {
        eb.set("not a BGZF file");
        return nullptr;
    }
    if (!scan_bgzf_blocks(h->raw, h->blocks, h->total_usize, err)) {
        eb.set(err);
        return nullptr;
    }
    *total_usize = (int64_t)h->total_usize;
    *n_blocks = (int64_t)h->blocks.size();
    return h.release();
}

void hh_bgzf_close(void *handle) { delete (HHBgzf *)handle; }

int64_t hh_bgzf_uoffset(void *handle, int64_t i) {
    HHBgzf *h = (HHBgzf *)handle;
    if (i < 0) return -1;
    if ((size_t)i >= h->blocks.size()) return (int64_t)h->total_usize;
    return (int64_t)h->blocks[(size_t)i].uoffset;
}

int64_t hh_bgzf_coffset(void *handle, int64_t i) {
    HHBgzf *h = (HHBgzf *)handle;
    if (i < 0) return -1;
    if ((size_t)i >= h->blocks.size()) return (int64_t)h->raw.size();
    return (int64_t)h->blocks[(size_t)i].coffset;
}

/* Block index containing compressed offset coffset (exact match expected
 * for tabix virtual offsets); -1 if out of range. */
int64_t hh_bgzf_block_at(void *handle, int64_t coffset) {
    HHBgzf *h = (HHBgzf *)handle;
    size_t lo = 0, hi = h->blocks.size();
    while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        if ((int64_t)h->blocks[mid].coffset < coffset)
            lo = mid + 1;
        else
            hi = mid;
    }
    if (lo < h->blocks.size() && (int64_t)h->blocks[lo].coffset == coffset)
        return (int64_t)lo;
    return lo > 0 ? (int64_t)(lo - 1) : 0;
}

/* Decompress blocks [lo, hi) into dst (caller-sized); fused newline scan.
 * nl_out: malloc'd newline offsets RELATIVE to range start. */
int hh_bgzf_decode_range(void *handle, int64_t lo, int64_t hi, int threads,
                         uint8_t *dst, int64_t **nl_out, int64_t *n_nl,
                         char *errbuf, int errlen) {
    ErrBuf eb{errbuf, errlen};
    HHBgzf *h = (HHBgzf *)handle;
    if (lo < 0 || hi > (int64_t)h->blocks.size() || lo > hi) {
        eb.set("bad block range");
        return 1;
    }
    size_t base = (size_t)hh_bgzf_uoffset(handle, lo);
    size_t nb = (size_t)(hi - lo);
    int nthreads = threads > 0 ? threads : 1;
    if ((size_t)nthreads > nb) nthreads = nb ? (int)nb : 1;
    std::vector<std::vector<int64_t>> nl_parts((size_t)nthreads);
    std::atomic<bool> ok{true};
    auto worker = [&](int t) {
        size_t blo = (size_t)lo + nb * (size_t)t / (size_t)nthreads;
        size_t bhi = (size_t)lo + nb * (size_t)(t + 1) / (size_t)nthreads;
        auto &nls = nl_parts[(size_t)t];
        for (size_t i = blo; i < bhi && ok.load(); i++) {
            const BgzfBlock &b = h->blocks[i];
            if (b.usize == 0) continue;
            size_t xlen = h->raw[b.coffset + 10] | (h->raw[b.coffset + 11] << 8);
            size_t data_off = b.coffset + 12 + xlen;
            size_t data_len = b.csize - (12 + xlen) - 8;
            uint8_t *d = dst + (b.uoffset - base);
            if (!inflate_raw_block(h->raw.data() + data_off, data_len, d, b.usize)) {
                ok.store(false);
                return;
            }
            const uint8_t *p = d, *end = d + b.usize;
            while ((p = (const uint8_t *)memchr(p, '\n', (size_t)(end - p)))) {
                nls.push_back((int64_t)(p - dst));
                p++;
            }
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 1; t < nthreads; t++) pool.emplace_back(worker, t);
        worker(0);
        for (auto &th : pool) th.join();
    }
    if (!ok.load()) {
        eb.set("BGZF block decompression failed");
        return 1;
    }
    size_t total_nl = 0;
    for (auto &v : nl_parts) total_nl += v.size();
    int64_t *nlbuf = (int64_t *)malloc(total_nl * sizeof(int64_t) + 1);
    size_t cnt = 0;
    for (auto &v : nl_parts) {
        memcpy(nlbuf + cnt, v.data(), v.size() * sizeof(int64_t));
        cnt += v.size();
    }
    *nl_out = nlbuf;
    *n_nl = (int64_t)total_nl;
    return 0;
}

/* ------------------------------------------------------------------ */
/* FASTA                                                               */
/* ------------------------------------------------------------------ */

struct HHFasta {
    std::vector<uint8_t> text; /* decompressed FASTA bytes */
    std::vector<std::string> names;
    std::vector<size_t> seq_offsets; /* offset of first sequence byte */
    std::vector<int64_t> lengths;    /* base count */
    std::vector<int> linebases;      /* bases per line */
    std::vector<int> linewidth;      /* bytes per line incl newline */
};

void *hh_fasta_open(const char *path, char *errbuf, int errlen) {
    ErrBuf eb{errbuf, errlen};
    std::string err;
    auto h = std::make_unique<HHFasta>();
    if (!load_text(path, 1, h->text, err)) {
        eb.set(err);
        return nullptr;
    }
    const std::vector<uint8_t> &t = h->text;
    size_t off = 0, n = t.size();
    while (off < n) {
        if (t[off] != '>') {
            eb.set("malformed FASTA (expected '>')");
            return nullptr;
        }
        const uint8_t *nl = (const uint8_t *)memchr(t.data() + off, '\n', n - off);
        if (!nl) break;
        size_t header_end = (size_t)(nl - t.data());
        /* name = up to first whitespace */
        size_t name_end = off + 1;
        while (name_end < header_end && t[name_end] != ' ' && t[name_end] != '\t' &&
               t[name_end] != '\r')
            name_end++;
        h->names.emplace_back((const char *)t.data() + off + 1, name_end - off - 1);
        size_t seq_start = header_end + 1;
        h->seq_offsets.push_back(seq_start);

        /* measure first line */
        int lb = 0, lw = 0;
        {
            size_t p = seq_start;
            while (p < n && t[p] != '\n' && t[p] != '>') {
                if (t[p] != '\r') lb++;
                p++;
            }
            lw = (int)(p - seq_start) + 1;
        }
        h->linebases.push_back(lb > 0 ? lb : 1);
        h->linewidth.push_back(lw > 0 ? lw : 1);

        /* scan to end of record counting bases */
        int64_t bases = 0;
        size_t p = seq_start;
        while (p < n && t[p] != '>') {
            const uint8_t *lnl = (const uint8_t *)memchr(t.data() + p, '\n', n - p);
            size_t le = lnl ? (size_t)(lnl - t.data()) : n;
            size_t ll = le - p;
            while (ll > 0 && t[p + ll - 1] == '\r') ll--;
            bases += (int64_t)ll;
            p = le + 1;
            if (!lnl) break;
        }
        h->lengths.push_back(bases);
        off = p;
    }
    return h.release();
}

void hh_fasta_close(void *handle) { delete (HHFasta *)handle; }

int hh_fasta_nseq(void *handle) { return (int)((HHFasta *)handle)->names.size(); }

int hh_fasta_name(void *handle, int i, char *buf, int buflen) {
    HHFasta *h = (HHFasta *)handle;
    if (i < 0 || (size_t)i >= h->names.size()) return 1;
    snprintf(buf, (size_t)buflen, "%s", h->names[i].c_str());
    return 0;
}

int64_t hh_fasta_length(void *handle, const char *name) {
    HHFasta *h = (HHFasta *)handle;
    for (size_t i = 0; i < h->names.size(); i++)
        if (h->names[i] == name) return h->lengths[i];
    return -1;
}

/* Fetch [start, end) (0-based) of a sequence into caller buffer (must hold
 * end-start bytes).  Out-of-range clamps; missing name returns -1; returns
 * number of bytes written. */
int64_t hh_fasta_fetch(void *handle, const char *name, int64_t start,
                       int64_t end, uint8_t *out) {
    HHFasta *h = (HHFasta *)handle;
    int idx = -1;
    for (size_t i = 0; i < h->names.size(); i++)
        if (h->names[i] == name) { idx = (int)i; break; }
    if (idx < 0) return -1;
    int64_t len = h->lengths[idx];
    if (start < 0) start = 0;
    if (end > len) end = len;
    if (end <= start) return 0;
    int lb = h->linebases[idx], lw = h->linewidth[idx];
    size_t base = h->seq_offsets[idx];
    int64_t want = end - start;
    int64_t written = 0;
    int64_t pos = start;
    while (written < want) {
        int64_t line = pos / lb;
        int64_t col = pos % lb;
        int64_t take = lb - col;
        if (take > want - written) take = want - written;
        size_t src = base + (size_t)(line * lw + col);
        memcpy(out + written, h->text.data() + src, (size_t)take);
        written += take;
        pos += take;
    }
    return written;
}

}  /* extern "C" */
