/*
 * BCF2 (binary VCF) record parser — capability parity with the reference's
 * vcfpp BCF path (vcfpp.h BcfReader opens VCF or BCF transparently).
 *
 * BCF2.x layout (BGZF compressed):
 *   magic "BCF\2\1" or "BCF\2\2"
 *   l_text u32, header text (standard VCF header)
 *   records: l_shared u32, l_indiv u32, then
 *     shared: rid i32, pos i32, rlen i32, qual f32,
 *             n_allele<<16|n_info u32, n_fmt<<24|n_sample u32,
 *             ID (typed str), alleles (n_allele typed str),
 *             FILTER (typed int vec), INFO (n_info typed pairs)
 *     indiv:  per FORMAT field: typed-int key, value descriptor,
 *             n_sample fixed-size sample values
 *
 * Typed descriptor byte: low nibble = type (0=void,1=i8,2=i16,3=i32,5=f32,
 * 7=char), high nibble = count (15 -> following typed int is the count).
 *
 * GT sample values encode (allele+1)<<1 | phased; 0 = missing allele.
 *
 * Output: decoded columns directly (no text re-rendering): start/stop,
 * ref/alt first chars + lengths, phase1/phase2, flags, chrom id per record
 * plus the contig name table — the binary-path equivalent of the device
 * tokenizer's output.
 */

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "hostio_common.h"

namespace {

struct Cursor {
    const uint8_t *p;
    const uint8_t *end;
    bool ok = true;

    bool need(size_t n) {
        if ((size_t)(end - p) < n) {
            ok = false;
            return false;
        }
        return true;
    }
    uint8_t u8() {
        if (!need(1)) return 0;
        return *p++;
    }
    int32_t i32() {
        if (!need(4)) return 0;
        int32_t v;
        memcpy(&v, p, 4);
        p += 4;
        return v;
    }
    uint32_t u32() {
        if (!need(4)) return 0;
        uint32_t v;
        memcpy(&v, p, 4);
        p += 4;
        return v;
    }
};

/* read a typed int (for counts / dictionary keys) */
int64_t read_typed_int(Cursor &c) {
    uint8_t d = c.u8();
    int type = d & 0x0F;
    switch (type) {
        case 1: {
            if (!c.need(1)) return 0;
            int8_t v; memcpy(&v, c.p, 1); c.p += 1; return v;
        }
        case 2: {
            if (!c.need(2)) return 0;
            int16_t v; memcpy(&v, c.p, 2); c.p += 2; return v;
        }
        case 3: return c.i32();
        default: c.ok = false; return 0;
    }
}

size_t type_size(int type) {
    switch (type) {
        case 1: return 1;
        case 2: return 2;
        case 3: return 4;
        case 5: return 4;
        case 7: return 1;
        default: return 0;
    }
}

/* parse a typed-value header: returns (type, count); advances cursor */
bool read_type_desc(Cursor &c, int &type, int64_t &count) {
    uint8_t d = c.u8();
    type = d & 0x0F;
    count = d >> 4;
    if (count == 15) count = read_typed_int(c);
    return c.ok;
}

/* skip a complete typed value */
bool skip_typed(Cursor &c) {
    int type; int64_t count;
    if (!read_type_desc(c, type, count)) return false;
    if (type == 0) return true;
    size_t sz = type_size(type);
    if (sz == 0) { c.ok = false; return false; }
    if (!c.need(sz * (size_t)count)) return false;
    c.p += sz * (size_t)count;
    return true;
}

/* read a typed string into out (char vector) */
bool read_typed_str(Cursor &c, std::string &out) {
    int type; int64_t count;
    if (!read_type_desc(c, type, count)) return false;
    if (type == 0) { out.clear(); return true; }
    if (type != 7) { c.ok = false; return false; }
    if (!c.need((size_t)count)) return false;
    out.assign((const char *)c.p, (size_t)count);
    c.p += count;
    return true;
}

/* header parsing: contig names (rid order) + dictionary ids + samples */
struct BcfHeader {
    std::vector<std::string> contigs;
    std::vector<std::string> samples;
    int gt_key = -1;
};

std::string attr_of(const std::string &line, const std::string &key) {
    size_t lt = line.find('<');
    if (lt == std::string::npos) return "";
    size_t pos = line.find(key + "=", lt);
    if (pos == std::string::npos) return "";
    pos += key.size() + 1;
    size_t end;
    if (line[pos] == '"') {
        pos++;
        end = line.find('"', pos);
    } else {
        end = line.find_first_of(",>", pos);
    }
    if (end == std::string::npos) return "";
    return line.substr(pos, end - pos);
}

void parse_bcf_header(const std::string &text, BcfHeader &h) {
    std::vector<std::string> dict;  /* FILTER/INFO/FORMAT shared dictionary */
    auto dict_add = [&](const std::string &id, const std::string &idx_s) {
        if (!idx_s.empty()) {
            size_t idx = (size_t)atoll(idx_s.c_str());
            if (dict.size() <= idx) dict.resize(idx + 1);
            dict[idx] = id;
            return;
        }
        for (auto &d : dict)
            if (d == id) return;
        dict.push_back(id);
    };
    dict_add("PASS", "");

    std::vector<std::pair<std::string, std::string>> contig_entries;
    size_t off = 0;
    while (off < text.size()) {
        size_t nl = text.find('\n', off);
        if (nl == std::string::npos) nl = text.size();
        std::string line = text.substr(off, nl - off);
        off = nl + 1;
        if (line.rfind("##contig=", 0) == 0) {
            contig_entries.emplace_back(attr_of(line, "ID"), attr_of(line, "IDX"));
        } else if (line.rfind("##FILTER=", 0) == 0 || line.rfind("##INFO=", 0) == 0 ||
                   line.rfind("##FORMAT=", 0) == 0) {
            dict_add(attr_of(line, "ID"), attr_of(line, "IDX"));
        } else if (line.rfind("#CHROM", 0) == 0) {
            size_t p = 0;
            int field = 0;
            size_t start = 0;
            line.push_back('\t');
            while ((p = line.find('\t', start)) != std::string::npos) {
                if (field >= 9) h.samples.push_back(line.substr(start, p - start));
                field++;
                start = p + 1;
            }
        }
    }
    /* contigs: IDX-aware rid mapping */
    bool any_idx = false;
    for (auto &ce : contig_entries)
        if (!ce.second.empty()) any_idx = true;
    if (any_idx) {
        for (auto &ce : contig_entries) {
            size_t idx = ce.second.empty() ? h.contigs.size() : (size_t)atoll(ce.second.c_str());
            if (h.contigs.size() <= idx) h.contigs.resize(idx + 1);
            h.contigs[idx] = ce.first;
        }
    } else {
        for (auto &ce : contig_entries) h.contigs.push_back(ce.first);
    }
    for (size_t i = 0; i < dict.size(); i++)
        if (dict[i] == "GT") h.gt_key = (int)i;
}

}  // namespace

extern "C" {

/*
 * Parse a BCF file; emits per-record decoded columns for one sample.
 * sample == NULL/"" -> no genotype decode.
 *
 * Outputs (malloc'd, caller hh_free's):
 *   rid i32[], start i32[], stop i32[], ref_char u8[], alt_char u8[],
 *   ref_len i32[], alt_len i32[], phase1 i8[], phase2 i8[],
 *   flags u8[] (bit0 snp, bit1 valid, bit2 missing, bit3 phased)
 *   contigs: newline-joined contig names (rid order)
 */
int hh_bcf_parse(const char *path, const char *sample, int threads,
                 int32_t **rid_out, int32_t **start_out, int32_t **stop_out,
                 uint8_t **ref_out, uint8_t **alt_out, int32_t **ref_len_out,
                 int32_t **alt_len_out, int8_t **p1_out, int8_t **p2_out,
                 uint8_t **flags_out, int64_t *n_out, char **contigs_out,
                 char *errbuf, int errlen) {
    hh::ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<uint8_t> data;
    if (!hh::load_text(path, threads, data, err)) {
        eb.set(err);
        return 1;
    }
    if (data.size() < 9 || memcmp(data.data(), "BCF\x02", 4) != 0) {
        eb.set("not a BCF2 file");
        return 1;
    }
    uint32_t l_text;
    memcpy(&l_text, data.data() + 5, 4);
    if (9 + (size_t)l_text > data.size()) {
        eb.set("truncated BCF header");
        return 1;
    }
    std::string htext((const char *)data.data() + 9, l_text);
    BcfHeader hdr;
    parse_bcf_header(htext, hdr);

    int sample_idx = -1;
    if (sample && *sample) {
        for (size_t i = 0; i < hdr.samples.size(); i++)
            if (hdr.samples[i] == sample) sample_idx = (int)i;
        if (sample_idx < 0) {
            eb.set(std::string("sample not found in BCF header: ") + sample);
            return 2;
        }
        if (hdr.gt_key < 0) {
            eb.set("BCF header declares no GT FORMAT field");
            return 2;
        }
    }

    std::vector<int32_t> rid, start, stop, ref_len, alt_len;
    std::vector<uint8_t> refc, altc, flags;
    std::vector<int8_t> p1v, p2v;

    Cursor c{data.data() + 9 + l_text, data.data() + data.size()};
    std::string tmp, ref_s, alt_s;
    while (c.p < c.end && c.ok) {
        if ((size_t)(c.end - c.p) < 8) break;
        uint32_t l_shared = c.u32();
        uint32_t l_indiv = c.u32();
        if (!c.need(l_shared + (size_t)l_indiv)) break;
        const uint8_t *rec_end = c.p + l_shared + l_indiv;
        const uint8_t *indiv_start = c.p + l_shared;

        int32_t r_rid = c.i32();
        int32_t pos = c.i32();
        c.i32();              /* rlen (we use strlen(REF) like the text path) */
        c.u32();              /* qual */
        uint32_t na_ni = c.u32();
        uint32_t nf_ns = c.u32();
        uint32_t n_allele = na_ni >> 16;
        uint32_t n_info = na_ni & 0xFFFF;
        uint32_t n_fmt = nf_ns >> 24;
        uint32_t n_sample = nf_ns & 0xFFFFFF;

        read_typed_str(c, tmp); /* ID */
        ref_s.clear();
        alt_s.clear();
        for (uint32_t a = 0; a < n_allele && c.ok; a++) {
            if (a == 0)
                read_typed_str(c, ref_s);
            else if (a == 1)
                read_typed_str(c, alt_s);
            else
                skip_typed(c);
        }

        int8_t ph1 = 0, ph2 = 0;
        bool missing = false, phased = false, diploid = false;

        if (sample_idx >= 0) {
            /* jump to indiv area and scan FORMAT fields for GT */
            Cursor ic{indiv_start, rec_end};
            for (uint32_t f = 0; f < n_fmt && ic.ok; f++) {
                int64_t key = read_typed_int(ic);
                int type;
                int64_t per_sample;
                if (!read_type_desc(ic, type, per_sample)) break;
                size_t sz = type_size(type);
                if (sz == 0 && type != 0) { ic.ok = false; break; }
                size_t field_bytes = sz * (size_t)per_sample * n_sample;
                if (!ic.need(field_bytes)) break;
                if ((int)key == hdr.gt_key && per_sample >= 1) {
                    const uint8_t *sp = ic.p + sz * (size_t)per_sample * sample_idx;
                    auto get = [&](int j) -> int32_t {
                        if (type == 1) {
                            int8_t v; memcpy(&v, sp + j, 1); return v;
                        } else if (type == 2) {
                            int16_t v; memcpy(&v, sp + j * 2, 2); return v;
                        }
                        int32_t v; memcpy(&v, sp + j * 4, 4); return v;
                    };
                    int32_t g0 = get(0);
                    /* vector-end sentinel means shorter ploidy */
                    int32_t g1 = per_sample >= 2 ? get(1) : 0;
                    bool has2 = per_sample >= 2 &&
                                !(type == 1 && (int8_t)g1 == (int8_t)0x81) &&
                                !(type == 2 && (int16_t)g1 == (int16_t)0x8001);
                    diploid = has2;
                    if (diploid) {
                        int a0 = (g0 >> 1) - 1; /* allele index, -1 = missing */
                        int a1 = (g1 >> 1) - 1;
                        if (a0 < 0 || a1 < 0) {
                            missing = true;
                            ph1 = 1;
                            ph2 = 0;
                        } else {
                            ph1 = (int8_t)(a0 != 0);
                            ph2 = (int8_t)(a1 != 0);
                        }
                        phased = (g1 & 1) != 0;
                    }
                }
                ic.p += field_bytes;
            }
        }

        bool snp = ref_s.size() == 1 && n_allele == 2 && alt_s.size() == 1 &&
                   (alt_s[0] == 'A' || alt_s[0] == 'C' || alt_s[0] == 'G' ||
                    alt_s[0] == 'T');
        bool valid = sample_idx >= 0 ? diploid : true;

        rid.push_back(r_rid);
        start.push_back(pos);
        stop.push_back(pos + (int32_t)ref_s.size());
        refc.push_back(ref_s.empty() ? 0 : (uint8_t)ref_s[0]);
        altc.push_back(alt_s.empty() ? 0 : (uint8_t)alt_s[0]);
        ref_len.push_back((int32_t)ref_s.size());
        alt_len.push_back((int32_t)alt_s.size());
        p1v.push_back(ph1);
        p2v.push_back(ph2);
        flags.push_back((uint8_t)(snp | (valid << 1) | (missing << 2) | (phased << 3)));

        (void)n_info;
        c.p = rec_end;
    }

    int64_t n = (int64_t)rid.size();
    auto dup = [](const void *src, size_t bytes) {
        void *d = malloc(bytes ? bytes : 1);
        memcpy(d, src, bytes);
        return d;
    };
    *rid_out = (int32_t *)dup(rid.data(), n * 4);
    *start_out = (int32_t *)dup(start.data(), n * 4);
    *stop_out = (int32_t *)dup(stop.data(), n * 4);
    *ref_out = (uint8_t *)dup(refc.data(), n);
    *alt_out = (uint8_t *)dup(altc.data(), n);
    *ref_len_out = (int32_t *)dup(ref_len.data(), n * 4);
    *alt_len_out = (int32_t *)dup(alt_len.data(), n * 4);
    *p1_out = (int8_t *)dup(p1v.data(), n);
    *p2_out = (int8_t *)dup(p2v.data(), n);
    *flags_out = (uint8_t *)dup(flags.data(), n);
    *n_out = n;
    std::string joined;
    for (size_t i = 0; i < hdr.contigs.size(); i++) {
        if (i) joined += '\n';
        joined += hdr.contigs[i];
    }
    *contigs_out = (char *)dup(joined.c_str(), joined.size() + 1);
    return 0;
}

/*
 * Single-pass MULTI-SAMPLE BCF parse (the BCF twin of the text framer's
 * frame_v2, reference transparency: vcfpp.h:1380 opens VCF/BCF alike).
 * One file read + one record walk emits shared per-record columns plus
 * (N, S) per-sample genotype matrices for the S wanted samples — the
 * converter extracts every donor from this one pass instead of re-reading
 * the file per donor.
 *
 * want_idx: header-order sample indices, slot order; n_want their count
 * (0 -> no genotype decode, gt outputs are size-1 placeholders).
 * Outputs (malloc'd, caller hh_free's): shared columns as hh_bcf_parse,
 * p1/p2/vld as row-major (N * S) int8/u8.
 */
int hh_bcf_parse_v2(const char *path, const int32_t *want_idx, int32_t n_want,
                    int threads,
                    int32_t **rid_out, int32_t **start_out, int32_t **stop_out,
                    uint8_t **ref_out, uint8_t **alt_out,
                    int32_t **ref_len_out, int32_t **alt_len_out,
                    uint8_t **flags_out,
                    int8_t **p1_out, int8_t **p2_out, uint8_t **vld_out,
                    int64_t *n_out, char **contigs_out,
                    char *errbuf, int errlen) {
    hh::ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<uint8_t> data;
    if (!hh::load_text(path, threads, data, err)) {
        eb.set(err);
        return 1;
    }
    if (data.size() < 9 || memcmp(data.data(), "BCF\x02", 4) != 0) {
        eb.set("not a BCF2 file");
        return 1;
    }
    uint32_t l_text;
    memcpy(&l_text, data.data() + 5, 4);
    if (9 + (size_t)l_text > data.size()) {
        eb.set("truncated BCF header");
        return 1;
    }
    std::string htext((const char *)data.data() + 9, l_text);
    BcfHeader hdr;
    parse_bcf_header(htext, hdr);

    const size_t S = (size_t)(n_want > 0 ? n_want : 0);
    if (S > 0) {
        if (hdr.gt_key < 0) {
            eb.set("BCF header declares no GT FORMAT field");
            return 2;
        }
        for (size_t s = 0; s < S; s++) {
            if (want_idx[s] < 0 || (size_t)want_idx[s] >= hdr.samples.size()) {
                eb.set("sample index out of range for BCF header");
                return 2;
            }
        }
    }

    std::vector<int32_t> rid, start, stop, ref_len, alt_len;
    std::vector<uint8_t> refc, altc, flags, vldv;
    std::vector<int8_t> p1v, p2v;
    /* output rows can't exceed input bytes / ~32 (min record size) */
    size_t guess = data.size() / 32 + 16;
    rid.reserve(guess);

    Cursor c{data.data() + 9 + l_text, data.data() + data.size()};
    std::string tmp, ref_s, alt_s;
    std::vector<int8_t> row_p1(S ? S : 1), row_p2(S ? S : 1);
    std::vector<uint8_t> row_vld(S ? S : 1);
    while (c.p < c.end && c.ok) {
        if ((size_t)(c.end - c.p) < 8) break;
        uint32_t l_shared = c.u32();
        uint32_t l_indiv = c.u32();
        if (!c.need(l_shared + (size_t)l_indiv)) break;
        const uint8_t *rec_end = c.p + l_shared + l_indiv;
        const uint8_t *indiv_start = c.p + l_shared;

        int32_t r_rid = c.i32();
        int32_t pos = c.i32();
        c.i32();
        c.u32();
        uint32_t na_ni = c.u32();
        uint32_t nf_ns = c.u32();
        uint32_t n_allele = na_ni >> 16;
        uint32_t n_fmt = nf_ns >> 24;
        uint32_t n_sample = nf_ns & 0xFFFFFF;

        read_typed_str(c, tmp); /* ID */
        ref_s.clear();
        alt_s.clear();
        for (uint32_t a = 0; a < n_allele && c.ok; a++) {
            if (a == 0)
                read_typed_str(c, ref_s);
            else if (a == 1)
                read_typed_str(c, alt_s);
            else
                skip_typed(c);
        }

        std::fill(row_p1.begin(), row_p1.end(), 0);
        std::fill(row_p2.begin(), row_p2.end(), 0);
        std::fill(row_vld.begin(), row_vld.end(), 0);

        if (S > 0) {
            Cursor ic{indiv_start, rec_end};
            for (uint32_t f = 0; f < n_fmt && ic.ok; f++) {
                int64_t key = read_typed_int(ic);
                int type;
                int64_t per_sample;
                if (!read_type_desc(ic, type, per_sample)) break;
                size_t sz = type_size(type);
                if (sz == 0 && type != 0) { ic.ok = false; break; }
                size_t field_bytes = sz * (size_t)per_sample * n_sample;
                if (!ic.need(field_bytes)) break;
                if ((int)key == hdr.gt_key && per_sample >= 1) {
                    for (size_t s = 0; s < S; s++) {
                        uint32_t si = (uint32_t)want_idx[s];
                        if (si >= n_sample) continue;
                        const uint8_t *sp = ic.p + sz * (size_t)per_sample * si;
                        auto get = [&](int j) -> int32_t {
                            if (type == 1) {
                                int8_t v; memcpy(&v, sp + j, 1); return v;
                            } else if (type == 2) {
                                int16_t v; memcpy(&v, sp + j * 2, 2); return v;
                            }
                            int32_t v; memcpy(&v, sp + j * 4, 4); return v;
                        };
                        int32_t g0 = get(0);
                        int32_t g1 = per_sample >= 2 ? get(1) : 0;
                        bool has2 = per_sample >= 2 &&
                                    !(type == 1 && (int8_t)g1 == (int8_t)0x81) &&
                                    !(type == 2 && (int16_t)g1 == (int16_t)0x8001);
                        if (has2) {
                            int a0 = (g0 >> 1) - 1;
                            int a1 = (g1 >> 1) - 1;
                            if (a0 < 0 || a1 < 0) {
                                row_p1[s] = 1;
                                row_p2[s] = 0;
                            } else {
                                row_p1[s] = (int8_t)(a0 != 0);
                                row_p2[s] = (int8_t)(a1 != 0);
                            }
                            row_vld[s] = 1;
                        }
                    }
                }
                ic.p += field_bytes;
            }
        }

        bool snp = ref_s.size() == 1 && n_allele == 2 && alt_s.size() == 1 &&
                   (alt_s[0] == 'A' || alt_s[0] == 'C' || alt_s[0] == 'G' ||
                    alt_s[0] == 'T');

        rid.push_back(r_rid);
        start.push_back(pos);
        stop.push_back(pos + (int32_t)ref_s.size());
        refc.push_back(ref_s.empty() ? 0 : (uint8_t)ref_s[0]);
        altc.push_back(alt_s.empty() ? 0 : (uint8_t)alt_s[0]);
        ref_len.push_back((int32_t)ref_s.size());
        alt_len.push_back((int32_t)alt_s.size());
        flags.push_back((uint8_t)snp);
        if (S > 0) {
            p1v.insert(p1v.end(), row_p1.begin(), row_p1.end());
            p2v.insert(p2v.end(), row_p2.begin(), row_p2.end());
            vldv.insert(vldv.end(), row_vld.begin(), row_vld.end());
        }

        c.p = rec_end;
    }

    int64_t n = (int64_t)rid.size();
    auto dup = [](const void *src, size_t bytes) {
        void *d = malloc(bytes ? bytes : 1);
        memcpy(d, src, bytes);
        return d;
    };
    *rid_out = (int32_t *)dup(rid.data(), n * 4);
    *start_out = (int32_t *)dup(start.data(), n * 4);
    *stop_out = (int32_t *)dup(stop.data(), n * 4);
    *ref_out = (uint8_t *)dup(refc.data(), n);
    *alt_out = (uint8_t *)dup(altc.data(), n);
    *ref_len_out = (int32_t *)dup(ref_len.data(), n * 4);
    *alt_len_out = (int32_t *)dup(alt_len.data(), n * 4);
    *flags_out = (uint8_t *)dup(flags.data(), n);
    *p1_out = (int8_t *)dup(p1v.data(), p1v.size());
    *p2_out = (int8_t *)dup(p2v.data(), p2v.size());
    *vld_out = (uint8_t *)dup(vldv.data(), vldv.size());
    *n_out = n;
    std::string joined;
    for (size_t i = 0; i < hdr.contigs.size(); i++) {
        if (i) joined += '\n';
        joined += hdr.contigs[i];
    }
    *contigs_out = (char *)dup(joined.c_str(), joined.size() + 1);
    return 0;
}

/* samples declared in a BCF header */
int hh_bcf_samples(const char *path, int threads, char **out, int64_t *n_samples,
                   char *errbuf, int errlen) {
    hh::ErrBuf eb{errbuf, errlen};
    std::string err;
    std::vector<uint8_t> data;
    if (!hh::load_text(path, threads, data, err)) {
        eb.set(err);
        return 1;
    }
    if (data.size() < 9 || memcmp(data.data(), "BCF\x02", 4) != 0) {
        eb.set("not a BCF2 file");
        return 1;
    }
    uint32_t l_text;
    memcpy(&l_text, data.data() + 5, 4);
    if (9 + (size_t)l_text > data.size()) {
        eb.set("truncated BCF header");
        return 1;
    }
    std::string htext((const char *)data.data() + 9, l_text);
    BcfHeader hdr;
    parse_bcf_header(htext, hdr);
    std::string joined;
    for (size_t i = 0; i < hdr.samples.size(); i++) {
        if (i) joined += '\n';
        joined += hdr.samples[i];
    }
    char *buf = (char *)malloc(joined.size() + 1);
    memcpy(buf, joined.c_str(), joined.size() + 1);
    *out = buf;
    *n_samples = (int64_t)hdr.samples.size();
    return 0;
}

/* quick signature check */
int hh_is_bcf(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return 0;
    uint8_t head[18];
    size_t got = fread(head, 1, sizeof(head), f);
    fclose(f);
    if (got >= 5 && memcmp(head, "BCF\x02", 4) == 0) return 1;
    if (got < 18 || !(head[0] == 0x1f && head[1] == 0x8b)) return 0;
    /* BGZF: decompress the first block's first bytes to check magic */
    std::string err;
    std::vector<uint8_t> raw;
    if (!hh::read_file(path, raw, err)) return 0;
    if (!hh::is_bgzf(raw)) return 0;
    std::vector<uint8_t> text;
    /* decompress only the first block */
    std::vector<hh::BgzfBlock> blocks;
    size_t total = 0;
    if (!hh::scan_bgzf_blocks(raw, blocks, total, err) || blocks.empty()) return 0;
    const hh::BgzfBlock &b = blocks[0];
    if (b.usize < 5) return 0;
    std::vector<uint8_t> out(b.usize);
    size_t xlen = raw[b.coffset + 10] | (raw[b.coffset + 11] << 8);
    if (!hh::inflate_raw_block(raw.data() + b.coffset + 12 + xlen,
                               b.csize - (12 + xlen) - 8, out.data(), b.usize))
        return 0;
    return memcmp(out.data(), "BCF\x02", 4) == 0;
}

}  /* extern "C" */
