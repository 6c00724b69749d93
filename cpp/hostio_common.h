/* Shared host-I/O helpers: file reading + BGZF/gzip decompression.
 * Header-only (inline), namespace hh; used by hostio.cpp and bcf.cpp. */
#pragma once

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

#ifdef HH_USE_LIBDEFLATE
#include <libdeflate.h>
#endif

namespace hh {

struct ErrBuf {
    char *buf;
    int len;
    void set(const std::string &msg) {
        if (buf && len > 0) snprintf(buf, (size_t)len, "%s", msg.c_str());
    }
};

inline bool read_file(const std::string &path, std::vector<uint8_t> &out,
                      std::string &err) {
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) {
        err = "cannot open file: " + path;
        return false;
    }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (size < 0) {
        fclose(f);
        err = "cannot stat file: " + path;
        return false;
    }
    out.resize((size_t)size);
    size_t got = size ? fread(out.data(), 1, (size_t)size, f) : 0;
    fclose(f);
    if (got != (size_t)size) {
        err = "short read: " + path;
        return false;
    }
    return true;
}

inline bool is_gzip(const std::vector<uint8_t> &d) {
    return d.size() >= 2 && d[0] == 0x1f && d[1] == 0x8b;
}

inline bool is_bgzf(const std::vector<uint8_t> &d) {
    if (d.size() < 18 || !is_gzip(d) || d[2] != 8 || !(d[3] & 4)) return false;
    size_t xlen = d[10] | (d[11] << 8);
    size_t p = 12, end = 12 + xlen;
    if (end > d.size()) return false;
    while (p + 4 <= end) {
        uint8_t si1 = d[p], si2 = d[p + 1];
        size_t slen = d[p + 2] | (d[p + 3] << 8);
        if (si1 == 66 && si2 == 67 && slen == 2) return true;
        p += 4 + slen;
    }
    return false;
}

struct BgzfBlock {
    size_t coffset;
    size_t csize;
    size_t uoffset;
    size_t usize;
};

inline bool scan_bgzf_blocks(const std::vector<uint8_t> &d,
                             std::vector<BgzfBlock> &blocks, size_t &total_usize,
                             std::string &err) {
    size_t off = 0;
    total_usize = 0;
    while (off + 18 <= d.size()) {
        if (!(d[off] == 0x1f && d[off + 1] == 0x8b)) {
            err = "corrupt BGZF stream (bad magic)";
            return false;
        }
        size_t xlen = d[off + 10] | (d[off + 11] << 8);
        size_t p = off + 12, end = off + 12 + xlen;
        size_t bsize = 0;
        while (p + 4 <= end && p + 4 <= d.size()) {
            uint8_t si1 = d[p], si2 = d[p + 1];
            size_t slen = d[p + 2] | (d[p + 3] << 8);
            if (si1 == 66 && si2 == 67 && slen == 2 && p + 6 <= d.size()) {
                bsize = (size_t)(d[p + 4] | (d[p + 5] << 8)) + 1;
                break;
            }
            p += 4 + slen;
        }
        if (bsize == 0 || off + bsize > d.size()) {
            err = "corrupt BGZF stream (bad BSIZE)";
            return false;
        }
        size_t isize = (size_t)d[off + bsize - 4] | ((size_t)d[off + bsize - 3] << 8) |
                       ((size_t)d[off + bsize - 2] << 16) |
                       ((size_t)d[off + bsize - 1] << 24);
        blocks.push_back({off, bsize, total_usize, isize});
        total_usize += isize;
        off += bsize;
    }
    if (off != d.size()) {
        err = "trailing garbage after BGZF blocks";
        return false;
    }
    return true;
}

#ifdef HH_USE_LIBDEFLATE
/* libdeflate raw-deflate decode: ~2-3x faster than zlib inflate for the
 * 64KB BGZF blocks that dominate host-side time.  One decompressor per
 * thread (they are not thread-safe, but are reusable). */
struct DeflateTL {
    libdeflate_decompressor *d = nullptr;
    DeflateTL() : d(libdeflate_alloc_decompressor()) {}
    ~DeflateTL() {
        if (d) libdeflate_free_decompressor(d);
    }
};

inline bool inflate_raw_block(const uint8_t *src, size_t srclen, uint8_t *dst,
                              size_t dstlen) {
    static thread_local DeflateTL tl;
    if (!tl.d) return false;
    size_t actual = 0;
    enum libdeflate_result r = libdeflate_deflate_decompress(
        tl.d, src, srclen, dst, dstlen, &actual);
    return r == LIBDEFLATE_SUCCESS && actual == dstlen;
}
#else
inline bool inflate_raw_block(const uint8_t *src, size_t srclen, uint8_t *dst,
                              size_t dstlen) {
    z_stream s;
    memset(&s, 0, sizeof(s));
    if (inflateInit2(&s, -15) != Z_OK) return false;
    s.next_in = const_cast<uint8_t *>(src);
    s.avail_in = (uInt)srclen;
    s.next_out = dst;
    s.avail_out = (uInt)dstlen;
    int ret = inflate(&s, Z_FINISH);
    inflateEnd(&s);
    return ret == Z_STREAM_END && s.avail_out == 0;
}
#endif

inline bool decompress_bgzf(const std::vector<uint8_t> &d, int threads,
                            std::vector<uint8_t> &out, std::string &err) {
    std::vector<BgzfBlock> blocks;
    size_t total = 0;
    if (!scan_bgzf_blocks(d, blocks, total, err)) return false;
    out.resize(total);
    if (blocks.empty()) return true;

    int nthreads = threads > 0 ? threads : 1;
    if ((size_t)nthreads > blocks.size()) nthreads = (int)blocks.size();
    std::atomic<size_t> next{0};
    std::atomic<bool> ok{true};
    auto worker = [&]() {
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= blocks.size() || !ok.load()) break;
            const BgzfBlock &b = blocks[i];
            if (b.usize == 0) continue;
            size_t xlen = d[b.coffset + 10] | (d[b.coffset + 11] << 8);
            size_t data_off = b.coffset + 12 + xlen;
            size_t data_len = b.csize - (12 + xlen) - 8;
            if (!inflate_raw_block(d.data() + data_off, data_len,
                                   out.data() + b.uoffset, b.usize))
                ok.store(false);
        }
    };
    std::vector<std::thread> pool;
    for (int t = 1; t < nthreads; t++) pool.emplace_back(worker);
    worker();
    for (auto &t : pool) t.join();
    if (!ok.load()) {
        err = "BGZF block decompression failed";
        return false;
    }
    return true;
}

inline bool decompress_gzip(const std::vector<uint8_t> &d, std::vector<uint8_t> &out,
                            std::string &err) {
    z_stream s;
    memset(&s, 0, sizeof(s));
    if (inflateInit2(&s, 15 + 16) != Z_OK) {
        err = "inflateInit2 failed";
        return false;
    }
    s.next_in = const_cast<uint8_t *>(d.data());
    s.avail_in = (uInt)d.size();
    out.clear();
    out.reserve(d.size() * 4);
    std::vector<uint8_t> chunk(1 << 20);
    for (;;) {
        s.next_out = chunk.data();
        s.avail_out = (uInt)chunk.size();
        int ret = inflate(&s, Z_NO_FLUSH);
        size_t produced = chunk.size() - s.avail_out;
        out.insert(out.end(), chunk.begin(), chunk.begin() + produced);
        if (ret == Z_STREAM_END) {
            if (s.avail_in == 0) break;
            if (inflateReset(&s) != Z_OK) {
                inflateEnd(&s);
                err = "inflateReset failed";
                return false;
            }
        } else if (ret != Z_OK && ret != Z_BUF_ERROR) {
            inflateEnd(&s);
            err = "gzip decompression error";
            return false;
        } else if (produced == 0 && s.avail_in == 0) {
            break;
        }
    }
    inflateEnd(&s);
    return true;
}

inline bool load_text(const std::string &path, int threads,
                      std::vector<uint8_t> &text, std::string &err) {
    std::vector<uint8_t> raw;
    if (!read_file(path, raw, err)) return false;
    if (is_bgzf(raw)) return decompress_bgzf(raw, threads, text, err);
    if (is_gzip(raw)) return decompress_gzip(raw, text, err);
    text = std::move(raw);
    return true;
}

}  // namespace hh
