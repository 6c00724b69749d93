/*
 * HDF5 filter plugin for Blosc (filter id 32001), linked against the system
 * c-blosc.  TPU-native replacement for the reference's `hdf5plugin` python
 * dependency (reference imports it at vcf_to_h5.py:8, fasta_encoder.py:10):
 * here the filter is first-party native code so the engine controls its own
 * storage codec.
 *
 * cd_values convention (identical to the canonical c-blosc HDF5 filter, which
 * the reference's artifacts use):
 *   cd_values[0]  filter revision
 *   cd_values[1]  blosc format version
 *   cd_values[2]  datatype size in bytes (set by set_local)
 *   cd_values[3]  chunk size in bytes   (set by set_local)
 *   cd_values[4]  compression level
 *   cd_values[5]  shuffle (0 none, 1 byte, 2 bit)
 *   cd_values[6]  compressor code (0 blosclz, 1 lz4, 2 lz4hc, 4 zlib, 5 zstd)
 *
 * HDF5 API symbols are declared locally (no hdf5.h on this system) and are
 * resolved at load time against the libhdf5 already present in the process
 * (h5py's bundled one) — the Python side promotes it to RTLD_GLOBAL before
 * dlopen'ing this plugin.  All declarations follow the stable public HDF5
 * 1.10+ ABI.
 */

#include <stdlib.h>
#include <string.h>
#include <stdio.h>
#include <stdint.h>

/* ------------------------------------------------------------------ */
/* Minimal HDF5 public ABI declarations                               */
/* ------------------------------------------------------------------ */

typedef int64_t hid_t;
typedef int herr_t;
typedef int htri_t;
typedef unsigned long long hsize_t;
typedef int H5Z_filter_t;

#define H5Z_FLAG_REVERSE 0x0100u
#define H5Z_CLASS_T_VERS 1
#define H5T_ARRAY_CLASS 10

typedef size_t (*H5Z_func_t)(unsigned flags, size_t cd_nelmts,
                             const unsigned cd_values[], size_t nbytes,
                             size_t *buf_size, void **buf);
typedef htri_t (*H5Z_can_apply_func_t)(hid_t dcpl, hid_t type, hid_t space);
typedef herr_t (*H5Z_set_local_func_t)(hid_t dcpl, hid_t type, hid_t space);

typedef struct H5Z_class2_t {
    int version;
    H5Z_filter_t id;
    unsigned encoder_present;
    unsigned decoder_present;
    const char *name;
    H5Z_can_apply_func_t can_apply;
    H5Z_set_local_func_t set_local;
    H5Z_func_t filter;
} H5Z_class2_t;

extern size_t H5Tget_size(hid_t type_id);
extern int H5Tget_class(hid_t type_id);
extern hid_t H5Tget_super(hid_t type_id);
extern herr_t H5Tclose(hid_t type_id);
extern int H5Pget_chunk(hid_t plist_id, int max_ndims, hsize_t dims[]);
extern herr_t H5Pget_filter_by_id2(hid_t plist_id, H5Z_filter_t filter_id,
                                   unsigned *flags, size_t *cd_nelmts,
                                   unsigned cd_values[], size_t namelen,
                                   char name[], unsigned *filter_config);
extern herr_t H5Pmodify_filter(hid_t plist_id, H5Z_filter_t filter_id,
                               unsigned flags, size_t cd_nelmts,
                               const unsigned cd_values[]);

/* ------------------------------------------------------------------ */
/* c-blosc API (system libblosc.so.1, 1.21.x)                         */
/* ------------------------------------------------------------------ */

extern int blosc_compress_ctx(int clevel, int doshuffle, size_t typesize,
                              size_t nbytes, const void *src, void *dest,
                              size_t destsize, const char *compressor,
                              size_t blocksize, int numinternalthreads);
extern int blosc_decompress_ctx(const void *src, void *dest, size_t destsize,
                                int numinternalthreads);
extern void blosc_cbuffer_sizes(const void *cbuffer, size_t *nbytes,
                                size_t *cbytes, size_t *blocksize);

#define FILTER_BLOSC 32001
#define FILTER_BLOSC_VERSION 2
#define BLOSC_VERSION_FORMAT 2
#define BLOSC_MAX_OVERHEAD 16
#define BLOSC_MAX_TYPESIZE 255

static const char *blosc_compname_from_code(unsigned code) {
    switch (code) {
        case 0: return "blosclz";
        case 1: return "lz4";
        case 2: return "lz4hc";
        case 3: return "snappy";
        case 4: return "zlib";
        case 5: return "zstd";
        default: return "blosclz";
    }
}

/* Per-process knob for blosc-internal threads (set from Python). */
static int g_blosc_nthreads = 1;
void hh_blosc_set_nthreads(int n) { g_blosc_nthreads = n > 0 ? n : 1; }

static herr_t blosc_set_local(hid_t dcpl, hid_t type, hid_t space) {
    (void)space;
    unsigned flags;
    size_t nelements = 8;
    unsigned values[8];
    memset(values, 0, sizeof(values));
    if (H5Pget_filter_by_id2(dcpl, FILTER_BLOSC, &flags, &nelements, values,
                             0, NULL, NULL) < 0)
        return -1;
    if (nelements < 4) nelements = 4;

    values[0] = FILTER_BLOSC_VERSION;
    values[1] = BLOSC_VERSION_FORMAT;

    hid_t super_type = -1;
    hid_t probe_type = type;
    if (H5Tget_class(type) == H5T_ARRAY_CLASS) {
        super_type = H5Tget_super(type);
        if (super_type >= 0) probe_type = super_type;
    }
    size_t typesize = H5Tget_size(probe_type);
    if (super_type >= 0) H5Tclose(super_type);
    if (typesize == 0) return -1;

    size_t basetypesize = typesize;
    if (typesize > BLOSC_MAX_TYPESIZE) basetypesize = 1;
    values[2] = (unsigned)basetypesize;

    hsize_t chunkdims[32];
    int ndims = H5Pget_chunk(dcpl, 32, chunkdims);
    if (ndims < 0) return -1;
    hsize_t bufsize = typesize;
    for (int i = 0; i < ndims; i++) bufsize *= chunkdims[i];
    values[3] = (unsigned)bufsize;

    if (H5Pmodify_filter(dcpl, FILTER_BLOSC, flags, nelements, values) < 0)
        return -1;
    return 1;
}

static size_t blosc_h5_filter(unsigned flags, size_t cd_nelmts,
                              const unsigned cd_values[], size_t nbytes,
                              size_t *buf_size, void **buf) {
    void *outbuf = NULL;
    int status = 0;

    if (!(flags & H5Z_FLAG_REVERSE)) {
        /* ---- compress ---- */
        size_t typesize = cd_nelmts >= 3 ? cd_values[2] : 1;
        if (typesize == 0 || typesize > BLOSC_MAX_TYPESIZE) typesize = 1;
        int clevel = cd_nelmts >= 5 ? (int)cd_values[4] : 5;
        int doshuffle = cd_nelmts >= 6 ? (int)cd_values[5] : 1;
        const char *compname =
            cd_nelmts >= 7 ? blosc_compname_from_code(cd_values[6]) : "blosclz";

        size_t outbuf_size = nbytes + BLOSC_MAX_OVERHEAD;
        outbuf = malloc(outbuf_size);
        if (!outbuf) return 0;

        status = blosc_compress_ctx(clevel, doshuffle, typesize, nbytes, *buf,
                                    outbuf, outbuf_size, compname,
                                    /*blocksize=auto*/ 0, g_blosc_nthreads);
        if (status <= 0) {
            free(outbuf);
            return 0;
        }
    } else {
        /* ---- decompress ---- */
        size_t outbuf_size = 0, cbytes = 0, blocksize = 0;
        blosc_cbuffer_sizes(*buf, &outbuf_size, &cbytes, &blocksize);
        if (outbuf_size == 0) return 0;
        outbuf = malloc(outbuf_size);
        if (!outbuf) return 0;
        status = blosc_decompress_ctx(*buf, outbuf, outbuf_size,
                                      g_blosc_nthreads);
        if (status <= 0) {
            free(outbuf);
            return 0;
        }
    }

    free(*buf);
    *buf = outbuf;
    *buf_size = (size_t)status;
    return (size_t)status;
}

static const H5Z_class2_t blosc_H5Filter = {
    H5Z_CLASS_T_VERS,
    (H5Z_filter_t)FILTER_BLOSC,
    1, /* encoder_present */
    1, /* decoder_present */
    "blosc",
    NULL, /* can_apply */
    blosc_set_local,
    blosc_h5_filter,
};

/* H5PL plugin discovery interface */
#define H5PL_TYPE_FILTER 0
int H5PLget_plugin_type(void) { return H5PL_TYPE_FILTER; }
const void *H5PLget_plugin_info(void) { return &blosc_H5Filter; }
