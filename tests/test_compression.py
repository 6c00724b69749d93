"""Storage/codec tests: the native Blosc(32001) HDF5 filter.

Carries the reference's ``tests/test_compression.py`` assertions (filter
registered, write/read round-trip with the pipeline's exact cd_values,
compression ratio > 1, uint8 parameter variant) against the first-party
filter plugin instead of hdf5plugin.
"""

import os
import tempfile

import numpy as np
import pytest

from haplohyped_tpu.core.constants import BLOSC_FILTER_ID
from haplohyped_tpu.storage import blosc_available, register_blosc_filter

needs_blosc = pytest.mark.skipif(
    not blosc_available(), reason="native blosc filter unavailable"
)


@needs_blosc
def test_blosc_filter_registered():
    import h5py

    register_blosc_filter()
    assert h5py.h5z.filter_avail(BLOSC_FILTER_ID)


@needs_blosc
def test_blosc_write_read():
    import h5py

    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as f:
        temp_file = f.name
    try:
        rng = np.random.default_rng(0)
        data = rng.integers(0, 100, size=(1000, 100)).astype(np.int32)
        with h5py.File(temp_file, "w") as f:
            f.create_dataset(
                "test_data",
                data=data,
                compression=BLOSC_FILTER_ID,
                compression_opts=(2, 2, 0, 0, 5, 1, 2),
                chunks=True,
            )
        with h5py.File(temp_file, "r") as f:
            read_data = f["test_data"][:]
            assert np.array_equal(data, read_data)
            assert "32001" in f["test_data"]._filters

        file_size = os.path.getsize(temp_file)
        assert data.nbytes / file_size > 1.0
    finally:
        os.unlink(temp_file)


@needs_blosc
def test_blosc_parameters_uint8():
    import h5py

    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as f:
        temp_file = f.name
    try:
        data = np.random.default_rng(1).integers(0, 255, size=(1000,)).astype(np.uint8)
        with h5py.File(temp_file, "w") as f:
            f.create_dataset(
                "test",
                data=data,
                compression=BLOSC_FILTER_ID,
                compression_opts=(2, 2, 0, 0, 5, 1, 2),
                chunks=True,
            )
        with h5py.File(temp_file, "r") as f:
            assert np.array_equal(data, f["test"][:])
    finally:
        os.unlink(temp_file)


@needs_blosc
@pytest.mark.parametrize("compcode", [0, 1, 2, 4, 5])
def test_blosc_all_compressors_roundtrip(compcode):
    """blosclz / lz4 / lz4hc / zlib / zstd all round-trip."""
    import h5py

    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as f:
        temp_file = f.name
    try:
        data = np.arange(100_000, dtype=np.uint32).reshape(1000, 100)
        with h5py.File(temp_file, "w") as f:
            f.create_dataset(
                "x",
                data=data,
                compression=BLOSC_FILTER_ID,
                compression_opts=(2, 2, 0, 0, 5, 1, compcode),
                chunks=True,
            )
        with h5py.File(temp_file, "r") as f:
            assert np.array_equal(data, f["x"][:])
        assert os.path.getsize(temp_file) < data.nbytes
    finally:
        os.unlink(temp_file)


@needs_blosc
def test_blosc_struct_dtype_set_local():
    """set_local must record the struct itemsize as typesize."""
    import h5py

    from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE

    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as f:
        temp_file = f.name
    try:
        data = np.zeros(500, dtype=SNP_STRUCT_DTYPE)
        data["start"] = np.arange(500)
        with h5py.File(temp_file, "w") as f:
            f.create_dataset(
                "snp_data",
                data=data,
                compression=BLOSC_FILTER_ID,
                compression_opts=(2, 2, 0, 0, 5, 1, 2),
                chunks=True,
            )
        with h5py.File(temp_file, "r") as f:
            dset = f["snp_data"]
            cd = dset._filters["32001"]
            assert cd[0] == 2 and cd[1] == 2
            assert cd[2] == SNP_STRUCT_DTYPE.itemsize
            assert cd[4:] == (5, 1, 2)
            assert np.array_equal(dset[()], data)
    finally:
        os.unlink(temp_file)


def test_gzip_fallback_kwargs_shape():
    """Even without blosc the writers get a usable compression config."""
    from haplohyped_tpu.storage import cohort_compression_kwargs

    kw = cohort_compression_kwargs()
    assert "compression" in kw and "chunks" in kw


@needs_blosc
def test_chunk_bytes_match_cblosc_exactly():
    """Byte-level artifact parity: the filter's on-disk chunk bytes must be
    exactly what c-blosc produces for the pipeline's cd_values — i.e. what a
    reference (hdf5plugin) installation would write for the same data."""
    import ctypes

    import h5py

    from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE

    rng = np.random.default_rng(7)
    data = np.zeros(2000, dtype=SNP_STRUCT_DTYPE)
    data["chrom"] = b"chr22"
    data["start"] = np.sort(rng.integers(0, 1 << 26, 2000)).astype(np.uint32)
    data["stop"] = data["start"] + 1
    data["ref"] = b"A"
    data["alt"] = b"G"
    data["phase1"] = rng.integers(0, 2, 2000)

    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as f:
        path = f.name
    try:
        with h5py.File(path, "w") as f:
            f.create_dataset(
                "snp_data",
                data=data,
                compression=BLOSC_FILTER_ID,
                compression_opts=(2, 2, 0, 0, 5, 1, 2),
                chunks=(500,),
            )
        with h5py.File(path, "r") as f:
            dset = f["snp_data"]
            filt, file_chunk = dset.id.read_direct_chunk((0,))
            assert filt == 0  # chunk is stored filtered; mask 0 = applied

        raw = data[:500].tobytes()
        lib = ctypes.CDLL("libblosc.so.1")
        lib.blosc_compress_ctx.restype = ctypes.c_int
        out = ctypes.create_string_buffer(len(raw) + 16)
        n = lib.blosc_compress_ctx(
            ctypes.c_int(5),              # clevel (cd_values[4])
            ctypes.c_int(1),              # byte shuffle (cd_values[5])
            ctypes.c_size_t(SNP_STRUCT_DTYPE.itemsize),
            ctypes.c_size_t(len(raw)),
            raw,
            out,
            ctypes.c_size_t(len(raw) + 16),
            b"lz4hc",                     # compcode 2
            ctypes.c_size_t(0),
            ctypes.c_int(1),
        )
        assert n > 0
        assert bytes(file_chunk) == out.raw[:n]
    finally:
        os.unlink(path)
