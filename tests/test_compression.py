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
