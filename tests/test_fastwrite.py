"""Parallel direct-chunk Blosc writer parity (storage/fastwrite.py).

The fast path compresses chunks outside the HDF5 lock and stores them with
write_direct_chunk; these tests pin that it is indistinguishable from the
filter-pipeline write at the level that matters: values, dtype, cd_values,
chunk layout — for the cohort SNP struct, the one-hot reference layout, and
edge-chunk shapes — and that its bytes are deterministic.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE
from haplohyped_tpu.storage.blosc import (
    cohort_compression_kwargs,
    reference_compression_kwargs,
)
from haplohyped_tpu.storage.fastwrite import (
    fastwrite_available,
    write_dataset_direct,
)

pytestmark = pytest.mark.skipif(
    not fastwrite_available(), reason="blosc filter/library unavailable"
)


def _struct_data(n, seed=0):
    rng = np.random.default_rng(seed)
    st = np.zeros(n, dtype=SNP_STRUCT_DTYPE)
    st["chrom"] = b"chr1"
    st["start"] = np.cumsum(rng.integers(1, 300, n)).astype(np.uint32)
    st["stop"] = st["start"] + 1
    st["ref"] = np.array([b"A", b"C", b"G", b"T"])[rng.integers(0, 4, n)]
    st["alt"] = np.array([b"A", b"C", b"G", b"T"])[rng.integers(0, 4, n)]
    st["phase1"] = rng.integers(0, 2, n)
    st["phase2"] = rng.integers(0, 2, n)
    return st


class TestFastwriteParity:
    @pytest.mark.parametrize("n", [1, 1000, 262_144, 300_000])
    def test_struct_matches_filter_path(self, tmp_path, n):
        data = _struct_data(n)
        kw = cohort_compression_kwargs(n)
        with h5py.File(tmp_path / "a.h5", "w") as f:
            write_dataset_direct(f, "snp_data", data, kw, workers=4)
        with h5py.File(tmp_path / "b.h5", "w") as f:
            f.create_dataset("snp_data", data=data, **kw)
        with h5py.File(tmp_path / "a.h5") as fa, h5py.File(tmp_path / "b.h5") as fb:
            a, b = fa["snp_data"], fb["snp_data"]
            assert a.dtype == b.dtype
            assert a.compression == b.compression
            assert a.compression_opts == b.compression_opts
            assert a.chunks == b.chunks
            np.testing.assert_array_equal(a[()], b[()])

    def test_onehot_2d_matches_filter_path(self, tmp_path):
        rng = np.random.default_rng(1)
        oh = np.eye(5, dtype=np.uint8)[rng.integers(0, 5, 200_000)]
        kw = reference_compression_kwargs(chunks=(65536, 5))
        with h5py.File(tmp_path / "a.h5", "w") as f:
            write_dataset_direct(f, "sequence", oh, kw, workers=4)
        with h5py.File(tmp_path / "b.h5", "w") as f:
            f.create_dataset("sequence", data=oh, **kw)
        with h5py.File(tmp_path / "a.h5") as fa, h5py.File(tmp_path / "b.h5") as fb:
            a, b = fa["sequence"], fb["sequence"]
            assert a.chunks == b.chunks
            np.testing.assert_array_equal(a[()], b[()])

    def test_bytes_deterministic(self, tmp_path):
        data = _struct_data(300_000)
        kw = cohort_compression_kwargs(data.shape[0])
        paths = [tmp_path / "r1.h5", tmp_path / "r2.h5"]
        for p, w in zip(paths, (1, 4)):  # worker count must not matter
            with h5py.File(p, "w") as f:
                write_dataset_direct(f, "snp_data", data, kw, workers=w)
        raws = []
        for p in paths:
            with h5py.File(p) as f:
                d = f["snp_data"]
                n_chunks = -(-data.shape[0] // d.chunks[0])
                raws.append(
                    [
                        d.id.read_direct_chunk((i * d.chunks[0],))[1]
                        for i in range(n_chunks)
                    ]
                )
        assert raws[0] == raws[1]

    def test_empty_dataset(self, tmp_path):
        data = _struct_data(0)
        kw = cohort_compression_kwargs(0)
        with h5py.File(tmp_path / "a.h5", "w") as f:
            write_dataset_direct(f, "snp_data", data, kw)
        with h5py.File(tmp_path / "a.h5") as f:
            assert f["snp_data"].shape == (0,)

    def test_gzip_fallback(self, tmp_path):
        data = _struct_data(1000)
        kw = {"compression": "gzip", "compression_opts": 4, "chunks": True}
        with h5py.File(tmp_path / "a.h5", "w") as f:
            write_dataset_direct(f, "snp_data", data, kw)
        with h5py.File(tmp_path / "a.h5") as f:
            np.testing.assert_array_equal(f["snp_data"][()], data)
