"""Device bitpack codec tests: bit-exact round trips vs the numpy codecs."""

import numpy as np
import pytest

from haplohyped_tpu.ops.pack import (
    gather_window_2bit,
    pack_2bit_device,
    pack_4bit_device,
    unpack_2bit_device,
    unpack_4bit_device,
)
from haplohyped_tpu.utils.bitpack import bitpack_indices, pack_2bit, unpack_bits


@pytest.fixture(scope="module")
def codes():
    rng = np.random.default_rng(0)
    return rng.integers(0, 5, size=4096).astype(np.int8)


class TestDevicePack:
    def test_2bit_matches_numpy(self, codes):
        import jax.numpy as jnp

        packed_d, mask_d = pack_2bit_device(jnp.asarray(codes))
        packed_n, mask_n, _ = pack_2bit(codes)
        assert np.array_equal(np.asarray(packed_d), packed_n)
        assert np.array_equal(np.asarray(mask_d), mask_n[: mask_d.shape[0]])

    def test_2bit_roundtrip(self, codes):
        import jax.numpy as jnp

        packed, mask = pack_2bit_device(jnp.asarray(codes))
        out = unpack_2bit_device(packed, mask)
        assert np.array_equal(np.asarray(out), codes)

    def test_4bit_matches_numpy(self, codes):
        import jax.numpy as jnp

        packed_d = pack_4bit_device(jnp.asarray(codes))
        assert np.array_equal(np.asarray(packed_d), bitpack_indices(codes))
        out = unpack_4bit_device(packed_d)
        assert np.array_equal(np.asarray(out), unpack_bits(bitpack_indices(codes), 4096))

    def test_gather_window(self, codes):
        import jax.numpy as jnp

        packed, mask = pack_2bit_device(jnp.asarray(codes))
        L = 256
        for start in (0, 1, 3, 17, 1000, 4096 - L - 8):
            win = gather_window_2bit(packed, mask, jnp.int32(start), L=L)
            assert np.array_equal(np.asarray(win), codes[start : start + L]), start

    def test_memory_factor(self, codes):
        import jax.numpy as jnp

        packed, mask = pack_2bit_device(jnp.asarray(codes))
        assert packed.nbytes == codes.size // 4
        assert mask.nbytes == codes.size // 8
