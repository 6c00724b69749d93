"""Parity of the three haplotype-window kernels.

``encode_haplotype_windows`` (jnp baseline) is the semantic ground truth —
itself pinned against the host encoder in test_dataset.py.  The two
restructured kernels must be bit-equal to it on every output:

- ``encode_haplotype_windows_fast`` (word gather + two-level search), and
- ``encode_windows_pallas`` (explicit DMA Pallas kernel, interpret mode on
  CPU here; the same kernel compiles on TPU — bench stage ``window_kernels``
  times all three on the chip and the sampler uses the measured winner).

Reference semantics under test: ``haplotype_dataset.py:86-110`` —
reference-genome window with ALT substituted at in-window variant positions
where the phase bit is set.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from haplohyped_tpu.data.cohort import INT32_MAX
from haplohyped_tpu.ops.haplotype_window import (
    build_window_index,
    encode_haplotype_windows,
    encode_haplotype_windows_fast,
)
from haplohyped_tpu.ops.pallas_window import (
    build_pallas_window_index,
    encode_windows_pallas,
)


def make_fixture(seed, D=3, C=2, V=1280, chrom_lens=(6000, 9000), dense_row=True):
    """Random genome + cohort tensors shaped like CohortTensors output."""
    rng = np.random.default_rng(seed)
    offsets = np.concatenate([[0], np.cumsum(chrom_lens)[:-1]]).astype(np.int32)
    genome = rng.integers(0, 5, size=int(np.sum(chrom_lens)), dtype=np.int8)

    pos = np.full((D, C, V), INT32_MAX, np.int32)
    ref = np.zeros((D, C, V), np.int8)
    alt = np.zeros((D, C, V), np.int8)
    p1 = np.zeros((D, C, V), np.int8)
    p2 = np.zeros((D, C, V), np.int8)
    counts = np.zeros((D, C), np.int32)
    for d in range(D):
        for c in range(C):
            n = int(rng.integers(0, V))
            if dense_row and (d, c) == (0, 0):
                n = V  # one full row exercises the count == V edge
            if n == 0:
                continue
            p = np.sort(rng.integers(0, chrom_lens[c], size=n)).astype(np.int32)
            pos[d, c, :n] = p
            ref[d, c, :n] = rng.integers(0, 5, n)
            alt[d, c, :n] = rng.integers(0, 5, n)
            p1[d, c, :n] = rng.integers(0, 2, n)
            p2[d, c, :n] = rng.integers(0, 2, n)
            counts[d, c] = n
    return genome, offsets, pos, ref, alt, p1, p2, counts, chrom_lens


def make_batch(seed, chrom_lens, D, C, B, L):
    rng = np.random.default_rng(seed + 1)
    di = rng.integers(0, D, B).astype(np.int32)
    ci = rng.integers(0, C, B).astype(np.int32)
    lim = np.maximum(np.asarray(chrom_lens)[ci] - L, 1)
    st = (rng.integers(0, 2**31 - 1, B) % lim).astype(np.int32)
    # force some edge starts: 0 and the exact clamp limit
    st[0] = 0
    st[-1] = lim[-1]
    return di, ci, st


def assert_windows_equal(got, want):
    assert np.array_equal(np.asarray(got.hap1), np.asarray(want.hap1)), "hap1"
    assert np.array_equal(np.asarray(got.hap2), np.asarray(want.hap2)), "hap2"
    assert np.array_equal(
        np.asarray(got.n_variants), np.asarray(want.n_variants)
    ), "n_variants"
    assert np.array_equal(
        np.asarray(got.overflow), np.asarray(want.overflow)
    ), "overflow"


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("L,K", [(256, 32), (1000, 64)])
def test_fast_kernel_bit_equal(seed, L, K):
    genome, offsets, pos, ref, alt, p1, p2, counts, lens = make_fixture(seed)
    D, C, _ = pos.shape
    di, ci, st = make_batch(seed, lens, D, C, B=32, L=L)

    base = encode_haplotype_windows(
        jnp.asarray(genome), jnp.asarray(offsets),
        jnp.asarray(pos), jnp.asarray(ref), jnp.asarray(alt),
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st), L=L, K=K,
    )
    idx = build_window_index(genome, pos, ref, alt, p1, p2)
    fast = encode_haplotype_windows_fast(
        idx.genome_words, jnp.asarray(offsets),
        jnp.asarray(pos), idx.sub12, idx.grid, jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st), L=L, K=K,
    )
    assert_windows_equal(fast, base)


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_kernel_bit_equal_interpret(seed):
    L, K = 256, 64
    genome, offsets, pos, ref, alt, p1, p2, counts, lens = make_fixture(seed)
    D, C, _ = pos.shape
    di, ci, st = make_batch(seed, lens, D, C, B=16, L=L)

    base = encode_haplotype_windows(
        jnp.asarray(genome), jnp.asarray(offsets),
        jnp.asarray(pos), jnp.asarray(ref), jnp.asarray(alt),
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st), L=L, K=K,
    )
    pidx = build_pallas_window_index(genome, pos, ref, alt, p1, p2, counts)
    pal = encode_windows_pallas(
        pidx, jnp.asarray(offsets),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st),
        L=L, K=K, interpret=True,
    )
    assert_windows_equal(pal, base)


def test_empty_rows_and_overflow():
    """Zero-variant rows return the bare reference window; dense windows
    cap at K and report overflow identically across kernels."""
    L, K = 128, 8
    rng = np.random.default_rng(9)
    chrom_lens = (4096,)
    genome = rng.integers(0, 5, size=4096, dtype=np.int8)
    offsets = np.zeros(1, np.int32)
    V = 1280
    D, C = 2, 1
    pos = np.full((D, C, V), INT32_MAX, np.int32)
    ref = np.zeros((D, C, V), np.int8)
    alt = np.zeros((D, C, V), np.int8)
    p1 = np.zeros((D, C, V), np.int8)
    p2 = np.zeros((D, C, V), np.int8)
    counts = np.zeros((D, C), np.int32)
    # donor 0: empty; donor 1: every position a variant (forces overflow)
    n = 1024
    pos[1, 0, :n] = np.arange(n, dtype=np.int32)
    ref[1, 0, :n] = genome[:n]
    alt[1, 0, :n] = (genome[:n] + 1) % 5
    p1[1, 0, :n] = 1
    counts[1, 0] = n

    di = np.array([0, 1, 0, 1] * 4, np.int32)
    ci = np.zeros(16, np.int32)
    st = np.tile(np.array([0, 100, 900, 3968], np.int32), 4)

    args = (
        jnp.asarray(genome), jnp.asarray(offsets),
        jnp.asarray(pos), jnp.asarray(ref), jnp.asarray(alt),
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st),
    )
    base = encode_haplotype_windows(*args, L=L, K=K)
    # donor-0 windows must equal the raw genome slice
    b0 = np.asarray(base.hap1[0])
    assert np.array_equal(b0, genome[0:L])
    assert int(base.overflow[1]) == L - K  # 128 in-window, cap 8

    idx = build_window_index(genome, pos, ref, alt, p1, p2)
    fast = encode_haplotype_windows_fast(
        idx.genome_words, jnp.asarray(offsets), jnp.asarray(pos),
        idx.sub12, idx.grid, jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st), L=L, K=K,
    )
    assert_windows_equal(fast, base)

    pidx = build_pallas_window_index(genome, pos, ref, alt, p1, p2, counts)
    pal = encode_windows_pallas(
        pidx, jnp.asarray(offsets), jnp.asarray(di), jnp.asarray(ci),
        jnp.asarray(st), L=L, K=K, interpret=True,
    )
    assert_windows_equal(pal, base)


def test_pallas_bucket_boundary_crossing():
    """Windows whose variant span crosses a coarse-grid bucket boundary
    (hi0 != lo0) take the Pallas kernel's conditional hi-chunk DMA path;
    same-bucket windows take the hi-from-lo-chunk count.  Both must stay
    bit-equal to the baseline kernel (pins the round-5 DMA-reduction
    rework: 3 transfers/window typical, 4 only on a crossing)."""
    L, K = 512, 64
    rng = np.random.default_rng(11)
    chrom_lens = (8192,)
    genome = rng.integers(0, 5, size=8192, dtype=np.int8)
    offsets = np.zeros(1, np.int32)
    V = 4096
    D, C = 1, 1
    pos = np.full((D, C, V), INT32_MAX, np.int32)
    ref = np.zeros((D, C, V), np.int8)
    alt = np.zeros((D, C, V), np.int8)
    p1 = np.zeros((D, C, V), np.int8)
    p2 = np.zeros((D, C, V), np.int8)
    counts = np.zeros((D, C), np.int32)
    # every other base a variant: index 1024 (the SP bucket boundary)
    # sits at position 2048, so windows near position 2048 - L/2 span it
    n = 4096
    p = np.arange(n, dtype=np.int32) * 2
    pos[0, 0, :n] = p
    ref[0, 0, :n] = genome[p]
    alt[0, 0, :n] = (genome[p] + 1) % 5
    p1[0, 0, :n] = rng.integers(0, 2, n)
    p2[0, 0, :n] = rng.integers(0, 2, n)
    counts[0, 0] = n

    # starts straddling the index-1024 (pos 2048), 2048 (pos 4096), and
    # 3072 (pos 6144) boundaries, plus same-bucket controls
    st = np.array(
        [2048 - L // 2, 4096 - L // 2, 6144 - L // 2, 2048 - 1,
         0, 100, 3000, 7000, 2048 - L, 4095, 6600, 1, 5000, 1500, 300, 2500],
        np.int32,
    )
    di = np.zeros(16, np.int32)
    ci = np.zeros(16, np.int32)

    base = encode_haplotype_windows(
        jnp.asarray(genome), jnp.asarray(offsets),
        jnp.asarray(pos), jnp.asarray(ref), jnp.asarray(alt),
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st), L=L, K=K,
    )
    pidx = build_pallas_window_index(genome, pos, ref, alt, p1, p2, counts)
    pal = encode_windows_pallas(
        pidx, jnp.asarray(offsets), jnp.asarray(di), jnp.asarray(ci),
        jnp.asarray(st), L=L, K=K, interpret=True,
    )
    assert_windows_equal(pal, base)
    # sanity: the fixture really does cross buckets (lo//SP != (hi-1)//SP
    # for the straddling starts)
    nv = np.asarray(base.n_variants)
    assert nv[0] == L // 2  # every other base in [s, s+L)


def test_sampler_identical_across_kernels():
    """DeviceHaplotypeSampler emits bit-identical batches whichever kernel
    SamplerConfig.window_kernel selects (pallas runs interpret on CPU)."""
    import jax

    from haplohyped_tpu.core.config import SamplerConfig
    from haplohyped_tpu.data.cohort import CohortTensors
    from haplohyped_tpu.data.genome import GenomeTensors
    from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler
    from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE

    rng = np.random.default_rng(5)
    genome = GenomeTensors.from_code_arrays(
        {"chr1": rng.integers(0, 5, size=20_000).astype(np.int8)}
    )
    n = 400
    p = np.sort(rng.choice(19_000, size=n, replace=False)).astype(np.int64)
    table = np.zeros(n, dtype=SNP_STRUCT_DTYPE)
    table["chrom"] = b"chr1"
    table["start"] = p
    table["stop"] = p + 1
    table["ref"] = b"A"
    table["alt"] = b"G"
    table["phase1"] = rng.integers(0, 2, n)
    table["phase2"] = rng.integers(0, 2, n)
    cohort = CohortTensors.from_structs(
        {(d, "chr1"): table for d in ("d0", "d1")}, ["d0", "d1"], ["chr1"]
    )
    spans = np.stack([(s := rng.integers(0, 18_000, 64)), s + 1200], axis=1)

    batches = {}
    for kernel in ("baseline", "fast", "pallas"):
        cfg = SamplerConfig(
            seq_length=256, batch_size=8, seed=0,
            max_variants_per_window=64, window_kernel=kernel,
        )
        sampler = DeviceHaplotypeSampler(genome, cohort, spans, cfg)
        b = sampler.sample(key=jax.random.PRNGKey(3))
        batches[kernel] = b
    for kernel in ("fast", "pallas"):
        assert np.array_equal(
            np.asarray(batches[kernel].hap1_codes),
            np.asarray(batches["baseline"].hap1_codes),
        ), kernel
        assert np.array_equal(
            np.asarray(batches[kernel].hap2_codes),
            np.asarray(batches["baseline"].hap2_codes),
        ), kernel
        assert np.array_equal(
            np.asarray(batches[kernel].n_variants),
            np.asarray(batches["baseline"].n_variants),
        ), kernel


def test_duplicate_positions_last_wins():
    """Scatter semantics: for duplicate variant positions the LAST variant
    in file order wins — all kernels must agree."""
    L, K = 64, 8
    genome = np.zeros(1024, np.int8)
    offsets = np.zeros(1, np.int32)
    V = 1280
    pos = np.full((1, 1, V), INT32_MAX, np.int32)
    ref = np.zeros((1, 1, V), np.int8)
    alt = np.zeros((1, 1, V), np.int8)
    p1 = np.zeros((1, 1, V), np.int8)
    p2 = np.zeros((1, 1, V), np.int8)
    pos[0, 0, :3] = [10, 10, 10]
    alt[0, 0, :3] = [1, 2, 3]
    p1[0, 0, :3] = 1
    counts = np.array([[3]], np.int32)

    di = np.zeros(8, np.int32)
    ci = np.zeros(8, np.int32)
    st = np.zeros(8, np.int32)

    base = encode_haplotype_windows(
        jnp.asarray(genome), jnp.asarray(offsets),
        jnp.asarray(pos), jnp.asarray(ref), jnp.asarray(alt),
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st), L=L, K=K,
    )
    assert int(base.hap1[0, 10]) == 3  # last duplicate wins
    assert int(base.hap2[0, 10]) == 0  # phase2 unset -> ref

    idx = build_window_index(genome, pos, ref, alt, p1, p2)
    fast = encode_haplotype_windows_fast(
        idx.genome_words, jnp.asarray(offsets), jnp.asarray(pos),
        idx.sub12, idx.grid, jnp.asarray(counts),
        jnp.asarray(di), jnp.asarray(ci), jnp.asarray(st), L=L, K=K,
    )
    assert_windows_equal(fast, base)

    pidx = build_pallas_window_index(genome, pos, ref, alt, p1, p2, counts)
    pal = encode_windows_pallas(
        pidx, jnp.asarray(offsets), jnp.asarray(di), jnp.asarray(ci),
        jnp.asarray(st), L=L, K=K, interpret=True,
    )
    assert_windows_equal(pal, base)


class TestSampleChain:
    """Chained measurement kernel (sampler.sample_chain): deterministic
    digest per key, and the chain actually depends on every step (a
    different key changes the digest)."""

    def test_digest_deterministic_and_key_sensitive(self):
        import jax
        import numpy as np

        from haplohyped_tpu.core.config import SamplerConfig
        from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE
        from haplohyped_tpu.data.cohort import CohortTensors
        from haplohyped_tpu.data.genome import GenomeTensors
        from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

        rng = np.random.default_rng(5)
        L_chrom = 5000
        genome = GenomeTensors.from_code_arrays(
            {"chr1": rng.integers(0, 4, size=L_chrom).astype(np.int8)}
        )
        pos = np.sort(
            rng.choice(L_chrom - 80, size=200, replace=False)
        ).astype(np.int64)
        table = np.zeros(200, dtype=SNP_STRUCT_DTYPE)
        table["chrom"] = b"chr1"
        table["start"] = pos
        table["stop"] = pos + 1
        table["ref"] = b"A"
        table["alt"] = b"G"
        table["phase1"] = rng.integers(0, 2, size=200)
        table["phase2"] = rng.integers(0, 2, size=200)
        donors = ["d0", "d1"]
        cohort = CohortTensors.from_structs(
            {(d, "chr1"): table for d in donors}, donors, ["chr1"]
        )
        spans = np.stack(
            [(s0 := rng.integers(0, L_chrom - 200, size=16)), s0 + 100], axis=1
        )
        cfg = SamplerConfig(
            seq_length=64, batch_size=4, seed=0, max_variants_per_window=8,
            window_kernel="fast",
        )
        s = DeviceHaplotypeSampler(genome, cohort, spans, cfg)
        k1 = jax.random.PRNGKey(1)
        d_a = int(np.asarray(s.sample_chain(3, 2, key=k1)))
        d_b = int(np.asarray(s.sample_chain(3, 2, key=k1)))
        assert d_a == d_b
        d_c = int(np.asarray(s.sample_chain(3, 2, key=jax.random.PRNGKey(2))))
        # 2^-32 collision chance: a different stream must change the digest
        assert d_a != d_c
