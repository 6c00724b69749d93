"""Pallas fused haplotype-window kernel (selectable alternative path).

One of the three bit-equal window-encode kernels selectable via
``SamplerConfig.window_kernel`` (reference semantics:
``haplotype_dataset.py:86-110`` — reference-genome window with per-phase
ALT substitution at in-window variant positions).  THE TPU DEFAULT
(``window_kernel="auto"`` resolves here on TPU): in the bench's paired
shoot-out the three kernels sit within rig noise under direct execution,
but the only d2h-VERIFIED comparison ever recorded has this kernel 21-39x
ahead (0.235s vs 4.97s/9.1s for a 2048-dispatch chain on a
remote-dispatch rig — one opaque kernel per step amortizes per-step
dispatch where an XLA op-graph pays it per op).  Off-TPU, "auto" picks
the word-gather ``fast`` kernel (Pallas would be interpret-mode there).

Design notes: every gather is replaced with explicit, tile-aligned
HBM->VMEM DMAs.  Mosaic's alignment rules shape the whole design: 2-D
layouts everywhere (last dims a (8k, 128) tile), DMA sublane offsets
that are provable multiples of 8 (so the coarse-search stride is one
1024-word tile), per-window scratch buffers (VMEM row slices don't
lower), and in-VMEM residual shifts via ``pltpu.roll`` (dynamic
rotates).  The genome is viewed as int32 words; substitution runs in
word space over four byte planes, and the final word->byte unpack +
0..3 byte shift happens outside the kernel in XLA (pure elementwise).

Outputs are bit-equal to :func:`haplohyped_tpu.ops.haplotype_window.
encode_haplotype_windows` — pinned by the interpret-mode parity tests in
``tests/test_window_kernels.py`` (edge cases: empty rows, overflow,
duplicate positions, sampler-level draws) and, for the COMPILED Mosaic
kernel on the chip, by the bench's ``window_parity`` attestation stage
(all kernels sample with one PRNG key, outputs fetched and jointly
hashed into the committed artifact — ``bench.py bench_window_parity``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from haplohyped_tpu.ops.haplotype_window import HaplotypeWindows

#: windows per Pallas program — DMAs for all W windows are issued together
#: so their latencies overlap; compute is vectorized VPU work.  32 measured
#: ~12% faster than 8 on v5e (benchmarks/window_kernel_lab.json) now that
#: the merged-chunk scratch fits; callers with smaller batches fall back
#: to the largest feasible divisor automatically.
W_PER_PROG = 32

#: coarse-search stride — one (8, 128) int32 tile, so chunk DMA sublane
#: offsets lo0/128 = bucket*8 are provably 8-aligned
SP = 1024

#: variant-chunk padding in words (kept at two strides so padded index
#: windows always exist whatever chunk size a kernel reads)
CHUNK = 2 * SP
CH_R = CHUNK // 128  # padded chunk rows (index-build invariant)

#: lo/sub chunk rows actually DMA'd: the count needs SP words ([lo0,
#: lo0+SP) covers the true lo — every later position is >= grid[blo] >= s
#: by the coarse-grid invariant) and the K<=128 applied variants start at
#: lo <= lo0+SP, so SP + 128 words = 9 rows minimum; Mosaic requires
#: 8-row-aligned copy shapes ("unsupported unaligned shape" at 10), so 16
CH_LO_R = 16
#: hi chunk rows: counting only, SP words suffice (8 rows, tile-aligned)
CH_HI_R = SP // 128

#: max supported window length in bytes
L_MAX = 4080


def _out_words(L: int) -> int:
    """Output word-window length: covers L bytes + 3 shift bytes, rounded
    to a 128-word (full-lane) multiple."""
    return -(-(L + 4) // 512) * 128


def _gwin(L: int) -> int:
    """Genome scratch words: one SP tile of slack + the output window,
    rounded to an SP multiple (8-sublane-aligned rows for dynamic_rotate)."""
    return -(-(SP + _out_words(L) + 128) // SP) * SP


class PallasWindowIndex(NamedTuple):
    """Device tensors for :func:`encode_windows_pallas` (build once)."""

    genome_words: jax.Array  # (Gr, 128) int32 — genome bytes packed LE
    #: (DC, 2*Vr, 128) int32 — positions and substitution words ROW-
    #: INTERLEAVED (row 2r = positions row r, INT32_MAX padded; row 2r+1 =
    #: (sub1 | sub2 << 8) + INT32_MIN for the same variants).  One DMA of
    #: rows [2*lo8, 2*lo8 + 2*CH_LO_R) fetches positions AND substitutions
    #: together, and the bias makes every sub element negative so the
    #: in-window count over the raw block is (true count + a constant).
    vs_pad: jax.Array
    grid: jax.Array  # (DC, Vg) int32 — positions[::SP]
    counts: jax.Array  # (DC,) int32


def build_pallas_window_index(
    genome_flat: np.ndarray,
    var_pos: np.ndarray,  # (D, C, V) int32, INT32_MAX padded past counts
    var_ref: np.ndarray,
    var_alt: np.ndarray,
    var_p1: np.ndarray,
    var_p2: np.ndarray,
    var_counts: np.ndarray,  # (D, C) int32
) -> PallasWindowIndex:
    """Host-side precompute for the Pallas window kernel."""
    imax = np.iinfo(np.int32).max
    g = np.asarray(genome_flat, dtype=np.int8)
    # pad so the word window [blk*SP, blk*SP + GWIN) always exists
    pad_words = _gwin(L_MAX) + SP
    pad = (-g.size) % 4 + pad_words * 4
    g = np.concatenate([g, np.zeros(pad, np.int8)])
    words = g.view("<i4")
    words = words[: words.size // 128 * 128].reshape(-1, 128)
    D, C, V = var_pos.shape
    # pad V so chunks [lo0, lo0+CHUNK) always exist (lo0 <= ceil(V/SP)*SP)
    Vp = -(-V // SP) * SP + CHUNK
    vp = np.full((D * C, Vp), imax, np.int32)
    vp[:, :V] = var_pos.reshape(D * C, V)
    # the kernel's winner select (max over masked c1/c2 columns) and byte
    # packing assume non-negative 7-bit codes (base codes are 0..4)
    assert int(var_ref.min(initial=0)) >= 0 and int(var_ref.max(initial=0)) < 128
    assert int(var_alt.min(initial=0)) >= 0 and int(var_alt.max(initial=0)) < 128
    sub1 = np.where(var_p1 == 1, var_alt, var_ref).astype(np.int32)
    sub2 = np.where(var_p2 == 1, var_alt, var_ref).astype(np.int32)
    sub = np.zeros((D * C, Vp), np.int32)
    sub[:, :V] = ((sub1 & 0xFF) | (sub2 << 8)).reshape(D * C, V)
    grid = np.ascontiguousarray(vp[:, :V][:, ::SP])
    # row-interleave positions and BIASED substitution words (one DMA
    # fetches both; the bias keeps counting exact — see PallasWindowIndex)
    vp3 = vp.reshape(D * C, Vp // 128, 128)
    sub3 = (sub.astype(np.int64) + np.int64(np.iinfo(np.int32).min)).astype(
        np.int32
    ).reshape(D * C, Vp // 128, 128)
    vs = np.stack([vp3, sub3], axis=2).reshape(D * C, 2 * (Vp // 128), 128)
    return PallasWindowIndex(
        genome_words=jnp.asarray(np.ascontiguousarray(words)),
        vs_pad=jnp.asarray(np.ascontiguousarray(vs)),
        grid=jnp.asarray(grid),
        counts=jnp.asarray(var_counts.reshape(D * C).astype(np.int32)),
    )


def _flat_take(
    x: jax.Array,
    shift: jax.Array,
    out_rows: int,
    row_step: int = 1,
    row_off: int = 0,
) -> jax.Array:
    """Read ``out_rows * 128`` consecutive elements starting at dynamic
    flat offset ``shift`` from an (R, 128) row-major block, via dynamic
    sublane + lane rolls and a lane select.  ``row_step=2, row_off=p``
    reads from a row-interleaved block (element i lives at row
    ``2*(i//128) + p``, lane ``i%128`` — the vs_pad layout); only
    ``out_rows == 1`` is supported there.  Caller guarantees the last
    element read stays inside the block."""
    if row_step != 1 and out_rows != 1:
        raise ValueError("strided take supports a single output row")
    R = x.shape[0]
    lr = shift % 128
    sr = (shift // 128) * row_step + row_off
    a = pltpu.roll(x, (R - sr) % R, axis=0)  # rows left-shifted by sr
    b = pltpu.roll(x, (R - sr - row_step) % R, axis=0)
    ar = pltpu.roll(a, (128 - lr) % 128, axis=1)  # lanes left-shifted by lr
    br = pltpu.roll(b, (128 - lr) % 128, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = jnp.where(lane < 128 - lr, ar, br)
    return y[:out_rows]


def _window_kernel(
    # scalar prefetch (SMEM)
    flat_start_ref,  # (B,) int32 — genome byte offset per window
    start_ref,  # (B,) int32 — window start within chrom
    row_ref,  # (B,) int32 — donor*C + chrom row id
    count_ref,  # (B,) int32 — valid variants in that row
    lo0_ref,  # (B,) int32 — SP-aligned chunk base for the lo search
    hi0_ref,  # (B,) int32 — SP-aligned chunk base for the hi search
    # inputs (HBM)
    genome_hbm,  # (Gr, 128) int32
    vs_hbm,  # (DC, 2*Vr, 128) int32 — row-interleaved positions|subs
    # outputs (VMEM blocks)
    hap1_ref,  # (W, OUT_W) int32 — word-space windows
    hap2_ref,  # (W, OUT_W) int32
    nvar_ref,  # (1, 8, 128) int32 — lanes [:W] of row 0
    ovf_ref,  # (1, 8, 128) int32
    # scratch: W genome + W interleaved-chunk + W hi-chunk buffers, sems
    *scr,
    L: int,
    K: int,
    OUT_W: int,
    GWIN: int,
    W: int = W_PER_PROG,
):
    g = pl.program_id(0)
    win_scr = scr[0:W]  # each (GWIN//128, 128)
    chv_scr = scr[W : 2 * W]  # each (2*CH_LO_R, 128) interleaved pos|sub
    chhi_scr = scr[2 * W : 3 * W]  # each (2*CH_HI_R, 128)
    sems = scr[3 * W]

    # --- issue every DMA up front (latencies overlap) --------------------
    # DMA budget per window (the kernel is DMA-issue/latency-bound, see
    # benchmarks/window_kernel_lab.json): ONE genome window + ONE
    # interleaved positions|subs chunk always; a second variant chunk ONLY
    # when the window spans a coarse-grid bucket boundary (hi0 != lo0 —
    # ~1% of windows at production variant densities), since with
    # hi0 == lo0 the hi count is computable from the lo chunk.  2
    # transfers/window typical (was 4 in round 4).
    for i in range(W):
        b = g * W + i
        blk8 = ((flat_start_ref[b] >> 2) // SP) * 8
        base = pl.multiple_of(blk8, 8)
        pltpu.make_async_copy(
            genome_hbm.at[pl.ds(base, GWIN // 128), :],
            win_scr[i],
            sems.at[0, i],
        ).start()
        row = row_ref[b]
        lo16 = pl.multiple_of((lo0_ref[b] // 128) // 8 * 16, 16)
        hi16 = pl.multiple_of((hi0_ref[b] // 128) // 8 * 16, 16)
        pltpu.make_async_copy(
            vs_hbm.at[row, pl.ds(lo16, 2 * CH_LO_R), :], chv_scr[i],
            sems.at[1, i],
        ).start()

        @pl.when(hi0_ref[b] != lo0_ref[b])
        def _issue_hi(i=i, row=row, hi16=hi16):
            pltpu.make_async_copy(
                vs_hbm.at[row, pl.ds(hi16, 2 * CH_HI_R), :], chhi_scr[i],
                sems.at[2, i],
            ).start()

    for i in range(W):
        b = g * W + i
        row = row_ref[b]
        pltpu.make_async_copy(
            genome_hbm.at[pl.ds(0, GWIN // 128), :], win_scr[i], sems.at[0, i]
        ).wait()
        pltpu.make_async_copy(
            vs_hbm.at[row, pl.ds(0, 2 * CH_LO_R), :], chv_scr[i], sems.at[1, i]
        ).wait()

        @pl.when(hi0_ref[b] != lo0_ref[b])
        def _wait_hi(i=i, row=row):
            pltpu.make_async_copy(
                vs_hbm.at[row, pl.ds(0, 2 * CH_HI_R), :], chhi_scr[i],
                sems.at[2, i],
            ).wait()

    # --- per-window compute ----------------------------------------------
    acc_n = []
    acc_o = []
    acc_h1 = []
    acc_h2 = []
    for i in range(W):
        b = g * W + i
        s = start_ref[b]
        fs = flat_start_ref[b]
        count = count_ref[b]
        lo0 = lo0_ref[b]
        hi0 = hi0_ref[b]

        ch = chv_scr[i][...]  # (2*CH_LO_R, 128) interleaved pos|sub
        ch_hi = chhi_scr[i][...]
        # counts run over the RAW interleaved block: every biased sub
        # element is negative, hence always < s (s >= 0), so it adds a
        # constant CH_LO_R*128 that is subtracted back out
        lo = lo0 + jnp.sum((ch < s).astype(jnp.int32)) - CH_LO_R * 128
        # hi from the lo chunk when both searches landed in the same
        # bucket (the coarse-grid invariant makes every word past the
        # true hi >= s + L, so the full-chunk count is exact); the hi
        # chunk is only DMA'd — and only meaningful — otherwise
        hi_same = lo0 + jnp.sum((ch < s + L).astype(jnp.int32)) - CH_LO_R * 128
        hi_cross = (
            hi0 + jnp.sum((ch_hi < s + L).astype(jnp.int32)) - CH_HI_R * 128
        )
        hi = jnp.where(hi0 == lo0, hi_same, hi_cross)
        n_in = jnp.maximum(jnp.minimum(hi, count) - jnp.minimum(lo, count), 0)
        n_apply = jnp.minimum(n_in, K)
        acc_n.append(n_in)
        acc_o.append(jnp.maximum(n_in - K, 0))

        # K applied variants: strided flat-roll of the interleaved chunk
        # (positions on even rows, biased subs on odd)
        delta = lo - lo0
        pos_k = _flat_take(ch, delta, 1, row_step=2, row_off=0)  # (1, 128)
        sub_k = _flat_take(ch, delta, 1, row_step=2, row_off=1) ^ jnp.int32(
            -(2**31)
        )

        # genome word window [fs>>2, +OUT_W); the residual byte shift
        # r4 = fs & 3 is applied OUTSIDE in XLA after byte unpack
        dg = (fs >> 2) - ((fs >> 2) // SP) * SP
        words = _flat_take(win_scr[i][...], dg, OUT_W // 128).reshape(
            1, OUT_W
        )

        # substitution in word space: byte j of the window buffer is
        # pos_buf = (fs & 3) + (pos - s); word pos_buf>>2, plane pos_buf&3.
        # The cross-product runs over KP = K rounded to a sublane tile
        # (not the full 128-lane row): at the default K=64 that halves
        # every mask op, and the applied lanes (lane_k < n_apply <= K)
        # all live in the first KP sublanes by construction.
        KP = min(128, max(8, -(-K // 8) * 8))
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        applied = lane_k < n_apply
        pos_buf = jnp.where(applied, (fs & 3) + pos_k - s, -1)  # (1, 128)
        word_idx = pos_buf >> 2
        plane = pos_buf & 3
        prio = jnp.where(applied, lane_k + 1, 0)  # distinct per k

        # fused priority|value word: ONE masked max per plane yields both
        # the winning k (prio in bits 16+ dominates the comparison — the
        # same last-wins winner as a separate priority pass) and its
        # substitution bytes (c1 in bits 15..8, c2 in 7..0; codes are
        # 7-bit by the build-time assert), replacing the former
        # kb/win/c1/c2 four-reduction sequence
        combined = (prio << 16) | ((sub_k & 0xFF) << 8) | (sub_k >> 8)

        out_word = jax.lax.broadcasted_iota(jnp.int32, (KP, OUT_W), 1)
        h1 = words
        h2 = words
        wcol = jnp.broadcast_to(word_idx.reshape(128, 1)[:KP], (KP, OUT_W))
        pcol = jnp.broadcast_to(plane.reshape(128, 1)[:KP], (KP, OUT_W))
        ccol = jnp.broadcast_to(combined.reshape(128, 1)[:KP], (KP, OUT_W))
        # plane-invariant winner mask hoisted out of the plane loop
        # (ccol > 0 <=> prio > 0: unapplied lanes carry combined == 0)
        m_word = (wcol == out_word) & (ccol > 0)
        for p in range(4):
            m = m_word & (pcol == p)
            kb = jnp.max(jnp.where(m, ccol, 0), axis=0)[None, :]  # (1, OUT_W)
            has = kb > 0
            c1 = (kb >> 8) & 0xFF
            c2 = kb & 0xFF
            mask = jnp.int32(0xFF) << (8 * p)
            h1 = jnp.where(has, (h1 & ~mask) | (c1 << (8 * p)), h1)
            h2 = jnp.where(has, (h2 & ~mask) | (c2 << (8 * p)), h2)
        acc_h1.append(h1[0])
        acc_h2.append(h2[0])

    hap1_ref[...] = jnp.stack(acc_h1)
    hap2_ref[...] = jnp.stack(acc_h2)
    zpad = jnp.zeros((128 - W,), jnp.int32)
    nvar_ref[...] = jnp.broadcast_to(
        jnp.concatenate([jnp.stack(acc_n), zpad]), (1, 8, 128)
    )
    ovf_ref[...] = jnp.broadcast_to(
        jnp.concatenate([jnp.stack(acc_o), zpad]), (1, 8, 128)
    )


@functools.partial(jax.jit, static_argnames=("L", "K", "interpret", "w"))
def encode_windows_pallas(
    index: PallasWindowIndex,
    chrom_offsets: jax.Array,  # (C,) int32
    donor_idx: jax.Array,  # (B,) int32
    chrom_idx: jax.Array,  # (B,) int32
    start: jax.Array,  # (B,) int32
    *,
    L: int,
    K: int,
    interpret: bool = False,
    w: int = W_PER_PROG,  # windows per Pallas program (sweepable)
) -> HaplotypeWindows:
    """Bit-equal Pallas twin of ``encode_haplotype_windows`` (TPU path)."""
    B = start.shape[0]
    if not 1 <= w <= 128:
        raise ValueError("w (windows/program) must be in [1, 128]")
    # largest feasible windows-per-program <= requested (static fallback
    # so small or odd batch sizes keep working at the w=32 default)
    w = min(w, B)
    while B % w:
        w -= 1
    if K > 128:
        raise ValueError("K > 128 exceeds the kernel's chunk padding")
    if L > L_MAX:
        raise ValueError(f"L > {L_MAX} exceeds the genome word window")
    DC = index.vs_pad.shape[0]
    C = chrom_offsets.shape[0]
    OUT_W = _out_words(L)
    GWIN = _gwin(L)

    # tiny-table selects (C, DC small): no XLA gathers on the hot path
    c_iota = jnp.arange(C, dtype=jnp.int32)
    off_sel = jnp.sum(
        jnp.where(chrom_idx[:, None] == c_iota[None, :], chrom_offsets[None, :], 0),
        axis=1,
    )
    row = (donor_idx * C + chrom_idx).astype(jnp.int32)
    dc_iota = jnp.arange(DC, dtype=jnp.int32)
    row_onehot = row[:, None] == dc_iota[None, :]  # (B, DC)
    count_sel = jnp.sum(jnp.where(row_onehot, index.counts[None, :], 0), axis=1)
    # coarse grid rows via one-hot select: elementwise, no gather
    g_sel = jnp.sum(
        jnp.where(row_onehot[:, :, None], index.grid[None, :, :], 0), axis=1
    )  # (B, Vg)
    blo = jnp.sum((g_sel < start[:, None]).astype(jnp.int32), axis=1)
    bhi = jnp.sum((g_sel < (start + L)[:, None]).astype(jnp.int32), axis=1)
    lo0 = jnp.maximum(blo - 1, 0) * SP
    hi0 = jnp.maximum(bhi - 1, 0) * SP
    flat_start = (off_sel + start).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B // w,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # genome words
            pl.BlockSpec(memory_space=pl.ANY),  # interleaved pos|sub
        ],
        out_specs=[
            pl.BlockSpec((w, OUT_W), lambda g, *_: (g, 0)),
            pl.BlockSpec((w, OUT_W), lambda g, *_: (g, 0)),
            pl.BlockSpec((1, 8, 128), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda g, *_: (g, 0, 0)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((GWIN // 128, 128), jnp.int32)] * w
            + [pltpu.VMEM((2 * CH_LO_R, 128), jnp.int32)] * w
            + [pltpu.VMEM((2 * CH_HI_R, 128), jnp.int32)] * w
            + [pltpu.SemaphoreType.DMA((3, w))]
        ),
    )
    kernel = functools.partial(
        _window_kernel, L=L, K=K, OUT_W=OUT_W, GWIN=GWIN, W=w
    )
    hap1w, hap2w, nvar, ovf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, OUT_W), jnp.int32),
            jax.ShapeDtypeStruct((B, OUT_W), jnp.int32),
            jax.ShapeDtypeStruct((B // w, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B // w, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        flat_start,
        start.astype(jnp.int32),
        row,
        count_sel.astype(jnp.int32),
        lo0.astype(jnp.int32),
        hi0.astype(jnp.int32),
        index.genome_words,
        index.vs_pad,
    )

    # word -> byte unpack + residual 0..3 byte shift (pure elementwise)
    def unpack(w):
        sh = jnp.stack([(w >> k) & 0xFF for k in (0, 8, 16, 24)], axis=-1)
        by = sh.astype(jnp.int8).reshape(B, OUT_W * 4)
        r4 = (flat_start & 3)[:, None]
        return jnp.where(
            r4 == 0,
            by[:, 0:L],
            jnp.where(
                r4 == 1,
                by[:, 1 : 1 + L],
                jnp.where(r4 == 2, by[:, 2 : 2 + L], by[:, 3 : 3 + L]),
            ),
        )

    return HaplotypeWindows(
        hap1=unpack(hap1w),
        hap2=unpack(hap2w),
        n_variants=nvar[:, 0, :w].reshape(B),
        overflow=ovf[:, 0, :w].reshape(B),
    )
