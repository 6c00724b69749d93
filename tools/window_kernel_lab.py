#!/usr/bin/env python
"""Window-kernel profiling lab (VERDICT r4 #3): where do the Pallas window
kernel's ~1.5 us/window go?

Measures, under the chained anti-eliding design (window starts of chain
step k+1 derived from step k's output digest — serial by construction,
ending in a d2h fetch):

  - the production kernel at several w (windows per Pallas program) to
    expose per-program overhead,
  - a DMA-only variant (issue + wait all per-window copies, trivial
    output) to isolate DMA issue/latency cost,
  - a compute-only variant (no DMAs; full substitution math on scratch
    garbage) to isolate VPU cost.

Writes ``benchmarks/window_kernel_lab.json``.

Run (TPU):  python tools/window_kernel_lab.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_fixture():
    """Sampler-scale fixture: 10 Mb genome, 8 donors x 100K variants.

    Returns (index, legacy, Lc, D) where ``legacy`` is a dict with the
    r4-era separate vp_pad/sub_pad arrays — the lab's dma_only /
    compute_only variants profile that 4-DMA design (the baseline the
    round-5 rework was measured against), while prod_* rows run the
    current production kernel via the live PallasWindowIndex."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    Lc = 10_000_000
    genome = rng.integers(0, 4, size=Lc).astype(np.int8)
    D, C, V = 8, 1, 100_000
    pos = np.sort(
        rng.choice(Lc - 2000, size=(D, C, V), replace=False), axis=-1
    ).astype(np.int32)
    ref = rng.integers(0, 4, size=(D, C, V)).astype(np.int32)
    alt = rng.integers(0, 4, size=(D, C, V)).astype(np.int32)
    p1 = rng.integers(0, 2, size=(D, C, V)).astype(np.int32)
    p2 = rng.integers(0, 2, size=(D, C, V)).astype(np.int32)
    counts = np.full((D, C), V, np.int32)
    from haplohyped_tpu.ops.pallas_window import SP, build_pallas_window_index

    index = build_pallas_window_index(genome, pos, ref, alt, p1, p2, counts)
    # r4-era separate padded arrays for the legacy lab variants
    imax = np.iinfo(np.int32).max
    Vp = -(-V // SP) * SP + 2 * SP
    vp = np.full((D * C, Vp), imax, np.int32)
    vp[:, :V] = pos.reshape(D * C, V)
    sub1 = np.where(p1 == 1, alt, ref).astype(np.int32)
    sub2 = np.where(p2 == 1, alt, ref).astype(np.int32)
    sub = np.zeros((D * C, Vp), np.int32)
    sub[:, :V] = ((sub1 & 0xFF) | (sub2 << 8)).reshape(D * C, V)
    legacy = {
        "vp_pad": jnp.asarray(vp.reshape(D * C, Vp // 128, 128)),
        "sub_pad": jnp.asarray(sub.reshape(D * C, Vp // 128, 128)),
    }
    return index, legacy, Lc, D


def make_chained(call, idx, offs, Lc, D, B, L, n_chain):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(starts, donor_idx):
        chrom_idx = jnp.zeros((B,), jnp.int32)

        def body(carry, _):
            st, di = carry
            out = call(idx, offs, di, chrom_idx, st)
            # full-coverage digest: every window's every byte feeds the
            # next starts (prevents DCE and keeps content fresh)
            d = lax.reduce(
                out.hap1.astype(jnp.int32), np.int32(0), lax.add, (1,)
            ) + out.n_variants.astype(jnp.int32)
            st2 = (st + (d & 0x7FFF) + 1) % (Lc - L - 8)
            di2 = (di + 1) % D
            return (st2, di2), ()

        (st, di), _ = lax.scan(body, (starts, donor_idx), None, length=n_chain)
        return st

    return run


def measure(name, call, idx, offs, Lc, D, B, L, n_chain, iters=3):
    import jax

    rng = np.random.default_rng(int(time.time()) % 100_000)
    starts = rng.integers(0, Lc - L - 8, size=B).astype(np.int32)
    di = rng.integers(0, D, size=B).astype(np.int32)
    run = make_chained(call, idx, offs, Lc, D, B, L, n_chain)
    t0 = time.time()
    st = run(starts, di)
    int(np.asarray(st)[0])  # compile + d2h gate
    log(f"  {name}: compile+first {time.time() - t0:.1f}s")
    ts = []
    for _ in range(iters):
        t0 = time.time()
        st = run(np.asarray(st), di)  # chain feeds itself across calls
        _ = int(np.asarray(st)[0])  # the fetch IS the attestation
        ts.append(time.time() - t0)
    med = float(np.median(ts))
    wps = n_chain * B / med
    per_win_us = med / (n_chain * B) * 1e6
    log(f"  {name}: {med:.4f}s/call = {wps:,.0f} windows/s ({per_win_us:.2f} us/window)")
    return {"name": name, "median_s": round(med, 5),
            "windows_per_sec": round(wps), "us_per_window": round(per_win_us, 3)}


def lab_kernel_variant(do_dma: bool, do_compute: bool):
    """Clone of ops.pallas_window._window_kernel with DMA / compute legs
    individually switchable (lab-only; production kernel untouched)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from haplohyped_tpu.ops.pallas_window import CH_R, SP, _flat_take

    def kernel(
        flat_start_ref, start_ref, row_ref, count_ref, lo0_ref, hi0_ref,
        genome_hbm, vp_hbm, sub_hbm,
        hap1_ref, hap2_ref, nvar_ref, ovf_ref,
        *scr, L, K, OUT_W, GWIN, W,
    ):
        g = pl.program_id(0)
        win_scr = scr[0:W]
        chlo_scr = scr[W: 2 * W]
        chhi_scr = scr[2 * W: 3 * W]
        sub_scr = scr[3 * W: 4 * W]
        sems = scr[4 * W]

        if do_dma:
            for i in range(W):
                b = g * W + i
                blk8 = ((flat_start_ref[b] >> 2) // SP) * 8
                base = pl.multiple_of(blk8, 8)
                pltpu.make_async_copy(
                    genome_hbm.at[pl.ds(base, GWIN // 128), :],
                    win_scr[i], sems.at[0, i],
                ).start()
                row = row_ref[b]
                lo8 = pl.multiple_of((lo0_ref[b] // 128) // 8 * 8, 8)
                hi8 = pl.multiple_of((hi0_ref[b] // 128) // 8 * 8, 8)
                pltpu.make_async_copy(
                    vp_hbm.at[row, pl.ds(lo8, CH_R), :], chlo_scr[i], sems.at[1, i]
                ).start()
                pltpu.make_async_copy(
                    vp_hbm.at[row, pl.ds(hi8, CH_R), :], chhi_scr[i], sems.at[2, i]
                ).start()
                pltpu.make_async_copy(
                    sub_hbm.at[row, pl.ds(lo8, CH_R), :], sub_scr[i], sems.at[3, i]
                ).start()
            for i in range(W):
                row = row_ref[g * W + i]
                pltpu.make_async_copy(
                    genome_hbm.at[pl.ds(0, GWIN // 128), :], win_scr[i], sems.at[0, i]
                ).wait()
                pltpu.make_async_copy(
                    vp_hbm.at[row, pl.ds(0, CH_R), :], chlo_scr[i], sems.at[1, i]
                ).wait()
                pltpu.make_async_copy(
                    vp_hbm.at[row, pl.ds(0, CH_R), :], chhi_scr[i], sems.at[2, i]
                ).wait()
                pltpu.make_async_copy(
                    sub_hbm.at[row, pl.ds(0, CH_R), :], sub_scr[i], sems.at[3, i]
                ).wait()

        acc_n, acc_o, acc_h1, acc_h2 = [], [], [], []
        for i in range(W):
            b = g * W + i
            s = start_ref[b]
            fs = flat_start_ref[b]
            count = count_ref[b]
            lo0 = lo0_ref[b]
            hi0 = hi0_ref[b]
            if not do_compute:
                # consume the DMA'd bytes cheaply: first OUT_W words of
                # the window + a chunk lane-sum as n_variants
                words = win_scr[i][...][: OUT_W // 128].reshape(1, OUT_W)
                acc_h1.append(words[0])
                acc_h2.append(words[0])
                acc_n.append(jnp.sum(chlo_scr[i][...][:1, :1]))
                acc_o.append(jnp.sum(sub_scr[i][...][:1, :1]))
                continue
            ch_lo = chlo_scr[i][...]
            ch_hi = chhi_scr[i][...]
            lo = lo0 + jnp.sum((ch_lo < s).astype(jnp.int32))
            hi = hi0 + jnp.sum((ch_hi < s + L).astype(jnp.int32))
            n_in = jnp.maximum(jnp.minimum(hi, count) - jnp.minimum(lo, count), 0)
            n_apply = jnp.minimum(n_in, K)
            acc_n.append(n_in)
            acc_o.append(jnp.maximum(n_in - K, 0))
            delta = lo - lo0
            pos_k = _flat_take(ch_lo, delta, 1)
            sub_k = _flat_take(sub_scr[i][...], delta, 1)
            dg = (fs >> 2) - ((fs >> 2) // SP) * SP
            words = _flat_take(win_scr[i][...], dg, OUT_W // 128).reshape(1, OUT_W)
            lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            applied = lane_k < n_apply
            pos_buf = jnp.where(applied, (fs & 3) + pos_k - s, -1)
            word_idx = pos_buf >> 2
            plane = pos_buf & 3
            prio = jnp.where(applied, lane_k + 1, 0)
            out_word = jax.lax.broadcasted_iota(jnp.int32, (128, OUT_W), 1)
            h1 = words
            h2 = words
            wcol = jnp.broadcast_to(word_idx.reshape(128, 1), (128, OUT_W))
            pcol = jnp.broadcast_to(plane.reshape(128, 1), (128, OUT_W))
            kcol = jnp.broadcast_to(prio.reshape(128, 1), (128, OUT_W))
            c1col = jnp.broadcast_to((sub_k & 0xFF).reshape(128, 1), (128, OUT_W))
            c2col = jnp.broadcast_to((sub_k >> 8).reshape(128, 1), (128, OUT_W))
            for p in range(4):
                m = (wcol == out_word) & (pcol == p) & (kcol > 0)
                kb = jnp.max(jnp.where(m, kcol, 0), axis=0)[None, :]
                win = m & (kcol == jnp.broadcast_to(kb, (128, OUT_W)))
                c1 = jnp.max(jnp.where(win, c1col, 0), axis=0)[None, :]
                c2 = jnp.max(jnp.where(win, c2col, 0), axis=0)[None, :]
                has = kb > 0
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

    return kernel


def make_variant_call(do_dma: bool, do_compute: bool, w: int, L: int, K: int, legacy=None):
    """encode_windows_pallas clone wired to the lab kernel variant."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from haplohyped_tpu.ops.haplotype_window import HaplotypeWindows
    from haplohyped_tpu.ops.pallas_window import CH_R, _gwin, _out_words

    OUT_W = _out_words(L)
    GWIN = _gwin(L)
    kernel = functools.partial(
        lab_kernel_variant(do_dma, do_compute),
        L=L, K=K, OUT_W=OUT_W, GWIN=GWIN, W=w,
    )

    @jax.jit
    def call(index, chrom_offsets, donor_idx, chrom_idx, start):
        B = start.shape[0]
        DC = legacy["vp_pad"].shape[0]
        C = chrom_offsets.shape[0]
        c_iota = jnp.arange(C, dtype=jnp.int32)
        off_sel = jnp.sum(
            jnp.where(chrom_idx[:, None] == c_iota[None, :],
                      chrom_offsets[None, :], 0), axis=1,
        )
        row = (donor_idx * C + chrom_idx).astype(jnp.int32)
        dc_iota = jnp.arange(DC, dtype=jnp.int32)
        row_onehot = row[:, None] == dc_iota[None, :]
        count_sel = jnp.sum(jnp.where(row_onehot, index.counts[None, :], 0), axis=1)
        g_sel = jnp.sum(
            jnp.where(row_onehot[:, :, None], index.grid[None, :, :], 0), axis=1
        )
        from haplohyped_tpu.ops.pallas_window import SP

        blo = jnp.sum((g_sel < start[:, None]).astype(jnp.int32), axis=1)
        bhi = jnp.sum((g_sel < (start + L)[:, None]).astype(jnp.int32), axis=1)
        lo0 = jnp.maximum(blo - 1, 0) * SP
        hi0 = jnp.maximum(bhi - 1, 0) * SP
        flat_start = (off_sel + start).astype(jnp.int32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(B // w,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[
                pl.BlockSpec((w, OUT_W), lambda g, *_: (g, 0)),
                pl.BlockSpec((w, OUT_W), lambda g, *_: (g, 0)),
                pl.BlockSpec((1, 8, 128), lambda g, *_: (g, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda g, *_: (g, 0, 0)),
            ],
            scratch_shapes=(
                [pltpu.VMEM((GWIN // 128, 128), jnp.int32)] * w
                + [pltpu.VMEM((CH_R, 128), jnp.int32)] * (3 * w)
                + [pltpu.SemaphoreType.DMA((4, w))]
            ),
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
        )(
            flat_start, start.astype(jnp.int32), row,
            count_sel.astype(jnp.int32), lo0.astype(jnp.int32),
            hi0.astype(jnp.int32),
            index.genome_words, legacy["vp_pad"], legacy["sub_pad"],
        )

        def unpack(wrd):
            sh = jnp.stack([(wrd >> k) & 0xFF for k in (0, 8, 16, 24)], axis=-1)
            by = sh.astype(jnp.int8).reshape(B, OUT_W * 4)
            r4 = (flat_start & 3)[:, None]
            return jnp.where(
                r4 == 0, by[:, 0:L],
                jnp.where(r4 == 1, by[:, 1: 1 + L],
                          jnp.where(r4 == 2, by[:, 2: 2 + L], by[:, 3: 3 + L])),
            )

        return HaplotypeWindows(
            hap1=unpack(hap1w), hap2=unpack(hap2w),
            n_variants=nvar[:, 0, :w].reshape(B),
            overflow=ovf[:, 0, :w].reshape(B),
        )

    return call


def main() -> None:
    import jax

    from haplohyped_tpu.ops.pallas_window import encode_windows_pallas

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    idx, legacy, Lc, D = build_fixture()
    offs = np.zeros((1,), np.int32)
    B, L, K = 2048, 1000, 64
    n_chain = 16
    results = []

    for w in (8, 16, 32, 64):
        call = lambda i, o, di, ci, st, w=w: encode_windows_pallas(
            i, o, di, ci, st, L=L, K=K, w=w
        )
        try:
            results.append(
                measure(f"prod_w{w}", call, idx, offs, Lc, D, B, L, n_chain)
            )
        except Exception as exc:
            log(f"  prod_w{w} failed: {exc}")
            results.append({"name": f"prod_w{w}", "error": str(exc)[:300]})

    for name, dma, comp, w in (
        ("dma_only_w8", True, False, 8),
        ("dma_only_w32", True, False, 32),
        ("compute_only_w8", False, True, 8),
        ("compute_only_w32", False, True, 32),
    ):
        try:
            call = make_variant_call(dma, comp, w, L, K, legacy=legacy)
            results.append(measure(name, call, idx, offs, Lc, D, B, L, n_chain))
        except Exception as exc:
            log(f"  {name} failed: {exc}")
            results.append({"name": name, "error": str(exc)[:300]})

    out = {
        "platform": dev.platform,
        "B": B, "L": L, "K": K, "n_chain": n_chain,
        "method": "chained starts-from-digest + d2h fetch",
        "results": results,
    }
    path = os.path.join(ROOT, "benchmarks", "window_kernel_lab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"out": path, "n": len(results)}))


if __name__ == "__main__":
    main()
