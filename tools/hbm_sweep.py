#!/usr/bin/env python
"""HBM calibration sweep (VERDICT r4 #4): find the rig's TRUE sustainable
HBM bandwidth and separate it from relay/dispatch tax.

The r4 committed calibration (205 GB/s = 25% of the 819 GB/s v5e paper
peak) timed ONE chained dispatch of 32 xor steps over a 128 MB buffer and
divided by 32 — but the whole chain is only ~10 ms of ideal work measured
behind a d2h fetch whose RPC latency on this relay is the same order of
magnitude.  The fixed cost (dispatch + fetch + relay round trip) was being
amortized over too little work and silently billed to "bandwidth".

Method here: for each (op, dtype, buffer size) the SAME chained-scan +
d2h-fetch design runs at several chain lengths; total time is fit as
``t = a + b * chain`` by least squares, so ``b`` is the true per-step time
with the fixed cost ``a`` split out explicitly.  Bandwidth = bytes_moved /
b.  Every chain ends with a 1-element fetch of computed data (the only
timing the relay cannot fake — see bench.py's anti-eliding notes).

Writes ``benchmarks/hbm_calibration.json`` and prints a table.

Run (TPU):  python tools/hbm_sweep.py
CPU check:  JAX_PLATFORMS=cpu python tools/hbm_sweep.py --sizes-mb 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))

V5E_HBM_BYTES_PER_S = 819e9


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


#: op name -> (step fn, dtype, HBM bytes per step per buffer byte).
#: Each step must READ the whole carry and WRITE a content-fresh carry,
#: so one step = 1 read + 1 write.  CRITICAL: the step must not compose
#: into something simpler — a chain of ``c ^ 1`` steps is the IDENTITY for
#: even chain lengths (measured: total time flat from chain=4 to 16, i.e.
#: the whole scan collapsed / was elided and only RPC latency remained).
#: xorshift steps are nonlinear and never fold.
def _ops():
    import jax.numpy as jnp

    def xs32(c):  # xorshift32 step: nonlinear, bijective, content-fresh
        c = c ^ (c << 13)
        c = c ^ (c >> 17)
        return c ^ (c << 5)

    def xs8(c):  # u8 variant (shift amounts < 8)
        c = c ^ (c << 3)
        c = c ^ (c >> 5)
        return c ^ (c << 1)

    return {
        "xorshift_u8": (xs8, np.uint8, 2),
        "xorshift_i32": (xs32, np.int32, 2),
        "affine_f32": (lambda c: c * np.float32(1.000001) + np.float32(1.0),
                       np.float32, 2),
        # the old (broken) calibration op, kept to demonstrate the collapse
        "xor1_u8_identity_trap": (lambda c: c ^ jnp.uint8(1), np.uint8, 2),
    }


def measure(op_name: str, size_mb: int, chains: list[int], iters: int) -> dict:
    import jax
    from jax import lax

    fn, dtype, traffic = _ops()[op_name]
    dev = jax.devices()[0]
    n = (size_mb << 20) // np.dtype(dtype).itemsize
    host = np.zeros((n,), dtype)

    rows = []
    buf = jax.device_put(host, dev)
    for chain in chains:

        @jax.jit
        def chained(r, chain=chain):
            def body(c, _):
                return fn(c), ()

            out, _ = lax.scan(body, r, None, length=chain)
            return out

        buf = chained(buf)  # compile
        _ = int(np.asarray(buf[0]))  # d2h gate
        ts = []
        for _i in range(iters):
            t0 = time.time()
            buf = chained(buf)  # carry content differs every call
            _ = int(np.asarray(buf[0]))  # the fetch IS the attestation
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        rows.append({"chain": chain, "total_s": round(med, 5),
                     "per_step_naive_s": round(med / chain, 6)})
        log(f"  {op_name} {size_mb}MB chain={chain}: total {med:.4f}s "
            f"naive {size_mb * traffic / 1024 / (med / chain):.1f} GB/s")
    del buf

    # least-squares fit t = a + b*chain: b = true per-step time, a = the
    # fixed dispatch+fetch+relay cost this rig charges per call
    x = np.array([r["chain"] for r in rows], np.float64)
    y = np.array([r["total_s"] for r in rows], np.float64)
    b, a = np.polyfit(x, y, 1)
    bytes_per_step = (size_mb << 20) * traffic
    gbps_slope = bytes_per_step / max(b, 1e-12) / 1e9
    gbps_naive = bytes_per_step / (y[-1] / x[-1]) / 1e9
    return {
        "op": op_name,
        "size_mb": size_mb,
        "rows": rows,
        "fixed_cost_s": round(float(a), 5),
        "per_step_s": round(float(b), 6),
        "gb_per_sec_slope": round(gbps_slope, 1),
        "gb_per_sec_naive_longest": round(gbps_naive, 1),
        "hbm_peak_fraction": round(gbps_slope * 1e9 / V5E_HBM_BYTES_PER_S, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes-mb", default="64,128,256,512")
    ap.add_argument("--chains", default="8,32,128,512")
    ap.add_argument("--ops", default="xorshift_u8,xorshift_i32,affine_f32")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(ROOT, "benchmarks",
                                                  "hbm_calibration.json"))
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the image's sitecustomize pre-pins jax to the accelerator,
        # overriding the env var; repin before any backend initializes
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    sizes = [int(s) for s in args.sizes_mb.split(",")]
    chains = [int(c) for c in args.chains.split(",")]
    results = []
    for op in args.ops.split(","):
        for size in sizes:
            # cap total per-config work: chains scale with buffer size
            ch = [c for c in chains if c * size <= 512 * 512] or chains[:2]
            try:
                results.append(measure(op, size, ch, args.iters))
            except Exception as exc:
                log(f"{op} {size}MB failed: {exc}")
                results.append({"op": op, "size_mb": size, "error": str(exc)[:200]})

    best = max(
        (r for r in results if "gb_per_sec_slope" in r),
        key=lambda r: r["gb_per_sec_slope"],
        default=None,
    )
    out = {
        "platform": dev.platform,
        "method": "chained-scan+d2h-fetch, least-squares t=a+b*chain",
        "v5e_paper_peak_gb_per_sec": V5E_HBM_BYTES_PER_S / 1e9,
        "results": results,
        "best": best,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    if best:
        log(
            f"BEST sustained: {best['gb_per_sec_slope']} GB/s "
            f"({best['hbm_peak_fraction'] * 100:.1f}% of paper peak) at "
            f"{best['op']} {best['size_mb']}MB; fixed cost/call "
            f"{best['fixed_cost_s']}s"
        )
    print(json.dumps({"best_gb_per_sec": best and best["gb_per_sec_slope"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
