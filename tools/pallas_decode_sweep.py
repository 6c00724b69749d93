#!/usr/bin/env python
"""B12_REC occupancy sweep for the Pallas 12-byte decode kernel (VERDICT
r4 #6): promote-or-demote with evidence.

The Mosaic decode kernel trails the packed XLA decode ~27x at its shipped
block size (1024 records/grid-step).  Hypothesis: per-grid-step overhead
dominates (16M records / 1024 = 16K grid steps), plus the (B, 12) uint8
block pads its lane dimension 12 -> 128 in VMEM (10.7x read
amplification).  This sweep measures the kernel under the chained-scan +
d2h-fetch anti-eliding design at block sizes 1024..32768 next to the
packed XLA decode on identical device-resident input, and writes
``benchmarks/pallas_decode_sweep.json``.

Run (TPU):  python tools/pallas_decode_sweep.py
"""

from __future__ import annotations

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


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from haplohyped_tpu.ops.pallas_decode import _pallas_decode12_call
    from haplohyped_tpu.ops.vcf_decode import decode_frames12_packed

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    # synthetic 16M-record frame12 corpus (content pattern irrelevant for
    # a bandwidth measurement; the chain mutates it every step anyway)
    rng = np.random.default_rng(0)
    N = 1 << 24
    rec = rng.integers(0, 256, size=(N, 12), dtype=np.uint8)

    CHAIN = 32

    def chained(fn):
        @jax.jit
        def run(r):
            def body(c, _):
                o = fn(c)
                tag = jnp.zeros((c.shape[0],), jnp.uint8)
                for leaf in jax.tree_util.tree_leaves(o):
                    l8 = leaf.astype(jnp.uint8) & 1
                    if l8.ndim > 1:
                        l8 = lax.reduce(
                            l8, np.uint8(0), lax.bitwise_xor,
                            tuple(range(1, l8.ndim)),
                        )
                    tag = tag ^ l8
                return c ^ tag[:, None], ()

            out, _ = lax.scan(body, r, None, length=CHAIN)
            return out

        return run

    results = []

    def measure(name, fn, n_pad):
        carry = jax.device_put(rec if n_pad == N else np.vstack(
            [rec, np.zeros((n_pad - N, 12), np.uint8)]), dev)
        run = chained(fn)
        buf = run(carry)  # compile
        int(np.asarray(buf[0, 2]))
        ts = []
        for _ in range(3):
            t0 = time.time()
            buf = run(buf)
            _ = int(np.asarray(buf[0, 2]))
            ts.append((time.time() - t0) / CHAIN)
        med = float(np.median(ts))
        vps = n_pad / med
        row = {"kernel": name, "records": n_pad,
               "per_step_s": round(med, 6), "variants_per_sec": round(vps)}
        results.append(row)
        log(f"  {name}: {med * 1e3:.3f} ms/step = {vps / 1e9:.3f}B variants/s")
        del buf, carry

    measure("xla_packed", lambda r: decode_frames12_packed(r), N)
    for block in (1024, 2048, 4096, 8192):
        n_pad = -(-N // block) * block
        try:
            measure(
                f"pallas_b{block}",
                lambda r, b=block: _pallas_decode12_call(r, True, block=b),
                n_pad,
            )
        except Exception as exc:
            log(f"  pallas_b{block} failed: {exc}")
            results.append({"kernel": f"pallas_b{block}", "error": str(exc)[:200]})
    # blocks >= 16384 are uncompilable: the (B, 12) uint8 block is cast to
    # int32 in-kernel, which pads lanes 12 -> 128, so VMEM needs B*512 B
    # for the cast alone — 16384*512 = 8 MB x stack copies blows the 16 MB
    # scoped-vmem limit (measured: 42.1 MB requested; the attempt also
    # wedges the relay client, so it is not retried here)
    results.append({
        "kernel": "pallas_b16384+",
        "error": "exceeds 16 MB scoped VMEM (lane-pad 12->128 on the int32 "
                 "cast); compile OOM measured at 42.1 MB",
    })

    best_pallas = max(
        (r for r in results if r["kernel"].startswith("pallas") and "variants_per_sec" in r),
        key=lambda r: r["variants_per_sec"], default=None,
    )
    xla = next(r for r in results if r["kernel"] == "xla_packed")
    verdict = {
        "winner": "xla_packed"
        if not best_pallas or xla["variants_per_sec"] >= best_pallas["variants_per_sec"]
        else best_pallas["kernel"],
        "xla_packed_vps": xla["variants_per_sec"],
        "best_pallas": best_pallas,
        "ratio_xla_over_best_pallas": round(
            xla["variants_per_sec"] / best_pallas["variants_per_sec"], 2
        ) if best_pallas else None,
    }
    out = {
        "platform": dev.platform,
        "method": "chained-scan+d2h-fetch",
        "chain": CHAIN,
        "results": results,
        "verdict": verdict,
    }
    path = os.path.join(ROOT, "benchmarks", "pallas_decode_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(f"verdict: {verdict}")
    print(json.dumps({"winner": verdict["winner"], "out": path}))


if __name__ == "__main__":
    main()
