"""Scaling-efficiency harness: sharded decode throughput vs shard count.

Runs the SPMD record-decode over meshes of 1/2/4/8 devices and reports
throughput + parallel efficiency.  On this repo's CI hardware the devices
are virtual CPU shards (methodology demonstration — the decode is
embarrassingly parallel, so the collective-free region should scale
linearly); on a real multi-chip slice the same code measures true ICI-backed
scaling, and `all_gather` merge cost is reported separately.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/scaling.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    # This image's sitecustomize pre-imports jax pinned to one tunneled TPU
    # chip; the scaling sweep needs a multi-device mesh, so claim the
    # 8-device virtual CPU platform while backends are still uninitialized.
    # Set HH_SCALING_PLATFORM=native to measure on real attached devices.
    if os.environ.get("HH_SCALING_PLATFORM", "cpu") == "cpu":
        try:
            from jax._src import xla_bridge as _xb

            if not getattr(_xb, "_backends", None):
                flags = os.environ.get("XLA_FLAGS", "")
                if "host_platform_device_count" not in flags:
                    os.environ["XLA_FLAGS"] = (
                        flags + " --xla_force_host_platform_device_count=8"
                    ).strip()
                jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import numpy as np

    from haplohyped_tpu.core.config import MeshConfig
    from haplohyped_tpu.hostio.frame_format import pack_frame
    from haplohyped_tpu.parallel import all_gather_cohort, make_mesh, sharded_decode_frames

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} ({jax.devices()[0].platform})")

    rng = np.random.default_rng(0)
    N = 1_000_000
    frames = np.zeros((N, 64), np.uint8)
    base = pack_frame(b"chr1", b"123456", b"A", b"G", b"1|0")
    frames[:] = base
    # vary positions so nothing is trivially constant-folded
    digits = rng.integers(ord("1"), ord("9"), size=(N, 6)).astype(np.uint8)
    frames[:, 9:15] = digits

    results = {}
    shards = [s for s in (1, 2, 4, 8) if s <= n_dev]
    for s in shards:
        mesh = make_mesh(MeshConfig(data=s, model=1), devices=jax.devices()[:s])
        dec = sharded_decode_frames(frames, mesh)  # compile + warm
        jax.block_until_ready(dec.start)
        t0 = time.time()
        iters = 3
        for i in range(iters):
            frames[0, 9] = ord("1") + i  # content-vary to defeat caching
            dec = sharded_decode_frames(frames, mesh)
            jax.block_until_ready(dec.start)
        dt = (time.time() - t0) / iters
        results[s] = N / dt
        print(f"shards={s}: {N / dt:,.0f} records/s ({dt * 1e3:.1f} ms)")

    base_tp = results[shards[0]]
    for s in shards[1:]:
        eff = results[s] / (base_tp * s) * 100
        print(f"scaling efficiency at {s} shards: {eff:.0f}%")
    phys = os.cpu_count() or 1
    if jax.devices()[0].platform == "cpu" and len(shards) > 1 and shards[-1] > phys:
        print(
            f"(note: host has {phys} physical cores — virtual CPU shards beyond "
            f"that saturate compute; efficiency above {phys} shards is not "
            "meaningful on this methodology rig, ICI scaling needs real chips)"
        )

    # merge-collective cost at max shard count
    mesh = make_mesh(MeshConfig(data=shards[-1], model=1))
    x = np.zeros((shards[-1] * 4096, 128), np.int32)
    g = all_gather_cohort(x, mesh)
    jax.block_until_ready(g)
    t0 = time.time()
    g = all_gather_cohort(x, mesh)
    jax.block_until_ready(g)
    print(f"all_gather merge of {x.nbytes / 1e6:.0f} MB: {(time.time() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
