"""Multi-host sharded cohort conversion — the operator path.

One invocation of THIS script runs on EVERY host of the cluster (a TPU pod
slice, or N CPU hosts for a dry run), connected through three environment
variables (the standard ``jax.distributed`` contract):

    JAX_COORDINATOR_ADDRESS=host0:12355   # same value on every host
    JAX_NUM_PROCESSES=4                   # total hosts
    JAX_PROCESS_ID=0                      # unique per host, 0..N-1

Each host parses ONLY the (donor, chromosome) tasks whose mesh rows live on
its local devices (one single-pass ``frame_v2`` per chromosome group), the
all-gather merge rides ICI on a TPU slice (Gloo between CPU processes), and
host 0 writes the merged cohort. See docs/MULTIHOST.md for the full
runbook (failure handling, resume, pod-slice specifics).

Smoke mode (no env vars set): spawns ITSELF as a 2-process localhost
cluster on the bundled test corpus — the same harness
``tests/test_multiprocess.py`` pins bit-equality with.

Usage (per host):
    python examples/04_multihost_conversion.py \
        --vcf-dir /data/cohort_vcfs --samples /data/samples.txt \
        --out /shared/cohort.npz
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_conversion(vcf_dir: str, samples_path: str, out_path: str) -> None:
    """The per-host conversion driver (every host runs this identically)."""
    import jax
    import numpy as np

    from haplohyped_tpu.parallel import distributed
    from haplohyped_tpu.parallel.sharded_convert import convert_sharded
    from jax.sharding import Mesh

    # 1. join the cluster (no-op when the env vars are absent: the same
    #    script converts single-host)
    dist = distributed.initialize()
    pid, nprocs = distributed.process_info()
    print(f"[host {pid}/{nprocs}] {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices (distributed={dist})")

    # 2. the task axes: every host computes the SAME plan from the same
    #    inputs (no coordination needed — determinism is the protocol)
    with open(samples_path) as f:
        donors = [line.strip() for line in f if line.strip()]
    vcf_for = {
        os.path.basename(p).split(".")[0]: p
        for p in sorted(glob.glob(os.path.join(vcf_dir, "chr*.filtered.vcf.gz")))
    }
    if not vcf_for:
        raise SystemExit(f"no chr*.filtered.vcf.gz under {vcf_dir}")
    chroms = sorted(vcf_for)

    # 3. mesh over ALL global devices; convert_sharded parses host-local
    #    rows and the replicating jit inserts the all-gather merge
    mesh = Mesh(np.array(jax.devices()), ("data",))
    t0 = time.time()
    cohort = convert_sharded(
        vcf_for, donors, chroms, mesh,
        threads=int(os.environ.get("HH_CXX_THREADS", "2")),
        host_workers=int(os.environ.get("HH_HOST_WORKERS", "2")),
    )
    print(f"[host {pid}] converted {len(donors)} donors x {len(chroms)} "
          f"chroms in {time.time() - t0:.2f}s")

    # 4. barrier-then-write: every host holds the SAME merged (replicated)
    #    tensors after the all-gather; only host 0 writes
    distributed.barrier("convert_done")
    if pid == 0:
        np.savez(
            out_path,
            pos=cohort.pos, ref_code=cohort.ref_code,
            alt_code=cohort.alt_code, phase1=cohort.phase1,
            phase2=cohort.phase2, counts=cohort.counts,
        )
        print(f"[host 0] wrote merged cohort -> {out_path} "
              f"({int(np.asarray(cohort.counts).sum())} SNP records)")
    # 5. exit together (the coordination service tears down on exit)
    distributed.barrier("write_done")


def smoke() -> None:
    """Self-spawning 2-process localhost cluster on the bundled corpus."""
    import socket
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "tests", "data")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = os.path.join(tempfile.mkdtemp(prefix="hh_mh_"), "cohort.npz")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        env.pop("HH_MULTIHOST_SMOKE", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--vcf-dir", data,
             "--samples", os.path.join(data, "ipscs_samples_test.txt"),
             "--out", out],
            env=env,
        ))
    rcs = [p.wait(timeout=300) for p in procs]
    assert rcs == [0, 0], f"smoke cluster failed: {rcs}"
    import numpy as np

    m = np.load(out)
    print(f"smoke OK: merged counts {m['counts'].ravel().tolist()}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vcf-dir", help="directory of chr*.filtered.vcf.gz")
    ap.add_argument("--samples", help="donor list, one per line")
    ap.add_argument("--out", default="cohort.npz")
    args = ap.parse_args()

    if not args.vcf_dir and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        print("no --vcf-dir and no JAX_COORDINATOR_ADDRESS: running the "
              "2-process localhost smoke")
        smoke()
        return
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    run_conversion(args.vcf_dir, args.samples, args.out)


if __name__ == "__main__":
    main()
