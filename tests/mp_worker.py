"""Multi-process conversion worker (spawned by test_multiprocess.py and
benchmarks/scaling.py --processes).

Each process owns its virtual CPU devices, joins a jax.distributed cluster at
the given coordinator port, parses ONLY the (donor, chrom) tasks whose
``P('data')`` rows live on its local devices — with the single-pass plan a
process's block is a (chromosome, donor-run), costing ONE ``frame_v2`` pass
per chromosome it touches — and participates in the all-gather merge (Gloo
between CPU processes; the identical code rides ICI collectives on a real
TPU slice).  Process 0 writes the merged cohort tensors to the given .npz.

Scaling-methodology knobs (VERDICT r2 #5):
- ``host_workers=1`` and ``threads=1``: one worker thread per process, so a
  2-process run on a 2-core rig contends only on the resource under study;
- a warmup conversion runs first and is EXCLUDED from the reported time
  (jit compiles, page cache, Gloo channel setup all land in the warmup).

Usage: mp_worker.py <port> <process_id> <num_processes> <data_dir> <out_npz>
       [--devices-per-proc N]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEVS = 2
if "--devices-per-proc" in sys.argv:
    DEVS = int(sys.argv[sys.argv.index("--devices-per-proc") + 1])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").split("--xla_force_host_platform")[0]
    + f" --xla_force_host_platform_device_count={DEVS}"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    port, pid, nprocs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_dir, out_npz = sys.argv[4], sys.argv[5]
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
    assert jax.process_count() == nprocs

    from jax.sharding import Mesh

    from haplohyped_tpu.parallel.sharded_convert import convert_sharded

    samples_file = next(
        p
        for p in (
            os.path.join(data_dir, "ipscs_samples_test.txt"),
            os.path.join(data_dir, "samples.txt"),
        )
        if os.path.exists(p)
    )
    with open(samples_file) as f:
        donors = [line.strip() for line in f if line.strip()]
    # every chr{name}.filtered.vcf.gz in the corpus dir is a task axis entry
    vcfs = sorted(glob.glob(os.path.join(data_dir, "chr*.filtered.vcf.gz")))
    vcf_for = {
        os.path.basename(p).split(".")[0]: p for p in vcfs
    }
    chroms = sorted(vcf_for)

    mesh = Mesh(np.array(jax.devices()), ("data",))

    def convert():
        return convert_sharded(
            vcf_for, donors, chroms, mesh, threads=1, host_workers=1
        )

    convert()  # warmup: compiles, page cache, collective channels
    t0 = time.time()
    cohort = convert()
    elapsed = time.time() - t0
    print(f"proc {pid}/{nprocs}: converted in {elapsed:.2f}s", flush=True)

    if pid == 0:
        np.savez(
            out_npz,
            pos=cohort.pos,
            ref_code=cohort.ref_code,
            alt_code=cohort.alt_code,
            phase1=cohort.phase1,
            phase2=cohort.phase2,
            counts=cohort.counts,
            elapsed=np.float64(elapsed),
        )
    # exit together (the coordination service tears down on process exit)
    if nprocs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
