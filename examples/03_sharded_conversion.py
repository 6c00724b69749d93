"""Mesh-sharded conversion on a virtual 8-device mesh.

Demonstrates the distributed story the reference lacks: (donor × chromosome)
tasks assigned round-robin over the ``data`` mesh axis, SPMD record decode,
and the per-shard variant tensors merged into a replicated cohort tensor via
one ``all_gather`` collective.

Run from the repo root:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/03_sharded_conversion.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # some images pre-import jax pinned to an accelerator platform via
        # sitecustomize (which overrides the env var); re-pin through the
        # config so the virtual CPU mesh requested above really applies
        jax.config.update("jax_platforms", "cpu")

    if jax.default_backend() != "cpu" and len(jax.devices()) < 2:
        print("single accelerator found; using it as a 1-device mesh")

    from haplohyped_tpu.core.config import MeshConfig
    from haplohyped_tpu.parallel import make_mesh
    from haplohyped_tpu.parallel.sharded_convert import convert_sharded

    n = len(jax.devices())
    mesh = make_mesh(MeshConfig(data=n, model=1))
    print(f"mesh: {dict(mesh.shape)}")

    with open(os.path.join(DATA, "ipscs_samples_test.txt")) as f:
        donors = [line.strip() for line in f if line.strip()]

    cohort = convert_sharded(
        {"chr22": os.path.join(DATA, "chr22.filtered.vcf.gz")},
        donors,
        ["chr22"],
        mesh,
    )
    print(f"cohort tensor: donors={cohort.num_donors} "
          f"chroms={cohort.chrom_names} vmax={cohort.max_variants}")
    print(f"variant counts: {cohort.counts.ravel().tolist()}")


if __name__ == "__main__":
    main()
