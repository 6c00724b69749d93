"""Position-sharded genome + halo exchange: sharded window gathers must be
bit-identical to replicated gathers, including across shard boundaries."""

import numpy as np
import pytest

import jax

from haplohyped_tpu.core.config import MeshConfig
from haplohyped_tpu.parallel import make_mesh
from haplohyped_tpu.parallel.genome_shard import ShardedGenome, sharded_window_gather


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=8, model=1))


class TestShardedGenome:
    def test_windows_match_replicated(self, mesh):
        rng = np.random.default_rng(0)
        total = 100_000
        L = 1000
        codes = rng.integers(0, 5, total).astype(np.int8)
        sg = ShardedGenome.from_codes(codes, mesh, halo=L)

        # deliberately include shard-boundary-crossing windows
        boundaries = [sg.chunk * k for k in range(1, 8)]
        starts = np.array(
            [0, 17, total - L]
            + [b - L // 2 for b in boundaries if 0 <= b - L // 2 <= total - L]
            + list(rng.integers(0, total - L, 32)),
            dtype=np.int32,
        )
        got = np.asarray(sharded_window_gather(sg, starts, L))
        expected = np.stack([codes[s : s + L] for s in starts])
        assert np.array_equal(got, expected)

    def test_sharding_layout(self, mesh):
        codes = np.zeros(10_000, np.int8)
        sg = ShardedGenome.from_codes(codes, mesh, halo=256)
        assert sg.chunks_dev.shape[0] == 8
        assert sg.chunks_dev.shape[1] == sg.chunk + 256
        assert not sg.chunks_dev.sharding.is_fully_replicated

    def test_window_exceeding_halo_rejected(self, mesh):
        sg = ShardedGenome.from_codes(np.zeros(10_000, np.int8), mesh, halo=128)
        with pytest.raises(ValueError, match="exceeds halo"):
            sharded_window_gather(sg, np.zeros(2, np.int32), 256)


class TestFusedTrainStep:
    def test_fused_step_runs(self, tmp_path):
        from haplohyped_tpu.core.config import SamplerConfig
        from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE
        from haplohyped_tpu.data import CohortTensors, GenomeTensors
        from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler
        from haplohyped_tpu.models import HaploFormer, HaploFormerConfig
        from haplohyped_tpu.models.train import create_train_state, make_fused_train_step

        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        genome = GenomeTensors.from_code_arrays(
            {"chr1": rng.integers(0, 4, 50_000).astype(np.int8)}
        )
        n_var = 500
        table = np.zeros(n_var, dtype=SNP_STRUCT_DTYPE)
        table["chrom"] = b"chr1"
        table["start"] = np.sort(rng.choice(49_000, n_var, replace=False))
        table["stop"] = table["start"] + 1
        table["ref"] = b"A"
        table["alt"] = b"G"
        table["phase1"] = rng.integers(0, 2, n_var)
        cohort = CohortTensors.from_structs({("d0", "chr1"): table}, ["d0"], ["chr1"])
        spans = np.stack([(s := rng.integers(0, 48_000, 16)), s + 1000], axis=1)
        sampler = DeviceHaplotypeSampler(
            genome, cohort, spans, SamplerConfig(seq_length=256, batch_size=4, seed=0)
        )
        model = HaploFormer(HaploFormerConfig(d_model=32, num_heads=2, num_layers=1))
        b0 = sampler.sample()
        state, tx = create_train_state(model, jax.random.PRNGKey(0), (b0.hap1, b0.hap2))
        fused = make_fused_train_step(model, tx, sampler)
        for i in range(3):
            state, metrics = fused(state, jnp.int32(i))
        assert int(state.step) == 3
        assert np.isfinite(float(metrics["loss"]))
