"""The minimum end-to-end slice (SURVEY §7): synthetic corpus -> cohort HDF5
-> reference HDF5 -> on-device sampler -> training steps of the flagship
model, plus the mesh-sharded conversion driver."""

import numpy as np
import pytest

import jax

from haplohyped_tpu.core.config import FastaEncodeConfig, MeshConfig, SamplerConfig
from haplohyped_tpu.data import CohortTensors, DeviceHaplotypeSampler, GenomeTensors
from haplohyped_tpu.data.regions import load_bed_regions
from haplohyped_tpu.models import HaploFormer, HaploFormerConfig
from haplohyped_tpu.models.train import train_on_sampler
from haplohyped_tpu.parallel import make_mesh
from haplohyped_tpu.parallel.sharded_convert import convert_sharded, plan_shards
from haplohyped_tpu.pipeline.fasta_encoder import encode_fasta
from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter

from tests.synth import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("e2e")), length=30_000, n_variants=400)


@pytest.fixture(scope="module")
def artifacts(corpus, tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("e2e_art"))
    conv = VCFtoHDF5Converter(
        cohort_name="e2e",
        vcf_dir=corpus["dir"],
        out_dir=outdir,
        sample_list_path=corpus["samples_file"],
        cores=2,
        cxx_threads=1,
        chromosomes=[corpus["chrom_num"]],
    )
    conv.run()
    ref_h5 = encode_fasta(
        FastaEncodeConfig(
            fasta_path=corpus["fasta"], out_dir=outdir, cores=1,
            chromosomes=(corpus["chrom"],),
        )
    )
    return {"cohort": conv.config.final_h5_path, "reference": ref_h5}


@pytest.mark.integration
def test_train_on_sampler(corpus, artifacts):
    sampler = DeviceHaplotypeSampler.from_files(
        bed_file=corpus["bed"],
        cohort_h5=artifacts["cohort"],
        reference_h5=artifacts["reference"],
        samples_file=corpus["samples_file"],
        config=SamplerConfig(seq_length=256, batch_size=8, seed=0),
    )
    model = HaploFormer(HaploFormerConfig(d_model=32, num_heads=2, num_layers=1))
    state, losses = train_on_sampler(sampler, model, steps=10, log_every=5)
    assert int(state.step) == 10
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.integration
def test_train_on_sampler_sharded(corpus, artifacts):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    sampler = DeviceHaplotypeSampler.from_files(
        bed_file=corpus["bed"],
        cohort_h5=artifacts["cohort"],
        reference_h5=artifacts["reference"],
        samples_file=corpus["samples_file"],
        config=SamplerConfig(seq_length=256, batch_size=8, seed=0),
    )
    model = HaploFormer(HaploFormerConfig(d_model=32, num_heads=2, num_layers=1))
    with mesh:
        state, losses = train_on_sampler(sampler, model, steps=4, mesh=mesh, log_every=2)
    assert int(state.step) == 4
    assert all(np.isfinite(l) for l in losses)


class TestShardedConvert:
    def test_plan(self):
        p = plan_shards(["a", "b"], ["chr1", "chr2"], 2)
        assert len(p.tasks) == 4
        assert p.shard_tasks(0) + p.shard_tasks(1) != []
        assert sorted(p.shard_tasks(0) + p.shard_tasks(1)) == sorted(p.tasks)

    def test_matches_unsharded(self, corpus, artifacts):
        mesh = make_mesh(MeshConfig(data=4, model=2))
        ct_sharded = convert_sharded(
            {corpus["chrom"]: corpus["vcf"]},
            corpus["samples"],
            [corpus["chrom"]],
            mesh,
        )
        ct_ref = CohortTensors.from_h5(artifacts["cohort"], donors=corpus["samples"])
        assert np.array_equal(ct_sharded.counts, ct_ref.counts)
        d, c = 1, 0
        n = ct_ref.counts[d, c]
        assert np.array_equal(ct_sharded.pos[d, c, :n], ct_ref.pos[d, c, :n])
        assert np.array_equal(ct_sharded.phase1[d, c, :n], ct_ref.phase1[d, c, :n])
        assert np.array_equal(ct_sharded.alt_code[d, c, :n], ct_ref.alt_code[d, c, :n])
