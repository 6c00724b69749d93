"""Dataset + on-device sampler tests (the reference documents a
``test_dataset.py`` that never shipped — ``docs/ARCHITECTURE.md:269-278``).

Uses a synthetic corpus whose variants actually fall inside the FASTA so the
substitution path is exercised, then checks:
  - host dataset semantics against the generator's ground truth
  - device sampler == host encoder on identical windows
  - determinism under seeding, shapes, one-hot validity, K-cap overflow
"""

import os

import numpy as np
import pytest

from haplohyped_tpu.core.config import FastaEncodeConfig, SamplerConfig
from haplohyped_tpu.data import (
    CohortTensors,
    DeviceHaplotypeSampler,
    GenomeTensors,
    RandomHaplotypeDataset,
    load_bed_regions,
)
from haplohyped_tpu.data.haplotype_dataset import encode_haplotypes_host
from haplohyped_tpu.pipeline.fasta_encoder import encode_fasta
from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter

from tests.synth import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth"))
    return make_corpus(d)


@pytest.fixture(scope="module")
def artifacts(corpus, tmp_path_factory):
    """Cohort + reference HDF5 built from the synthetic corpus."""
    outdir = str(tmp_path_factory.mktemp("artifacts"))
    conv = VCFtoHDF5Converter(
        cohort_name="synth",
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
            fasta_path=corpus["fasta"],
            out_dir=outdir,
            cores=1,
            chromosomes=(corpus["chrom"],),
        )
    )
    return {"cohort": conv.config.final_h5_path, "reference": ref_h5}


class TestCohortConversionTruth:
    def test_snp_count_and_phases(self, corpus, artifacts):
        from haplohyped_tpu.storage import VCFH5Reader

        truth = corpus["truth"]
        with VCFH5Reader(artifacts["cohort"]) as r:
            for si, sample in enumerate(corpus["samples"]):
                t = r.fetch_genotypes(sample, corpus["chrom_num"])
                assert t.shape[0] == len(truth)
                assert np.array_equal(
                    t["start"], np.array([x[0] for x in truth], np.uint32)
                )
                assert np.array_equal(
                    t["phase1"], np.array([x[3][si][0] for x in truth], np.int8)
                )
                assert np.array_equal(
                    t["phase2"], np.array([x[3][si][1] for x in truth], np.int8)
                )
                assert np.array_equal(
                    t["alt"], np.array([x[2].encode() for x in truth], "S10")
                )


class TestHostDataset:
    def test_shapes_and_onehot(self, corpus, artifacts):
        ds = RandomHaplotypeDataset(
            bed_file=corpus["bed"],
            hdf5_genotype_file=artifacts["cohort"],
            hdf5_reference_file=artifacts["reference"],
            samples_file=corpus["samples_file"],
            seed=1,
            batch_size=4,
            seq_length=512,
        )
        try:
            assert len(ds) == 12
            h1, h2 = ds.sample_numpy()
            assert h1.shape == (4, 512, 5) and h2.shape == (4, 512, 5)
            assert np.array_equal(h1.sum(axis=-1), np.ones((4, 512)))
            assert np.array_equal(h2.sum(axis=-1), np.ones((4, 512)))
        finally:
            ds.close()

    def test_torch_getitem(self, corpus, artifacts):
        torch = pytest.importorskip("torch")
        ds = RandomHaplotypeDataset(
            bed_file=corpus["bed"],
            hdf5_genotype_file=artifacts["cohort"],
            hdf5_reference_file=artifacts["reference"],
            samples_file=corpus["samples_file"],
            seed=1,
            batch_size=2,
            seq_length=256,
        )
        try:
            h1, h2 = ds[0]
            assert isinstance(h1, torch.Tensor) and h1.dtype == torch.float32
            assert tuple(h1.shape) == (2, 256, 5)
        finally:
            ds.close()

    def test_seed_reproducibility(self, corpus, artifacts):
        def draw(seed):
            ds = RandomHaplotypeDataset(
                bed_file=corpus["bed"],
                hdf5_genotype_file=artifacts["cohort"],
                hdf5_reference_file=artifacts["reference"],
                samples_file=corpus["samples_file"],
                seed=seed,
                batch_size=3,
                seq_length=128,
            )
            try:
                return ds.sample_numpy()
            finally:
                ds.close()

        a1, a2 = draw(42)
        b1, b2 = draw(42)
        c1, _ = draw(43)
        assert np.array_equal(a1, b1) and np.array_equal(a2, b2)
        assert not np.array_equal(a1, c1)


class TestEncodeHaplotypesTruth:
    def test_substitution_semantics(self, corpus, artifacts):
        """Windows must equal: genome codes with ALT where phase==1 else
        the variant's REF code at every in-window variant position."""
        from haplohyped_tpu.core.constants import BASE_LUT
        from haplohyped_tpu.storage import VCFH5Reader

        seq_codes = BASE_LUT[corpus["seq"]]
        truth = corpus["truth"]
        sample = corpus["samples"][1]
        with VCFH5Reader(artifacts["cohort"]) as r:
            table = r.fetch_genotypes(sample, corpus["chrom_num"])
        start, end = 4_000, 6_000
        hap1, hap2 = encode_haplotypes_host(seq_codes[start:end], table, start, end)
        expected1 = np.array(seq_codes[start:end], copy=True)
        expected2 = expected1.copy()
        n_in = 0
        for pos0, ref, alt, per_sample in truth:
            if start <= pos0 < end:
                n_in += 1
                p1, p2 = per_sample[1]
                rc, ac = BASE_LUT[ord(ref)], BASE_LUT[ord(alt)]
                expected1[pos0 - start] = ac if p1 == 1 else rc
                expected2[pos0 - start] = ac if p2 == 1 else rc
        assert n_in > 0, "window contains no variants — corpus broken"
        assert np.array_equal(hap1, expected1)
        assert np.array_equal(hap2, expected2)


class TestDeviceSampler:
    @pytest.fixture(scope="class")
    def sampler(self, corpus, artifacts):
        return DeviceHaplotypeSampler.from_files(
            bed_file=corpus["bed"],
            cohort_h5=artifacts["cohort"],
            reference_h5=artifacts["reference"],
            samples_file=corpus["samples_file"],
            config=SamplerConfig(seq_length=512, batch_size=8, seed=0, max_variants_per_window=64),
        )

    def test_batch_shapes(self, sampler):
        """Default output is int8 codes (hap1 aliases hap1_codes — zero
        extra HBM writes); emit_onehot=True restores (B, L, C) one-hot."""
        batch = sampler.sample()
        assert batch.hap1.shape == (8, 512)
        assert batch.hap1.dtype == np.int8
        assert batch.hap1_codes.shape == (8, 512)
        assert np.array_equal(np.asarray(batch.hap1), np.asarray(batch.hap1_codes))

    def test_onehot_mode(self, corpus, artifacts):
        s = DeviceHaplotypeSampler.from_files(
            bed_file=corpus["bed"],
            cohort_h5=artifacts["cohort"],
            reference_h5=artifacts["reference"],
            samples_file=corpus["samples_file"],
            config=SamplerConfig(
                seq_length=512, batch_size=8, seed=0, max_variants_per_window=64
            ),
            emit_onehot=True,
        )
        batch = s.sample()
        assert batch.hap1.shape == (8, 512, 5)
        assert np.array_equal(np.asarray(batch.hap1.sum(-1)), np.ones((8, 512)))
        # one-hot is exactly the expansion of the codes
        assert np.array_equal(
            np.asarray(batch.hap1.argmax(-1)), np.asarray(batch.hap1_codes)
        )

    def test_deterministic_under_key(self, sampler):
        import jax

        k = jax.random.PRNGKey(123)
        b1 = sampler.sample(k)
        b2 = sampler.sample(k)
        assert np.array_equal(np.asarray(b1.hap1_codes), np.asarray(b2.hap1_codes))

    def test_sample_many_matches_sequential(self, corpus, artifacts):
        """sample_many(n) (one fused dispatch) is bit-equal to n successive
        sample() calls from the same seed/step state."""
        cfg = SamplerConfig(
            seq_length=256, batch_size=4, seed=7, max_variants_per_window=32
        )
        mk = lambda: DeviceHaplotypeSampler.from_files(
            bed_file=corpus["bed"],
            cohort_h5=artifacts["cohort"],
            reference_h5=artifacts["reference"],
            samples_file=corpus["samples_file"],
            config=cfg,
        )
        s_seq, s_fused = mk(), mk()
        seq = [s_seq.sample() for _ in range(4)]
        fused = s_fused.sample_many(4)
        assert fused.hap1.shape == (4, 4, 256)  # codes mode default
        for i, b in enumerate(seq):
            np.testing.assert_array_equal(
                np.asarray(fused.hap1_codes[i]), np.asarray(b.hap1_codes)
            )
            np.testing.assert_array_equal(
                np.asarray(fused.hap2_codes[i]), np.asarray(b.hap2_codes)
            )
        # step state advanced by n: the next draws also agree
        np.testing.assert_array_equal(
            np.asarray(s_fused.sample().hap1_codes),
            np.asarray(s_seq.sample().hap1_codes),
        )

    def test_device_matches_host_encoder(self, corpus, artifacts, sampler):
        """For each sampled window, re-encode on host and compare."""
        import jax

        from haplohyped_tpu.storage import VCFH5Reader

        batch = sampler.sample(jax.random.PRNGKey(7))
        codes1 = np.asarray(batch.hap1_codes)
        codes2 = np.asarray(batch.hap2_codes)

        # recover the draw (same key path as _sample_batch)
        folded = jax.random.fold_in(jax.random.PRNGKey(7), 0)
        kr, kd, kc = jax.random.split(folded, 3)
        import jax.numpy as jnp

        R = sampler._regions_dev.shape[0]
        D = len(sampler.cohort.donors)
        C = len(sampler.genome.chrom_names)
        B = sampler.config.batch_size
        L = sampler.config.seq_length
        region_idx = np.asarray(jax.random.randint(kr, (B,), 0, R))
        donor_idx = np.asarray(jax.random.randint(kd, (B,), 0, D))
        chrom_idx = np.asarray(jax.random.randint(kc, (B,), 0, C))

        spans = np.asarray(sampler._regions_dev)
        lengths = sampler.genome.lengths
        with VCFH5Reader(artifacts["cohort"]) as r:
            for b in range(B):
                s, e = spans[region_idx[b]]
                mid = (s + e) // 2
                new_start = max(0, mid - L // 2)
                start = min(new_start, max(0, int(lengths[chrom_idx[b]]) - L))
                donor = sampler.cohort.donors[donor_idx[b]]
                chrom = sampler.genome.chrom_names[chrom_idx[b]]
                table = r.fetch_genotypes(donor, chrom.removeprefix("chr"))
                off = int(sampler.genome.offsets[chrom_idx[b]])
                ref_codes = sampler.genome.codes_flat[off + start : off + start + L]
                h1, h2 = encode_haplotypes_host(ref_codes, table, start, start + L)
                assert np.array_equal(codes1[b], h1), f"hap1 mismatch in element {b}"
                assert np.array_equal(codes2[b], h2), f"hap2 mismatch in element {b}"

    def test_variant_stats(self, sampler):
        import jax

        batch = sampler.sample(jax.random.PRNGKey(3))
        assert np.asarray(batch.n_variants).sum() > 0
        assert (np.asarray(batch.overflow) >= 0).all()

    def test_overflow_cap(self, corpus, artifacts):
        small = DeviceHaplotypeSampler.from_files(
            bed_file=corpus["bed"],
            cohort_h5=artifacts["cohort"],
            reference_h5=artifacts["reference"],
            samples_file=corpus["samples_file"],
            config=SamplerConfig(seq_length=2048, batch_size=16, seed=0, max_variants_per_window=2),
        )
        import jax

        batch = small.sample(jax.random.PRNGKey(0))
        n = np.asarray(batch.n_variants)
        ov = np.asarray(batch.overflow)
        assert np.array_equal(ov, np.maximum(n - 2, 0))


class TestTensorContainers:
    def test_cohort_padding_sorted(self, corpus, artifacts):
        ct = CohortTensors.from_h5(artifacts["cohort"])
        assert ct.pos.shape[2] % 128 == 0
        d, c = 0, 0
        n = ct.counts[d, c]
        assert (np.diff(ct.pos[d, c, :n]) >= 0).all()
        assert (ct.pos[d, c, n:] == np.iinfo(np.int32).max).all()

    def test_genome_roundtrip(self, corpus, artifacts):
        from haplohyped_tpu.core.constants import BASE_LUT

        gt = GenomeTensors.from_h5(artifacts["reference"])
        assert gt.chrom_names == [corpus["chrom"]]
        assert gt.lengths[0] == corpus["length"]
        assert np.array_equal(
            gt.codes_flat[: corpus["length"]], BASE_LUT[corpus["seq"]]
        )

    def test_genome_from_fasta_matches_h5(self, corpus, artifacts):
        g1 = GenomeTensors.from_h5(artifacts["reference"])
        g2 = GenomeTensors.from_fasta(corpus["fasta"])
        assert np.array_equal(g1.codes_flat, g2.codes_flat)

    def test_bed_loader(self, corpus):
        chroms, spans, uniq = load_bed_regions(corpus["bed"])
        assert spans.shape == (12, 2)
        assert uniq == [corpus["chrom"]]


class TestChromAxisAlignment:
    def test_cohort_reordered_to_genome_axis(self):
        """A cohort whose chrom axis is a superset in different order must be
        re-indexed into the genome's chrom space (regression: mismatched
        axes silently applied the wrong chromosome's variants)."""
        from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE

        rng = np.random.default_rng(5)
        genomes = {
            "chrA": rng.integers(0, 4, 5000).astype(np.int8),
            "chrB": rng.integers(0, 4, 5000).astype(np.int8),
        }
        genome = GenomeTensors.from_code_arrays(genomes)

        def table(seed):
            r = np.random.default_rng(seed)
            n = 50
            t = np.zeros(n, dtype=SNP_STRUCT_DTYPE)
            t["start"] = np.sort(r.choice(4900, n, replace=False))
            t["stop"] = t["start"] + 1
            t["ref"] = b"A"
            t["alt"] = b"G"
            t["phase1"] = 1
            return t

        tables = {
            ("d0", "chrZ"): table(1),  # extra chrom, unknown to genome
            ("d0", "chrB"): table(2),
            ("d0", "chrA"): table(3),
        }
        cohort = CohortTensors.from_structs(
            tables, ["d0"], ["chrZ", "chrB", "chrA"]  # different order + superset
        )
        from haplohyped_tpu.core.config import SamplerConfig
        from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

        spans = np.stack([(s := np.arange(0, 4000, 500)), s + 400], axis=1)
        sampler = DeviceHaplotypeSampler(
            genome, cohort, spans,
            SamplerConfig(seq_length=256, batch_size=16, seed=0, max_variants_per_window=64),
        )
        # after alignment the sampler's cohort axis must equal the genome's
        assert sampler.cohort.chrom_names == genome.chrom_names

        import jax

        batch = sampler.sample(jax.random.PRNGKey(1))
        # verify against host encoding with the correctly matched tables
        from haplohyped_tpu.data.haplotype_dataset import encode_haplotypes_host

        folded = jax.random.fold_in(jax.random.PRNGKey(1), 0)
        kr, kd, kc = jax.random.split(folded, 3)
        B, L = 16, 256
        region_idx = np.asarray(jax.random.randint(kr, (B,), 0, spans.shape[0]))
        chrom_idx = np.asarray(jax.random.randint(kc, (B,), 0, 2))
        for b in range(B):
            s0, e0 = spans[region_idx[b]]
            mid = (s0 + e0) // 2
            start = min(max(0, mid - L // 2), 5000 - L)
            name = genome.chrom_names[chrom_idx[b]]
            t = tables[("d0", name)]
            off = int(genome.offsets[chrom_idx[b]])
            ref_codes = genome.codes_flat[off + start : off + start + L]
            h1, _ = encode_haplotypes_host(ref_codes, t, start, start + L)
            assert np.array_equal(np.asarray(batch.hap1_codes)[b], h1), b

    def test_missing_chrom_raises(self):
        genome = GenomeTensors.from_code_arrays({"chrA": np.zeros(1000, np.int8)})
        from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE

        cohort = CohortTensors.from_structs(
            {("d0", "chrQ"): np.zeros(0, SNP_STRUCT_DTYPE)}, ["d0"], ["chrQ"]
        )
        from haplohyped_tpu.core.config import SamplerConfig
        from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

        with pytest.raises(ValueError, match="lacks chromosomes"):
            DeviceHaplotypeSampler(
                genome, cohort, np.array([[0, 100]]), SamplerConfig(seq_length=64, batch_size=2)
            )


class TestCodesOnehotEquivalence:
    def test_model_identical_on_codes_and_onehot(self):
        """The same HaploFormer parameters produce identical outputs whether
        fed (B, L) int codes or their (B, L, C) one-hot expansion — the stem
        one-hots codes in compute dtype, fusing the expansion into conv1
        instead of materializing float32 batches in HBM."""
        import jax
        import jax.numpy as jnp

        from haplohyped_tpu.models import HaploFormer, HaploFormerConfig

        model = HaploFormer(HaploFormerConfig(d_model=32, num_heads=2, num_layers=1))
        rng = jax.random.PRNGKey(0)
        codes1 = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 5).astype(jnp.int8)
        codes2 = jax.random.randint(jax.random.PRNGKey(2), (2, 128), 0, 5).astype(jnp.int8)
        oh1 = jax.nn.one_hot(codes1, 5, dtype=jnp.float32)
        oh2 = jax.nn.one_hot(codes2, 5, dtype=jnp.float32)
        params = model.init(rng, codes1, codes2)["params"]
        out_codes = model.apply({"params": params}, codes1, codes2)
        out_onehot = model.apply({"params": params}, oh1, oh2)
        for k in out_codes:
            np.testing.assert_array_equal(
                np.asarray(out_codes[k]), np.asarray(out_onehot[k]), err_msg=k
            )

    def test_loss_identical_on_codes_and_onehot(self):
        import jax
        import jax.numpy as jnp

        from haplohyped_tpu.models import HaploFormer, HaploFormerConfig
        from haplohyped_tpu.models.train import loss_fn

        model = HaploFormer(HaploFormerConfig(d_model=32, num_heads=2, num_layers=1))
        codes1 = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 5).astype(jnp.int8)
        codes2 = jax.random.randint(jax.random.PRNGKey(2), (2, 128), 0, 5).astype(jnp.int8)
        params = model.init(jax.random.PRNGKey(0), codes1, codes2)["params"]
        nv = jnp.array([3.0, 4.0])
        l1, _ = loss_fn(params, model, codes1, codes2, nv)
        l2, _ = loss_fn(
            params,
            model,
            jax.nn.one_hot(codes1, 5, dtype=jnp.float32),
            jax.nn.one_hot(codes2, 5, dtype=jnp.float32),
            nv,
        )
        assert float(l1) == float(l2)
