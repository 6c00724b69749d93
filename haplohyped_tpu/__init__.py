"""haplohyped_tpu — TPU-native genotype-tensor engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Jaureguy760/HaploHyped-VarAwareML`` (reference layout documented in
``docs/ARCHITECTURE.md`` of that repo): phased-VCF cohorts are decoded into
Blosc-compressed HDF5 genotype tensors, reference genomes are one-hot encoded,
and variant-aware haplotype windows are sampled *on device* and fed straight
into training — no CPU DataLoader in the hot path.

Layers (each importable on its own):

- :mod:`haplohyped_tpu.core`     — frozen format constants, config dataclasses.
- :mod:`haplohyped_tpu.utils`    — encoding specs, one-hot, bitpack codecs.
- :mod:`haplohyped_tpu.storage`  — HDF5 + Blosc(32001) native filter, readers.
- :mod:`haplohyped_tpu.hostio`   — host-side I/O: BGZF/gzip decode, VCF record
  framing into fixed-shape uint8 buffers, FASTA access (C++ shim + pure-Python
  fallback).  This is the only un-accelerable part of the pipeline.
- :mod:`haplohyped_tpu.ops`      — device kernels: vectorized VCF field decode,
  fused haplotype window gather/substitute/one-hot, pack codecs.
- :mod:`haplohyped_tpu.pipeline` — ``vcf_to_h5`` / ``fasta_encoder`` converters
  and click CLIs (artifact-compatible with the reference writers).
- :mod:`haplohyped_tpu.data`     — cohort tensors + on-device batch sampler and
  a torch-compatible ``RandomHaplotypeDataset``.
- :mod:`haplohyped_tpu.parallel` — device mesh, sharded conversion, collectives.
- :mod:`haplohyped_tpu.models`   — flagship haplotype model + sharded train step.
"""

from haplohyped_tpu.version import __version__

__all__ = ["__version__"]
