"""metamaps_tpu — a TPU-native long-read metagenomic classifier.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
DiltheyLab/MetaMaps (reference layout documented in SURVEY.md):

- winnowed-minimizer sketching of reads and a multi-genome reference
  (vectorized, bit-compatible with the reference's MurmurHash3/winnowing
  semantics — see ``metamaps_tpu.ops.murmur3`` / ``metamaps_tpu.ops.winnow``)
- two-stage (L1/L2) MinHash-Jaccard read mapping against an HBM-resident
  sorted-array minimizer index (``metamaps_tpu.ops``/``metamaps_tpu.engine``)
- binomial mapping-quality posterior model
  (``metamaps_tpu.engine.mapwrap.add_mapping_qualities`` + ``metamaps_tpu.stats``)
- EM sample-composition estimation with per-read taxonomic assignment
  (``metamaps_tpu.engine.em``)
- novel-species ("U") detection, DB construction toolchain, simulation and
  validation harness.

The compute path is JAX-first (jnp + Pallas kernels, pjit/shard_map over
device meshes); host-side streaming IO has a C++ fast path.
"""

__version__ = "0.1.0"
