"""manta_tpu: a TPU-native structural-variant and indel caller.

A from-scratch reimplementation of the capabilities of the Illumina Manta
SV caller (reference layout surveyed in SURVEY.md) with a TPU-first
architecture: host-side ingestion of BAM/CRAM into packed read batches,
vectorized evidence scanning, a struct-of-arrays breakend graph, batched
de-Bruijn assembly, Pallas banded Smith-Waterman-Gotoh kernels, and JAX
Bayesian scoring models, sharded over device meshes with jax.sharding.
"""

__version__ = "0.1.0"
