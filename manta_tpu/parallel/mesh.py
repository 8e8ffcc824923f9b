"""Device-mesh helpers for multi-chip scale-out.

The phase-2 hot path (candidate scoring: split-read scans, breakend
likelihoods) is embarrassingly parallel over candidates/edges, so the
primary mesh axis is data-parallel ``data`` over the batch dimension.
XLA inserts the cross-device collectives (psum for summary reductions)
from the sharding annotations; nothing here hand-schedules comms.

This replaces the reference's process-level parallelism (pyflow task
scheduler fanning GenerateSVCandidates over ~250 genome segments,
reference: src/python/lib/mantaWorkflow.py) with an SPMD mesh: genome
segments become batch entries, chips replace worker processes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs).reshape(-1), (axis,))


def shard_batch_spec(mesh: Mesh, axis: str = "data"):
    """(batch-sharded, replicated) NamedShardings for kernel operands."""
    return (NamedSharding(mesh, P(axis)), NamedSharding(mesh, P()))
