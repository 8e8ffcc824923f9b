"""Device twin of the phase-1 read gates: bit-parity with the host
numpy building blocks on real demo reads, and execution under an
8-virtual-device mesh with a cross-shard count reduction."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from manta_tpu.core.readfilter import (
    has_sa_tag, is_innie_pair, is_read_unmapped_or_filtered_core,
)
from manta_tpu.io.bam import BamReader
from manta_tpu.parallel.mesh import make_mesh
from manta_tpu.parallel.phase1_mesh import (
    read_gate_masks, shard_evidence_counts,
)

MIN_MAPQ, MIN_TLEN, MAX_TLEN = 15, 100, 700


def _host_masks(batch, sa):
    core_bad = is_read_unmapped_or_filtered_core(batch, sa)
    innie = is_innie_pair(batch)
    atl = np.abs(batch.tlen)
    proper = innie & (atl >= MIN_TLEN) & (atl <= MAX_TLEN)
    mapped_pair = ((batch.flag & 0x1) != 0) & \
        ((batch.flag & (0x4 | 0x8)) == 0)
    anomalous = mapped_pair & ~proper
    candidate = ~core_bad & (batch.mapq >= MIN_MAPQ) & anomalous
    return core_bad, innie, anomalous, candidate


def _cols(batch, sa):
    return (batch.flag.astype(np.int32), batch.mapq.astype(np.int32),
            batch.pos.astype(np.int32), batch.next_pos.astype(np.int32),
            batch.refid.astype(np.int32),
            batch.next_refid.astype(np.int32),
            batch.tlen.astype(np.int32), sa)


def test_device_gates_match_host(tumor_bam):
    batch = BamReader(tumor_bam).read_all()
    sa = has_sa_tag(batch)
    host = _host_masks(batch, sa)
    dev = jax.jit(
        lambda *a: read_gate_masks(*a, MIN_MAPQ, MIN_TLEN, MAX_TLEN)
    )(*_cols(batch, sa))
    for h, d, name in zip(host, dev,
                          ("core_bad", "innie", "anomalous", "candidate")):
        np.testing.assert_array_equal(np.asarray(d), h, err_msg=name)


def test_device_gates_under_mesh(tumor_bam):
    """Reads position-sorted and sharded along the mesh data axis (the
    genome-bin decomposition); masks plus the psum'd evidence count
    must match the host exactly."""
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    batch = BamReader(tumor_bam).read_all()
    sa = has_sa_tag(batch)
    host = _host_masks(batch, sa)
    want_count = int(host[3].sum())

    cols = _cols(batch, sa)
    n = len(cols[0])
    pad = (-n) % n_dev
    # padding rows: unmapped flag -> core_bad, never candidates
    fills = (0x4, 0, 0, 0, -1, -1, 0, False)
    padded = [np.concatenate([c, np.full(pad, fill, c.dtype)])
              for c, fill in zip(cols, fills)]
    sh = NamedSharding(mesh, P("data"))
    ops = [jax.device_put(jnp.asarray(c), sh) for c in padded]

    @jax.jit
    def step(*a):
        masks = read_gate_masks(*a, MIN_MAPQ, MIN_TLEN, MAX_TLEN)
        return masks, shard_evidence_counts(masks[3])

    masks, count = step(*ops)
    jax.block_until_ready(count)
    assert int(count) == want_count
    np.testing.assert_array_equal(np.asarray(masks[3])[:n], host[3])
