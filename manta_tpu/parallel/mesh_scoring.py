"""Mesh-sharded phase-2 contig scoring backend.

Drop-in replacement for align.device_jumpscore.make_bucketed_scorer
that shards the padded job batch over a jax.sharding.Mesh data axis
instead of dispatching to one chip: each device scores its slice of
the junction-contig jobs and results gather back to host. Scores are
the same exact int32 jump DP (bit-identical to the host traceback
aligner), so routing through a mesh cannot change winner selection —
asserted end-to-end by __graft_entry__.dryrun_multichip stage 5, which
runs the bundled COST16011 demo workflow through this backend and
diffs the somatic VCF against the host-scored run.

(reference analogue: GenerateSVCandidates' per-thread contig alignment
loop, GlobalJumpAlignerImpl.hpp via alignJumpContigs:1524 — re-designed
here as cross-edge batched, mesh-data-parallel scoring.)
"""

from __future__ import annotations

import numpy as np

from ..align.device_jumpscore import _bucket


def make_mesh_bucketed_scorer(mesh, scores, jump_score: int):
    """Production-shaped bucketed scorer over an n-device mesh.

    Pads job batches to shape buckets (a handful of compiled programs
    serve every junction) and to a device-divisible batch, shards the
    batch axis over `mesh`'s 'data' axis, and runs the XLA jump-score
    kernel under jit — XLA partitions the batched DP across devices
    with no cross-device communication until the final gather."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..align.device_jumpscore import batched_jump_score

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    axis = mesh.axis_names[0]
    batch_sh = NamedSharding(mesh, P(axis))

    def scorer(jobs):
        B = len(jobs)
        if B == 0:
            return np.zeros(0, np.int32)
        nq = _bucket(max(len(j[0]) for j in jobs))
        nr1 = _bucket(max(len(j[1]) for j in jobs))
        nr2 = _bucket(max(len(j[2]) for j in jobs))
        Bp = _bucket(B, tiers=(8, 16, 32, 64, 128, 256))
        Bp = -(-Bp // n_dev) * n_dev           # device-divisible

        def pad_to(seqs, n, fill):
            out = np.full((Bp, n), fill, np.int32)
            lens = np.zeros(Bp, np.int32)
            for i, s in enumerate(seqs):
                arr = np.frombuffer(bytes(s), np.uint8).astype(np.int32)
                out[i, :len(arr)] = arr
                lens[i] = len(arr)
            return out, lens

        q, ql = pad_to([j[0] for j in jobs] + [b"\x01"] * (Bp - B), nq, 1)
        r1, r1l = pad_to([j[1] for j in jobs] + [b"\x02"] * (Bp - B),
                         nr1, 2)
        r2, r2l = pad_to([j[2] for j in jobs] + [b"\x02"] * (Bp - B),
                         nr2, 2)
        q, ql, r1, r1l, r2, r2l = (
            jax.device_put(jnp.asarray(a), batch_sh)
            for a in (q, ql, r1, r1l, r2, r2l))
        out = batched_jump_score(
            q, ql, r1, r1l, r2, r2l,
            scores.match, scores.mismatch, scores.open, scores.extend,
            scores.off_edge, jump_score, nq, nr1, nr2)
        return np.asarray(jax.device_get(out))[:B]

    return scorer
