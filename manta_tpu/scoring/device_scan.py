"""Device (TPU) routing for production split-read scoring.

Batches one breakend's candidate reads x junction targets into the
jitted XLA scan kernel (align/device_splitscore.batched_split_score).
The kernel's float32 accumulation order matches the native host scan
exactly (gated terms contribute +0.0f), so device and host paths give
bit-identical winners; routing is therefore a pure performance choice.

Shapes are bucketed (read length and scan length padded to fixed
tiers) so a handful of compiled programs serve every junction.
Enabled with run_workflow(use_device_scoring=True) /
--device-scoring; requires an available JAX device.
"""

from __future__ import annotations

import numpy as np

_TIERS = (256, 512, 1024, 2048, 4096, 8192)


def _bucket(n: int) -> int:
    for t in _TIERS:
        if n <= t:
            return t
    return ((n + 8191) // 8192) * 8192


class DeviceScanContext:
    """Holds jnp LUTs per qscore converter and dispatches bucketed
    batches to the jitted kernel."""

    def __init__(self):
        import jax  # noqa: F401  (fail early if unavailable)
        self._luts = {}

    def _luts_for(self, qconv):
        hit = self._luts.get(id(qconv))
        if hit is None:
            import jax.numpy as jnp
            m, x = qconv.lut256()
            # kernel clamps quals to [2, 70] and indexes a 71-entry LUT;
            # reuse the first 71 entries of the 256-entry byte LUTs
            hit = (jnp.asarray(m[:71]), jnp.asarray(x[:71]), qconv)
            self._luts[id(qconv)] = hit
        return hit[0], hit[1]

    def scan_multi(self, flank_score_size, batch, read_idx, qconv,
                   targets, bp_ranges):
        """Same contract as evidence.split_read_scan_multi."""
        import jax
        from ..align.device_splitscore import batched_split_score

        n = len(read_idx)
        t = len(targets)
        B = n * t
        read_lens = (batch.seq_off[read_idx + 1]
                     - batch.seq_off[read_idx]).astype(np.int32)
        Lp = _bucket(int(read_lens.max()))
        Tp = _bucket(max(len(tg) for tg in targets) + 1)

        reads = np.full((B, Lp), 0xFF, np.uint8)
        quals = np.zeros((B, Lp), np.uint8)
        tgts = np.full((B, Tp), ord("N"), np.uint8)
        bp_beg = np.zeros(B, np.int32)
        bp_end = np.zeros(B, np.int32)
        rl = np.zeros(B, np.int32)
        tl = np.zeros(B, np.int32)
        for r in range(n):
            i = int(read_idx[r])
            s0, s1 = int(batch.seq_off[i]), int(batch.seq_off[i + 1])
            q0, q1 = int(batch.qual_off[i]), int(batch.qual_off[i + 1])
            for k in range(t):
                row = r * t + k
                reads[row, :s1 - s0] = batch.seq[s0:s1]
                quals[row, :q1 - q0] = batch.qual[q0:q1]
                tg = targets[k]
                tgts[row, :len(tg)] = tg
                bp_beg[row] = bp_ranges[k][0]
                bp_end[row] = bp_ranges[k][1]
                rl[row] = s1 - s0
                tl[row] = len(tg)
        lut_m, lut_x = self._luts_for(qconv)
        # stage explicitly: jit-compiling from host numpy args can
        # produce a drastically slower executable (see
        # align/device_jumpscore.jump_scores)
        reads, quals, tgts, bp_beg, bp_end, rl, tl = (
            jax.device_put(a)
            for a in (reads, quals, tgts, bp_beg, bp_end, rl, tl))
        best, pos = batched_split_score(
            reads, quals, tgts, bp_beg, bp_end, rl, tl,
            flank_score_size, lut_m, lut_x, n_scan=Tp)
        best = np.asarray(jax.device_get(best))
        pos = np.asarray(jax.device_get(pos))
        return (best.reshape(n, t).astype(np.float32),
                pos.reshape(n, t).astype(np.int32))
