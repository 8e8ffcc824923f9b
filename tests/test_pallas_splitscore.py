"""Pallas split-score kernel vs the XLA device kernel (interpret mode
on CPU; the same kernel compiles via Mosaic on real TPU hardware)."""

import numpy as np

from manta_tpu.align.device_splitscore import batched_split_score, make_luts
from manta_tpu.align.pallas_splitscore import pallas_split_score


def test_pallas_matches_xla_kernel():
    rng = np.random.default_rng(7)
    B, L, T = 16, 100, 400
    bases = np.frombuffer(b"ACGT", np.uint8)
    targets = bases[rng.integers(0, 4, (B, T))].copy()
    reads = np.empty((B, L), np.uint8)
    for b in range(B):
        p = rng.integers(0, T - L)
        reads[b] = targets[b, p:p + L]
        for _ in range(rng.integers(0, 6)):
            reads[b, rng.integers(0, L)] = bases[rng.integers(0, 4)]
    quals = rng.integers(10, 40, (B, L)).astype(np.uint8)
    bp_beg = rng.integers(50, T - 50, B).astype(np.int32)
    bp_end = (bp_beg + rng.integers(0, 5, B)).astype(np.int32)
    rl = np.full(B, L, np.int32)
    tl = np.full(B, T, np.int32)
    lm, lx = make_luts(0.0)
    b1, p1 = batched_split_score(reads, quals, targets, bp_beg, bp_end,
                                 rl, tl, 50, lm, lx, n_scan=T)
    b2, p2 = pallas_split_score(reads, quals, targets, bp_beg, bp_end,
                                rl, tl, 50, lm, lx, n_scan=T,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=2e-3)
