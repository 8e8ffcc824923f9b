"""Device split-read scorer vs host reference implementation."""

import numpy as np

from manta_tpu.align.device_splitscore import batched_split_score, make_luts
from manta_tpu.scoring.evidence import QscoreSnp, split_read_aligner


def _random_case(rng, nq=100, nt=400):
    target = rng.integers(0, 4, nt)
    target = np.frombuffer(b"ACGT", np.uint8)[target].copy()
    # plant the read at a random position with some mismatches
    pos = rng.integers(0, nt - nq)
    read = target[pos:pos + nq].copy()
    n_mut = rng.integers(0, 6)
    for _ in range(n_mut):
        read[rng.integers(0, nq)] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4)]
    qual = rng.integers(10, 40, nq).astype(np.uint8)
    bp_beg = rng.integers(50, nt - 50)
    bp_end = bp_beg + rng.integers(0, 5)
    return read, qual, target, int(bp_beg), int(bp_end)


def test_device_matches_host():
    rng = np.random.default_rng(7)
    B, L, T = 16, 100, 400
    reads = np.full((B, L), 0xFF, np.uint8)
    quals = np.zeros((B, L), np.uint8)
    targets = np.zeros((B, T), np.uint8)
    bp_beg = np.zeros(B, np.int32)
    bp_end = np.zeros(B, np.int32)
    cases = []
    for b in range(B):
        read, qual, target, beg, end = _random_case(rng, L, T)
        reads[b] = read
        quals[b] = qual
        targets[b] = target
        bp_beg[b] = beg
        bp_end[b] = end
        cases.append((read, qual, target, beg, end))

    qconv = QscoreSnp(0.0)
    host = [split_read_aligner(50, r, qconv, q, t, beg, end)
            for (r, q, t, beg, end) in cases]

    lut_m, lut_x = make_luts(0.0)
    read_len = np.full(B, L, np.int32)
    target_len = np.full(B, T, np.int32)
    best, best_pos = batched_split_score(
        reads, quals, targets, bp_beg, bp_end, read_len, target_len,
        50, lut_m, lut_x, n_scan=T)
    best = np.asarray(best)
    best_pos = np.asarray(best_pos)
    for b in range(B):
        assert best_pos[b] == host[b].align_pos, \
            f"case {b}: {best_pos[b]} vs {host[b].align_pos}"
        assert abs(best[b] - host[b].align_ln_lhood) < 1e-3, \
            f"case {b}: {best[b]} vs {host[b].align_ln_lhood}"
