"""Pallas jump-score kernel vs the XLA device kernel and the native
host aligner: all three must agree bit-for-bit (int32 DP).

Interpret mode on CPU; the same kernel compiles via Mosaic on TPU."""

import numpy as np

from manta_tpu.align.aligners import AlignmentScores, jump_score_batch
from manta_tpu.align.device_jumpscore import batched_jump_score
from manta_tpu.align.pallas_jumpscore import pallas_jump_score

SCORES = (2, -8, -18, -1, -1)        # match, mismatch, open, extend, offEdge
JUMP = -100


def _rand_jobs(rng, B, nq_max, nr_max):
    bases = b"ACGT"
    jobs = []
    for _ in range(B):
        nq = int(rng.integers(nq_max // 2, nq_max + 1))
        n1 = int(rng.integers(nr_max // 2, nr_max + 1))
        n2 = int(rng.integers(nr_max // 2, nr_max + 1))
        q = bytes(bases[i] for i in rng.integers(0, 4, nq))
        r1 = bytes(bases[i] for i in rng.integers(0, 4, n1))
        r2 = bytes(bases[i] for i in rng.integers(0, 4, n2))
        # embed halves of the query so jumps actually win sometimes
        cut = nq // 2
        p1 = int(rng.integers(0, n1 - cut)) if n1 > cut else 0
        p2 = int(rng.integers(0, n2 - cut)) if n2 > cut else 0
        r1 = r1[:p1] + q[:cut] + r1[p1 + cut:]
        r2 = r2[:p2] + q[cut:] + r2[p2 + cut - (nq - cut):] \
            if n2 >= nq - cut else r2
        jobs.append((q, r1[:n1], r2[:n2]))
    return jobs


def _pad(seqs, n, fill):
    B = len(seqs)
    out = np.full((B, n), fill, np.int32)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        a = np.frombuffer(bytes(s), np.uint8).astype(np.int32)
        out[i, :len(a)] = a
        lens[i] = len(a)
    return out, lens


def test_pallas_jump_matches_xla_and_native():
    rng = np.random.default_rng(17)
    match, mismatch, open_, extend, off_edge = SCORES
    for B, nq_max, nr_max in ((5, 60, 120), (9, 150, 260), (3, 40, 500)):
        jobs = _rand_jobs(rng, B, nq_max, nr_max)
        q, ql = _pad([j[0] for j in jobs], nq_max, 1)
        r1, r1l = _pad([j[1] for j in jobs], nr_max, 2)
        r2, r2l = _pad([j[2] for j in jobs], nr_max, 2)

        xla = np.asarray(batched_jump_score(
            q, ql, r1, r1l, r2, r2l, match, mismatch, open_, extend,
            off_edge, JUMP, nq_max, nr_max, nr_max))
        plr = np.asarray(pallas_jump_score(
            q, ql, r1, r1l, r2, r2l, match, mismatch, open_, extend,
            off_edge, JUMP, nq_max, nr_max, nr_max, interpret=True))
        native = jump_score_batch(
            jobs, AlignmentScores(*SCORES[:4], SCORES[4]), JUMP)

        np.testing.assert_array_equal(xla, native)
        np.testing.assert_array_equal(plr, xla)
