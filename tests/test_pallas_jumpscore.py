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


def test_bounded_prefix_exact_with_fallback():
    """Bounded-insert-chain fast path: scores must equal the exact
    kernel after flagged-row rerun, on jobs engineered to need BOTH
    short chains (unflagged fast path) and long untemplated junction
    insertions (chains > 2^K, must flag)."""
    from manta_tpu.align.pallas_jumpscore import (
        pallas_jump_score_bounded, pallas_jump_score_flagged,
    )

    rng = np.random.default_rng(23)
    match, mismatch, open_, extend, off_edge = SCORES
    bases = b"ACGT"

    def mk(ins_len):
        # query = left half of r1 + ins_len novel bases + right half of
        # r2: the optimum is jump + an ins_len insert chain
        left = bytes(bases[i] for i in rng.integers(0, 4, 50))
        right = bytes(bases[i] for i in rng.integers(0, 4, 50))
        ins = bytes(bases[i] for i in rng.integers(0, 4, ins_len))
        r1 = bytes(bases[i] for i in rng.integers(0, 4, 30)) + left
        r2 = right + bytes(bases[i] for i in rng.integers(0, 4, 30))
        return (left + ins + right, r1, r2)

    jobs = [mk(0), mk(2), mk(40), mk(5), mk(90), mk(0)]
    nq_max = max(len(j[0]) for j in jobs)
    nr_max = max(max(len(j[1]), len(j[2])) for j in jobs)
    q, ql = _pad([j[0] for j in jobs], nq_max, 1)
    r1, r1l = _pad([j[1] for j in jobs], nr_max, 2)
    r2, r2l = _pad([j[2] for j in jobs], nr_max, 2)

    exact = np.asarray(pallas_jump_score(
        q, ql, r1, r1l, r2, r2l, match, mismatch, open_, extend,
        off_edge, JUMP, nq_max, nr_max, nr_max, interpret=True))

    for K in (3, 5):
        best, flag = pallas_jump_score_flagged(
            q, ql, r1, r1l, r2, r2l, match, mismatch, open_, extend,
            off_edge, JUMP, nq_max, nr_max, nr_max, K, interpret=True)
        best, flag = np.asarray(best), np.asarray(flag)
        # soundness: every row where the bounded score differs is flagged
        differs = best != exact
        assert not (differs & (flag == 0)).any(), (K, best, exact, flag)
        # the long-insertion jobs genuinely exercise the fallback
        if K == 3:
            assert flag[2] and flag[4], flag

        fixed, n_rerun = pallas_jump_score_bounded(
            q, ql, r1, r1l, r2, r2l, match, mismatch, open_, extend,
            off_edge, JUMP, nq_max, nr_max, nr_max, K, interpret=True)
        np.testing.assert_array_equal(np.asarray(fixed), exact)
        assert n_rerun == int((flag != 0).sum())


def test_bounded_prefix_random_soundness():
    """Fuzz: bounded+fallback equals exact on random jump jobs for
    several K."""
    from manta_tpu.align.pallas_jumpscore import pallas_jump_score_bounded

    rng = np.random.default_rng(31)
    match, mismatch, open_, extend, off_edge = SCORES
    jobs = _rand_jobs(rng, 8, 100, 200)
    q, ql = _pad([j[0] for j in jobs], 100, 1)
    r1, r1l = _pad([j[1] for j in jobs], 200, 2)
    r2, r2l = _pad([j[2] for j in jobs], 200, 2)
    exact = np.asarray(pallas_jump_score(
        q, ql, r1, r1l, r2, r2l, match, mismatch, open_, extend,
        off_edge, JUMP, 100, 200, 200, interpret=True))
    for K in (1, 2, 4, 6):
        fixed, _ = pallas_jump_score_bounded(
            q, ql, r1, r1l, r2, r2l, match, mismatch, open_, extend,
            off_edge, JUMP, 100, 200, 200, K, interpret=True)
        np.testing.assert_array_equal(np.asarray(fixed), exact)
