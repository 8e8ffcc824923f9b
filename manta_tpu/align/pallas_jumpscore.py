"""Pallas TPU kernel for the batched jump-SWG alignment score.

The XLA formulation (device_jumpscore.batched_jump_score) measures
0.7 Gcells/s on a v5e chip — ~0.4% of the VPU envelope — because
lax.scan keeps its four (B, nq+1) int32 state matrices in HBM, so
every one of the ~30 vector ops per reference column round-trips HBM.
This kernel holds the whole DP state in VMEM/vregs for a tile of
batch rows and walks the reference columns in-register, which removes
the HBM traffic entirely: the only memory movement is the one-time
tile load of queries/refs.

Recurrences are the identical int32 jump DP (native
mt_align_jump_score_batch; reference alignment/GlobalJumpAlignerImpl.hpp
— studied not copied), including the exact max-plus prefix evaluation
of the in-column insert chain:

    ci[q] = extend*(q+1) + cummax_{k<=q}(f[k] - extend*k)

computed with log2(width) shift+max rounds on the lane axis. All
arithmetic is int32, so scores are bit-identical to the host native
aligner and the XLA kernel (tests/test_pallas_jumpscore.py pins all
three together).

Measured on one v5e chip (fetch-synchronized slope method,
benchmarks/device_timing.py): see docs/PERF_r03.md — this kernel is
the production device jump path when it wins there.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAD = -10000
NEG = -(1 << 28)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_right(x, s: int, fill):
    """x[:, q] <- x[:, q-s], first s lanes <- fill (s static)."""
    if s == 0:
        return x
    rolled = pltpu.roll(x, s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(col < s, fill, rolled)


def _maxplus_prefix(f, extend: int, col):
    """ci[q] = max_{k<=q}(f[k] + (q-k+1)*extend), exact int32
    (device_jumpscore._maxplus_prefix, lane-axis cummax by log-step
    shift+max rounds)."""
    g = jnp.where(f <= BAD, jnp.int32(NEG), f - extend * col)
    width = f.shape[1]
    s = 1
    while s < width:
        g = jnp.maximum(g, _shift_right(g, s, jnp.int32(NEG)))
        s *= 2
    out = g + extend * (col + 1)
    return jnp.maximum(out, jnp.int32(BAD))


def _ref_byte(ref_ref, c):
    """Reference byte at dynamic column c for every tile row: aligned
    128-chunk load + sub-128 rotate (lane-dim dynamic slices must be
    128-aligned)."""
    c0 = pl.multiple_of((c // 128) * 128, 128)
    s = c - c0
    chunk = ref_ref[:, pl.ds(c0, 128)]
    return pltpu.roll(chunk, -s, axis=1)[:, :1]        # (BB, 1)


def _kernel(qsh_ref, qlen_ref, ref1_ref, r1len_ref, ref2_ref, r2len_ref,
            best_ref, *, nr1: int, nr2: int, match: int, mismatch: int,
            open_: int, extend: int, off_edge: int, jump: int,
            prefix_rounds: int = 0, flag_ref=None):
    BB, NQ1 = qsh_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, NQ1), dimension=1)
    qsh = qsh_ref[:]                       # qsh[:, q] = query[q-1]
    qn = qlen_ref[:]                       # (BB, 1)
    r1len = r1len_ref[:]
    r2len = r2len_ref[:]
    i_bad = jnp.int32(BAD)
    i_neg = jnp.int32(NEG)

    at_end = col == qn                     # query fully consumed here
    fresh_m = (col * off_edge).astype(jnp.int32)
    bad_mat = jnp.full((BB, NQ1), BAD, jnp.int32)
    neg_mat = jnp.full((BB, NQ1), NEG, jnp.int32)

    # loop-invariant masks / affine terms, computed once so the column
    # bodies carry no iota or multiply work (the fori_loop bodies are
    # VPU-issue-bound — see the op-budget analysis in
    # docs/developerGuide.md)
    col_is0 = col == 0
    col_le1 = col <= 1
    ext_col = (extend * col).astype(jnp.int32)       # extend * q
    ext_col1 = ext_col + extend                      # extend * (q+1)
    round_masks = []
    s = 1
    while s < NQ1:
        round_masks.append(col < s)
        s *= 2
    m1 = round_masks[0]                              # col < 1

    def shift1(x, fill):
        """x[:, q] <- x[:, q-1], lane 0 <- fill."""
        return jnp.where(m1, fill, pltpu.roll(x, 1, axis=1))

    # bounded-chain mode (prefix_rounds = K > 0): run only the first K
    # log-step rounds — exact for insert chains up to 2^K - 1 lanes —
    # plus ONE detection round whose elementwise delta accumulates into
    # a flag. Soundness: if the full prefix would differ anywhere, the
    # dominating source value also dominates the 2^K window ending one
    # detection-shift away, so round K+1 strictly increases some lane
    # there (docs/developerGuide.md round-5 bounded-chain experiment);
    # flagged rows rerun through the full kernel, keeping results
    # bit-exact.
    bounded = prefix_rounds > 0 and prefix_rounds < len(round_masks)
    zero_mat = jnp.zeros((BB, NQ1), jnp.int32)

    def maxplus_prefix(f):
        """ci[q] = max_{k<=q}(f[k] + (q-k+1)*extend), exact int32 —
        lane-axis cummax by log-step shift+max rounds with hoisted
        masks. Values at BAD stay BAD (NEG floor under-clamps).

        Bounded mode (prefix_rounds = K > 0): only the first K rounds
        run — exact for insert chains shorter than 2^K lanes — plus ONE
        detection round; returns (out, delta) where delta > 0 anywhere
        means the bounded result may differ from the full prefix.
        Soundness: a source value that the full prefix would still
        propagate past 2^K lanes dominates its trailing 2^K window, so
        the detection shift strictly raises some lane; rows with
        delta > 0 rerun through the full kernel (caller), keeping
        scores bit-exact."""
        g = jnp.where(f <= i_bad, i_neg, f - ext_col)
        s = 1
        rounds = round_masks[:prefix_rounds] if bounded else round_masks
        for mk in rounds:
            g = jnp.maximum(g, jnp.where(mk, i_neg,
                                         pltpu.roll(g, s, axis=1)))
            s *= 2
        out = jnp.maximum(g + ext_col1, i_bad)
        if not bounded:
            return out, zero_mat
        mk = round_masks[prefix_rounds]
        g2 = jnp.maximum(g, jnp.where(mk, i_neg, pltpu.roll(g, s, axis=1)))
        # clamp to the output floor: sub-BAD differences never matter
        out2 = jnp.maximum(g2 + ext_col1, i_bad)
        return out, out2 - out

    def off_edge_best(cm, best):
        cand = cm + (qn - col) * off_edge
        cand = jnp.where(col < qn, cand, i_neg)
        return jnp.maximum(best, cand.max(axis=1, keepdims=True))

    def col_ref1(c, carry):
        pm, pd, pi, pj, bestm, fl = carry
        rc = _ref_byte(ref1_ref, c)
        sub = jnp.where(qsh == rc, jnp.int32(match), jnp.int32(mismatch))
        diag = jnp.maximum(jnp.maximum(pm, pd), pi)
        vm = shift1(diag, i_bad) + sub
        vm = jnp.where(col_is0, 0, vm)
        vd = jnp.maximum(jnp.maximum(pm + open_, pd), pi) + extend
        vd = jnp.where(col_le1, i_bad, vd)
        # insert chain starts at row 2 (reference's q==0 cutoff):
        # f = BAD at col<2 already yields BAD out of the prefix, so no
        # post-clamp is needed
        f = shift1(jnp.where(col_is0, i_bad, vm + open_), i_bad)
        vi, delta = maxplus_prefix(f)
        vj = jnp.maximum(jnp.maximum(vm + jump, vi + jump), pj)
        vj = jnp.where(col_is0, i_bad, vj)

        act = c < r1len                    # (BB, 1)
        vm = jnp.where(act, vm, pm)
        vd = jnp.where(act, vd, pd)
        vi = jnp.where(act, vi, pi)
        vj = jnp.where(act, vj, pj)
        # running elementwise best at the query-end lane; reduced to a
        # scalar per row ONCE at the phase boundary instead of a full
        # (BB, NQ1) max-reduce per column
        bestm = jnp.where(act & at_end, jnp.maximum(bestm, vm), bestm)
        if bounded:
            # lanes past the query end cannot reach a score; masking
            # them avoids false-positive reruns
            fl = jnp.where(act & (col <= qn), jnp.maximum(fl, delta), fl)
        return vm, vd, vi, vj, bestm, fl

    def col_ref2(c, carry):
        pm, pd, pi, pj, bestm, fl = carry
        rc = _ref_byte(ref2_ref, c)
        sub = jnp.where(qsh == rc, jnp.int32(match), jnp.int32(mismatch))
        diag = jnp.maximum(jnp.maximum(jnp.maximum(pm, pd), pi), pj)
        vm = shift1(diag, i_bad) + sub
        vm = jnp.where(col_is0, 0, vm)
        vd = jnp.maximum(jnp.maximum(pm + open_, pd), pi) + extend
        vd = jnp.where(col_is0, i_bad, vd)
        # insert: f[q] = max(vm[q-1]+open, pj[q-1]); jump->ins no open;
        # f = BAD at col<1 already yields BAD out of the prefix.
        # max commutes with the (same-fill) shift — one lane-roll, not
        # two; rolls are the kernel's binding resource (devguide)
        f = shift1(jnp.maximum(vm + open_, pj), i_bad)
        vi, delta = maxplus_prefix(f)

        act = c < r2len
        vm = jnp.where(act, vm, pm)
        vd = jnp.where(act, vd, pd)
        vi = jnp.where(act, vi, pi)
        bestm = jnp.where(act & at_end, jnp.maximum(bestm, vm), bestm)
        if bounded:
            fl = jnp.where(act & (col <= qn), jnp.maximum(fl, delta), fl)
        return vm, vd, vi, pj, bestm, fl

    cm, cd, ci, cj, bestm, fl = jax.lax.fori_loop(
        0, nr1, col_ref1,
        (fresh_m, bad_mat, bad_mat, bad_mat, neg_mat, zero_mat))
    best = bestm.max(axis=1, keepdims=True)
    best = off_edge_best(cm, best)

    cm, cd, ci, cj, bestm, fl = jax.lax.fori_loop(
        0, nr2, col_ref2,
        (fresh_m, bad_mat, bad_mat, cj, neg_mat, fl))
    best = jnp.maximum(best, bestm.max(axis=1, keepdims=True))
    best = off_edge_best(cm, best)
    best_ref[:] = best
    if flag_ref is not None:
        # one per-row reduce at the end (not per column): rows where
        # the detection round ever raised a lane need the exact rerun
        flag_ref[:] = (fl.max(axis=1, keepdims=True) > 0).astype(
            jnp.int32)


@partial(jax.jit, static_argnames=(
    "match", "mismatch", "open_", "extend", "off_edge", "jump_score",
    "nq_pad", "nr1_pad", "nr2_pad", "interpret", "prefix_rounds"))
def pallas_jump_score_flagged(query, query_len, ref1, ref1_len,
                              ref2, ref2_len,
                              match: int, mismatch: int, open_: int,
                              extend: int, off_edge: int, jump_score: int,
                              nq_pad: int, nr1_pad: int, nr2_pad: int,
                              prefix_rounds: int,
                              interpret: bool = False):
    """Bounded-insert-chain variant: exact for chains shorter than
    2^prefix_rounds lanes, returning (best, flag) where flag != 0 marks
    rows whose score may differ from the exact kernel (detection-round
    soundness argument in _kernel). Callers rerun flagged rows through
    pallas_jump_score — see pallas_jump_score_bounded."""
    return _pallas_jump_score_impl(
        query, query_len, ref1, ref1_len, ref2, ref2_len,
        match, mismatch, open_, extend, off_edge, jump_score,
        nq_pad, nr1_pad, nr2_pad, interpret, prefix_rounds)


def pallas_jump_score_bounded(query, query_len, ref1, ref1_len,
                              ref2, ref2_len,
                              match: int, mismatch: int, open_: int,
                              extend: int, off_edge: int, jump_score: int,
                              nq_pad: int, nr1_pad: int, nr2_pad: int,
                              prefix_rounds: int,
                              interpret: bool = False):
    """Exact scores via the bounded fast path + full-kernel rerun of
    flagged rows. Returns (scores int32 (B,), n_flagged int)."""
    import numpy as np
    best, flag = pallas_jump_score_flagged(
        query, query_len, ref1, ref1_len, ref2, ref2_len,
        match, mismatch, open_, extend, off_edge, jump_score,
        nq_pad, nr1_pad, nr2_pad, prefix_rounds, interpret)
    flag = np.asarray(flag)
    rows = np.flatnonzero(flag)
    if len(rows):
        exact = pallas_jump_score(
            np.asarray(query)[rows], np.asarray(query_len)[rows],
            np.asarray(ref1)[rows], np.asarray(ref1_len)[rows],
            np.asarray(ref2)[rows], np.asarray(ref2_len)[rows],
            match, mismatch, open_, extend, off_edge, jump_score,
            nq_pad, nr1_pad, nr2_pad, interpret)
        best = np.asarray(best).copy()
        best[rows] = np.asarray(exact)
    return best, len(rows)


@partial(jax.jit, static_argnames=(
    "match", "mismatch", "open_", "extend", "off_edge", "jump_score",
    "nq_pad", "nr1_pad", "nr2_pad", "interpret"))
def pallas_jump_score(query, query_len, ref1, ref1_len, ref2, ref2_len,
                      match: int, mismatch: int, open_: int, extend: int,
                      off_edge: int, jump_score: int,
                      nq_pad: int, nr1_pad: int, nr2_pad: int,
                      interpret: bool = False):
    """Drop-in equivalent of device_jumpscore.batched_jump_score
    (same contract; score-only int32, bit-exact)."""
    return _pallas_jump_score_impl(
        query, query_len, ref1, ref1_len, ref2, ref2_len,
        match, mismatch, open_, extend, off_edge, jump_score,
        nq_pad, nr1_pad, nr2_pad, interpret, 0)[0]


def _pallas_jump_score_impl(query, query_len, ref1, ref1_len,
                            ref2, ref2_len,
                            match, mismatch, open_, extend,
                            off_edge, jump_score,
                            nq_pad, nr1_pad, nr2_pad, interpret,
                            prefix_rounds):
    B = query.shape[0]
    # tile-height sweep on chip (docs/PERF_r03.md): 8→3.8, 16→7.1,
    # 32→14.0, 64→21.3, 128→22.1, 256→22.5 Gcells/s — saturates at 64;
    # 64 keeps padding waste small for the production batch buckets
    BB = 64
    Bp = _round_up(max(B, BB), BB)
    NQ1 = _round_up(nq_pad + 1, 128)
    NR1 = _round_up(max(nr1_pad, 1), 128) + 128   # chunk-load headroom
    NR2 = _round_up(max(nr2_pad, 1), 128) + 128

    def pad2(x, rows, cols, fill):
        x = jnp.asarray(x, jnp.int32)
        return jnp.pad(x, ((0, rows - x.shape[0]),
                           (0, cols - x.shape[1])), constant_values=fill)

    # qsh[:, q] = query[q-1]; sentinel 0 never equals a base code
    qsh = pad2(query, Bp, NQ1 - 1, 0)
    qsh = jnp.pad(qsh, ((0, 0), (1, 0)), constant_values=0)[:, :NQ1]
    ref1_p = pad2(ref1, Bp, NR1, 0)
    ref2_p = pad2(ref2, Bp, NR2, 0)

    def pad1(x, fill):
        x = jnp.asarray(x, jnp.int32)
        return jnp.pad(x, (0, Bp - x.shape[0]),
                       constant_values=fill)[:, None]

    qn = pad1(query_len, 1)
    r1n = pad1(ref1_len, 1)
    r2n = pad1(ref2_len, 1)

    grid = (Bp // BB,)
    row_spec = lambda w: pl.BlockSpec((BB, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    bounded = prefix_rounds > 0

    def kern(*refs):
        if bounded:
            *ins, best_ref, flag_ref = refs
            _kernel(*ins, best_ref, nr1=nr1_pad, nr2=nr2_pad, match=match,
                    mismatch=mismatch, open_=open_, extend=extend,
                    off_edge=off_edge, jump=jump_score,
                    prefix_rounds=prefix_rounds, flag_ref=flag_ref)
        else:
            *ins, best_ref = refs
            _kernel(*ins, best_ref, nr1=nr1_pad, nr2=nr2_pad, match=match,
                    mismatch=mismatch, open_=open_, extend=extend,
                    off_edge=off_edge, jump=jump_score)

    out_shape = jax.ShapeDtypeStruct((Bp, 1), jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec(NQ1), row_spec(1), row_spec(NR1), row_spec(1),
                  row_spec(NR2), row_spec(1)],
        out_specs=[row_spec(1), row_spec(1)] if bounded else row_spec(1),
        out_shape=[out_shape, out_shape] if bounded else out_shape,
        interpret=interpret,
    )(qsh, qn, ref1_p, r1n, ref2_p, r2n)
    if bounded:
        best, flag = outs
        return best[:B, 0], flag[:B, 0]
    return outs[:B, 0], None
