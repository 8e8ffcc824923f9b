"""Pallas TPU kernel for the batched split-read junction scan.

The XLA version (device_splitscore.py) materializes the full
(B, n_scan, L) window tensor in HBM via gather; this kernel keeps each
batch tile's target row resident in VMEM and slides the scan window
with dynamic slices, so HBM traffic is O(B*(T+L)) instead of
O(B*n_scan*L). Per scan position the VPU evaluates the basecall
ln-likelihood terms and a running winner-takes-first argmax lives in
VMEM scratch.

Host-side preparation rolls each target row so its scan window starts
at column 0 (one gather, reused for every scan position) and converts
quals to per-base match/mismatch ln-likelihood rows via the standard
LUTs (device_splitscore.make_luts).

Reference semantics: GenerateSVCandidates/SplitReadAlignment.cpp
splitReadAligner (see scoring/evidence.py for the exact host port).

Measured on one v5e chip at (B=512, T=500, L=150, S=159) with the
fetch-synchronized slope method (benchmarks/device_timing.py, round 3;
r^2 > 0.9999): 80,140 split-scans/s (1.9 Gterms/s) — 20.8x the XLA
gather formulation's 3,854 scans/s, and just behind the MXU/Toeplitz
form's 97,887 scans/s. Positions match the exact kernel bit-for-bit;
scores agree to ~1e-3 absolute (different accumulation order). In
production this kernel serves as the 'mxu' device mode's fallback for
batches containing IUPAC codes the one-hot MXU factorization cannot
encode (scoring/device_scan.py); the host-native scan (302k scans/s
per core) remains the overall default — see docs/PERF_r03.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device_splitscore import LN_RANDOM, MAX_QSCORE, make_luts  # noqa: F401

N_BASE = ord("N")
PAD_BASE = 0xFF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(reads_ref, lnm_ref, lnx_ref, target_ref, relbeg_ref, relend_ref,
            nk_ref, readlen_ref, best_ref, bestk_ref, n_scan: int):
    BB, Lp = reads_ref.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (BB, Lp), dimension=1)
    read = reads_ref[:]
    lnm = lnm_ref[:]
    lnx = lnx_ref[:]
    read_is_n = (read == N_BASE)
    base_valid = j < readlen_ref[:]          # (BB, Lp) via (BB, 1) bcast
    rel_beg = relbeg_ref[:]
    rel_end = relend_ref[:]
    n_k = nk_ref[:]                           # (BB, 1) valid scan count

    def body(k, carry):
        best, bestk = carry
        # lane-dim dynamic slices must be 128-aligned: load an aligned
        # chunk and rotate the sub-128 remainder into place
        k0 = pl.multiple_of((k // 128) * 128, 128)
        s = k - k0
        chunk = target_ref[:, pl.ds(k0, Lp + 128)]
        win = pltpu.roll(chunk, -s, axis=1)[:, :Lp]
        tpos = j + k
        in_range = (tpos > rel_beg) & (tpos <= rel_end)
        is_n = read_is_n | (win == N_BASE)
        mism = (read != win) | read_is_n
        terms = jnp.where(is_n, LN_RANDOM, jnp.where(mism, lnx, lnm))
        terms = jnp.where(base_valid & in_range, terms, jnp.float32(0))
        lnl = jnp.sum(terms, axis=1, keepdims=True)          # (BB, 1)
        valid = k < n_k
        lnl = jnp.where(valid, lnl, jnp.float32(-jnp.inf))
        # winner-takes-first: strictly greater replaces
        upd = lnl > best
        best = jnp.where(upd, lnl, best)
        bestk = jnp.where(upd, jnp.full_like(bestk, k), bestk)
        return best, bestk

    init = (jnp.full((BB, 1), -jnp.inf, jnp.float32),
            jnp.zeros((BB, 1), jnp.int32))
    best, bestk = jax.lax.fori_loop(0, n_scan, body, init)
    best_ref[:] = best
    bestk_ref[:] = bestk


@partial(jax.jit, static_argnames=("n_scan", "interpret"))
def pallas_split_score(reads, quals, targets, bp_beg, bp_end,
                       read_len, target_len, flank_score_size,
                       ln_match_lut, ln_mism_lut, n_scan: int,
                       interpret: bool = False):
    """Drop-in equivalent of device_splitscore.batched_split_score.

    Returns (best_lnlhood, best_pos): (B,) float32 / int32.
    """
    B, L = reads.shape
    T = targets.shape[1]
    Lp = _round_up(max(L, 128), 128)
    # tile-height sweep on chip: 8/16/32/64 rows give 1.9/2.14/2.3/2.42
    # Gterms/s — the kernel saturates near 32 (per-position chunk
    # rotate dominates, not lane fill), so 32 takes most of the gain
    # with half the padding waste of 64
    BB = 32
    Bp = _round_up(max(B, BB), BB)

    scan_start = jnp.maximum(0, bp_beg - read_len + 2)
    scan_end = jnp.maximum(0, jnp.minimum(bp_end, target_len - read_len))
    score_beg = bp_beg - flank_score_size
    score_end = bp_end + flank_score_size

    # per-base ln-likelihood rows from qual LUTs
    qual_i = jnp.clip(quals.astype(jnp.int32), 2, MAX_QSCORE)
    lnm = ln_match_lut[qual_i].astype(jnp.float32)
    lnx = ln_mism_lut[qual_i].astype(jnp.float32)

    # roll targets so each row's scan window starts at column 0; pad so
    # every 128-aligned chunk load stays in bounds
    Tp = _round_up(n_scan, 128) + Lp + 128
    col = jnp.arange(Tp, dtype=jnp.int32)[None, :] + scan_start[:, None]
    col_c = jnp.clip(col, 0, T - 1)
    rolled = jnp.take_along_axis(targets, col_c, axis=1)
    rolled = jnp.where(col < T, rolled, jnp.uint8(N_BASE))

    def pad2(x, rows, cols, fill):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])),
                       constant_values=fill)

    reads_p = pad2(reads, Bp, Lp, PAD_BASE).astype(jnp.int32)
    lnm_p = pad2(lnm, Bp, Lp, 0.0)
    lnx_p = pad2(lnx, Bp, Lp, 0.0)
    rolled_p = pad2(rolled, Bp, Tp, N_BASE).astype(jnp.int32)

    def pad1(x, fill):
        return jnp.pad(x.astype(jnp.int32), (0, Bp - B),
                       constant_values=fill)[:, None]

    relbeg = pad1(score_beg - scan_start, 0)
    relend = pad1(score_end - scan_start, -1)
    nk = pad1(scan_end - scan_start + 1, 0)
    rl = pad1(read_len, 0)

    grid = (Bp // BB,)
    row_spec = lambda shape: pl.BlockSpec(
        (BB, shape), lambda i: (i, 0), memory_space=pltpu.VMEM)
    best, bestk = pl.pallas_call(
        partial(_kernel, n_scan=n_scan),
        grid=grid,
        in_specs=[row_spec(Lp), row_spec(Lp), row_spec(Lp), row_spec(Tp),
                  row_spec(1), row_spec(1), row_spec(1), row_spec(1)],
        out_specs=[row_spec(1), row_spec(1)],
        out_shape=[jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, 1), jnp.int32)],
        interpret=interpret,
    )(reads_p, lnm_p, lnx_p, rolled_p, relbeg, relend, nk, rl)
    best = best[:B, 0]
    bestk = bestk[:B, 0]
    return best, scan_start + bestk
