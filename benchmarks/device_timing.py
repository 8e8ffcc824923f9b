"""Fetch-synchronized on-chip kernel timing (defeats the axon tunnel).

Problem: on this machine the TPU is attached through a tunnel whose
dispatch is fire-and-forget — `block_until_ready()` returns in ~0.1 ms
regardless of enqueued work, so naive timing measures RPC latency, not
compute (round 1 published a bogus number this way; retracted in
docs/developerGuide.md).

Method: a device→host *result fetch* must synchronize — the bytes
cannot arrive before the computation producing them finishes. So each
measurement jits a `lax.fori_loop` of K kernel iterations whose inputs
are perturbed per-iteration (so nothing folds or hoists), reduces the
outputs to one scalar, and times call→`float(result)`. The constant
RPC round-trip appears as the intercept of time(K); the slope is the
true per-iteration device time. We fit the slope by least squares over
K ∈ {1, 8, 32, 128} (more spread = better conditioning) using
best-of-N at each K to reject background-load outliers.

Validation of the method on this box: a 2048³ matmul chain measures
within a few percent of the v5e bf16 peak envelope (see `matmul`
reference measurement, reported as MFU), and time(K) is linear in K
(r² reported) — neither would hold if the fetch were answered from a
cache or the dispatch were folding work away.

Measured kernels (the production device paths):
  - align/device_jumpscore.batched_jump_score   → contigs-aligned/s, Gcells/s
  - align/device_splitscore.batched_split_score → split-scans/s, Gterms/s
  - align/device_splitscore_mxu.junction_split_score → same, MXU form
  - align/pallas_splitscore.pallas_split_score  → same, Pallas kernel
  - reference bf16 matmul                        → MFU sanity anchor

Reference counterparts: GlobalJumpAlignerImpl.hpp (jump DP),
GenerateSVCandidates/SplitReadAlignment.cpp (split scan).

Usage: python benchmarks/device_timing.py [--kernel all] [--json out]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peak dense bf16 matmul throughput per chip (public spec).
V5E_PEAK_BF16_FLOPS = 197e12


def _fit_slope(pts):
    """Least-squares slope/intercept/r2 for time(K)."""
    ks = np.array([p[0] for p in pts], np.float64)
    ts = np.array([p[1] for p in pts], np.float64)
    A = np.stack([ks, np.ones_like(ks)], axis=1)
    (slope, intercept), res, *_ = np.linalg.lstsq(A, ts, rcond=None)
    ss_tot = float(((ts - ts.mean()) ** 2).sum())
    r2 = 1.0 - float(res[0]) / ss_tot if len(res) and ss_tot > 0 else 1.0
    return float(slope), float(intercept), r2


KS_DEFAULT = (1, 64, 512)


def slope_time(run_k, ks=None, reps=5):
    """Time run_k(k)→fetched scalar for each k; return per-iter seconds.

    run_k(k) must return a jax scalar whose value depends on every
    iteration (so the fetch synchronizes on the full chain). K values
    are spread wide so the compute signal dominates the ±ms RPC noise;
    fori_loop compile cost is K-independent (3 compiles total).
    """
    pts = []
    if ks is None:
        ks = KS_DEFAULT
    for k in ks:
        t0 = time.perf_counter()
        float(run_k(k))                     # compile + warm
        print(f"  [k={k}] compiled+warm in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_k(k))                 # fetch ⇒ device sync
            best = min(best, time.perf_counter() - t0)
        pts.append((k, best))
    slope, intercept, r2 = _fit_slope(pts)
    return slope, intercept, r2, pts


def _emit(rec, out):
    line = json.dumps(rec)
    print(line, flush=True)
    if out:
        out.write(line + "\n")
        out.flush()


# ---------------------------------------------------------------- kernels

def bench_matmul(out, n=2048):
    """bf16 matmul chain — MFU anchor validating the methodology."""
    import jax
    import jax.numpy as jnp

    x = jax.device_put(
        (np.random.randn(n, n) * 0.01).astype(np.float32))

    @partial(jax.jit, static_argnames=("k",))
    def run(x, k):
        def body(i, acc):
            y = acc + jnp.float32(i) * 1e-6   # perturb: no folding
            return jnp.tanh(y @ x)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    slope, icept, r2, pts = slope_time(lambda k: run(x, k=k))
    flops = 2.0 * n ** 3
    _emit({
        "kernel": "matmul_bf16_ref", "shape": f"{n}x{n}x{n}",
        "sec_per_iter": slope, "rpc_intercept_s": round(icept, 4),
        "r2": round(r2, 5),
        "tflops": round(flops / slope / 1e12, 1),
        "mfu": round(flops / slope / V5E_PEAK_BF16_FLOPS, 3),
        "points": [[k, round(t, 5)] for k, t in pts],
    }, out)


def bench_jump(out, B=64, nq=400, nr=800):
    """Production contig jump-scoring DP (device_jumpscore)."""
    import jax
    import jax.numpy as jnp
    from manta_tpu.align.device_jumpscore import batched_jump_score

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8).astype(np.int32)
    q = jax.device_put(bases[rng.integers(0, 4, (B, nq))])
    r1 = jax.device_put(bases[rng.integers(0, 4, (B, nr))])
    r2 = jax.device_put(bases[rng.integers(0, 4, (B, nr))])
    ql = jax.device_put(np.full(B, nq, np.int32))
    rl = jax.device_put(np.full(B, nr, np.int32))

    @partial(jax.jit, static_argnames=("k",))
    def run(q, ql, r1, r2, rl, k):
        def body(i, acc):
            # flip content per iteration (cost is data-independent;
            # the dependence defeats hoisting/folding)
            q2 = q + (i & 1)
            s = batched_jump_score(
                q2, ql, r1, rl, r2, rl,
                2, -8, -18, -1, -1, -100, nq, nr, nr)
            return acc + s.sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    slope, icept, r2_, pts = slope_time(
        lambda k: run(q, ql, r1, r2, rl, k=k))
    cells = float(B) * nq * (2 * nr)
    _emit({
        "kernel": "jump_score_dp", "shape": f"B={B},q={nq},refs=2x{nr}",
        "sec_per_iter": slope, "rpc_intercept_s": round(icept, 4),
        "r2": round(r2_, 5),
        "gcells_per_s": round(cells / slope / 1e9, 1),
        "contigs_per_s": round(B / slope, 1),
        "points": [[k, round(t, 5)] for k, t in pts],
    }, out)


def _split_inputs(B, T, L, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = bases[rng.integers(0, 4, (B, L))]
    quals = rng.integers(20, 40, (B, L)).astype(np.uint8)
    targets = bases[rng.integers(0, 4, (B, T))]
    bp_beg = np.full(B, T // 2 - 5, np.int32)
    bp_end = np.full(B, T // 2 + 5, np.int32)
    read_len = np.full(B, L, np.int32)
    target_len = np.full(B, T, np.int32)
    return reads, quals, targets, bp_beg, bp_end, read_len, target_len


def bench_split_exact(out, B=512, T=500, L=150):
    """Exact VPU split-scan (production default, bit-identical)."""
    import jax
    import jax.numpy as jnp
    from manta_tpu.align.device_splitscore import (batched_split_score,
                                                   make_luts)

    reads, quals, targets, bb, be, rl, tl = _split_inputs(B, T, L)
    lnm, lnx = make_luts(0.0)
    n_scan = int((be - np.maximum(0, bb - rl + 2)).max()) + 1
    args = [jax.device_put(a) for a in
            (reads, quals, targets, bb, be, rl, tl)]

    @partial(jax.jit, static_argnames=("k",))
    def run(reads, quals, targets, bb, be, rl, tl, k):
        def body(i, acc):
            q2 = quals ^ (i & 1).astype(jnp.uint8)
            best, pos = batched_split_score(
                reads, q2, targets, bb, be, rl, tl, 16,
                lnm, lnx, n_scan)
            return acc + best.sum() + pos.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    slope, icept, r2_, pts = slope_time(lambda k: run(*args, k=k))
    terms = float(B) * n_scan * L
    _emit({
        "kernel": "split_scan_exact", "shape": f"B={B},T={T},L={L},S={n_scan}",
        "sec_per_iter": slope, "rpc_intercept_s": round(icept, 4),
        "r2": round(r2_, 5),
        "gterms_per_s": round(terms / slope / 1e9, 1),
        "split_scans_per_s": round(B / slope, 1),
        "points": [[k, round(t, 5)] for k, t in pts],
    }, out)


def bench_split_pallas(out, B=512, T=500, L=150):
    """Pallas VMEM-resident split-scan — A/B against the XLA form."""
    import jax
    import jax.numpy as jnp
    from manta_tpu.align.device_splitscore import make_luts
    from manta_tpu.align.pallas_splitscore import pallas_split_score

    reads, quals, targets, bb, be, rl, tl = _split_inputs(B, T, L)
    lnm, lnx = make_luts(0.0)
    n_scan = int((be - np.maximum(0, bb - rl + 2)).max()) + 1
    args = [jax.device_put(a) for a in
            (reads, quals, targets, bb, be, rl, tl)]

    @partial(jax.jit, static_argnames=("k",))
    def run(reads, quals, targets, bb, be, rl, tl, k):
        def body(i, acc):
            q2 = quals ^ (i & 1).astype(jnp.uint8)
            best, pos = pallas_split_score(
                reads, q2, targets, bb, be, rl, tl, 16,
                lnm, lnx, n_scan)
            return acc + best.sum() + pos.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    slope, icept, r2_, pts = slope_time(lambda k: run(*args, k=k))
    terms = float(B) * n_scan * L
    _emit({
        "kernel": "split_scan_pallas", "shape": f"B={B},T={T},L={L},S={n_scan}",
        "sec_per_iter": slope, "rpc_intercept_s": round(icept, 4),
        "r2": round(r2_, 5),
        "gterms_per_s": round(terms / slope / 1e9, 1),
        "split_scans_per_s": round(B / slope, 1),
        "points": [[k, round(t, 5)] for k, t in pts],
    }, out)


def bench_split_mxu(out, G=8, R=64, T=500, L=150):
    """MXU (matmul) split-scan formulation over junction groups."""
    import jax
    import jax.numpy as jnp
    from manta_tpu.align.device_splitscore import make_luts
    from manta_tpu.align.device_splitscore_mxu import junction_split_score

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = bases[rng.integers(0, 4, (G, R, L))]
    quals = rng.integers(20, 40, (G, R, L)).astype(np.uint8)
    targets = bases[rng.integers(0, 4, (G, T))]
    bp_beg = np.full(G, T // 2 - 5, np.int32)
    bp_end = np.full(G, T // 2 + 5, np.int32)
    read_len = np.full((G, R), L, np.int32)
    target_len = np.full(G, T, np.int32)
    s0 = np.maximum(0, bp_beg - L + 2)
    n_scan = int((np.minimum(bp_end, target_len - L) - s0).max()) + 1
    lnm, lnx = make_luts(0.0)
    args = [jax.device_put(a) for a in
            (reads, quals, targets, s0, bp_beg, bp_end,
             read_len, target_len)]

    @partial(jax.jit, static_argnames=("k",))
    def run(reads, quals, targets, s0, bb, be, rl, tl, k):
        def body(i, acc):
            q2 = quals ^ (i & 1).astype(jnp.uint8)
            best, pos = junction_split_score(
                reads, q2, targets, s0, bb, be, rl, tl, 16,
                lnm, lnx, n_scan)
            return acc + best.sum() + pos.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    slope, icept, r2_, pts = slope_time(lambda k: run(*args, k=k))
    terms = float(G) * R * n_scan * L
    # MXU flops: 2 matmuls (hi/lo) of (R × 5L) @ (5L × S) per group
    flops = 2 * 2.0 * G * R * 5 * L * n_scan
    _emit({
        "kernel": "split_scan_mxu",
        "shape": f"G={G},R={R},T={T},L={L},S={n_scan}",
        "sec_per_iter": slope, "rpc_intercept_s": round(icept, 4),
        "r2": round(r2_, 5),
        "gterms_per_s": round(terms / slope / 1e9, 1),
        "split_scans_per_s": round(G * R / slope, 1),
        "mxu_tflops": round(flops / slope / 1e12, 2),
        "points": [[k, round(t, 5)] for k, t in pts],
    }, out)


def bench_jump_pallas(out, B=64, nq=400, nr=800):
    """Pallas VMEM-resident jump DP — A/B against the XLA scan form."""
    import jax
    import jax.numpy as jnp
    from manta_tpu.align.pallas_jumpscore import pallas_jump_score

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8).astype(np.int32)
    q = jax.device_put(bases[rng.integers(0, 4, (B, nq))])
    r1 = jax.device_put(bases[rng.integers(0, 4, (B, nr))])
    r2 = jax.device_put(bases[rng.integers(0, 4, (B, nr))])
    ql = jax.device_put(np.full(B, nq, np.int32))
    rl = jax.device_put(np.full(B, nr, np.int32))

    @partial(jax.jit, static_argnames=("k",))
    def run(q, ql, r1, r2, rl, k):
        def body(i, acc):
            q2 = q + (i & 1)
            s = pallas_jump_score(
                q2, ql, r1, rl, r2, rl,
                2, -8, -18, -1, -1, -100, nq, nr, nr)
            return acc + s.sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    slope, icept, r2_, pts = slope_time(
        lambda k: run(q, ql, r1, r2, rl, k=k))
    cells = float(B) * nq * (2 * nr)
    _emit({
        "kernel": "jump_score_pallas", "shape": f"B={B},q={nq},refs=2x{nr}",
        "sec_per_iter": slope, "rpc_intercept_s": round(icept, 4),
        "r2": round(r2_, 5),
        "gcells_per_s": round(cells / slope / 1e9, 1),
        "contigs_per_s": round(B / slope, 1),
        "points": [[k, round(t, 5)] for k, t in pts],
    }, out)


def bench_jump_pallas_bounded(out, B=64, nq=400, nr=800):
    """Bounded-insert-chain prefix variant (round-5 experiment): K
    prefix rounds + one detection round vs the 9-round exact prefix.
    Random ACGT queries never flag (no dominant long chains), so this
    measures the fast path's throughput; exactness + fallback behavior
    is pinned in tests/test_pallas_jumpscore.py."""
    import jax
    import jax.numpy as jnp
    from manta_tpu.align.pallas_jumpscore import pallas_jump_score_flagged

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8).astype(np.int32)
    q = jax.device_put(bases[rng.integers(0, 4, (B, nq))])
    r1 = jax.device_put(bases[rng.integers(0, 4, (B, nr))])
    r2 = jax.device_put(bases[rng.integers(0, 4, (B, nr))])
    ql = jax.device_put(np.full(B, nq, np.int32))
    rl = jax.device_put(np.full(B, nr, np.int32))

    for rounds in (3, 5):
        @partial(jax.jit, static_argnames=("k",))
        def run(q, ql, r1, r2, rl, k):
            def body(i, acc):
                q2 = q + (i & 1)
                s, fl = pallas_jump_score_flagged(
                    q2, ql, r1, rl, r2, rl,
                    2, -8, -18, -1, -1, -100, nq, nr, nr, rounds)
                return acc + s.sum() + fl.sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        slope, icept, r2_, pts = slope_time(
            lambda k: run(q, ql, r1, r2, rl, k=k))
        cells = float(B) * nq * (2 * nr)
        _emit({
            "kernel": f"jump_score_pallas_bounded_k{rounds}",
            "shape": f"B={B},q={nq},refs=2x{nr}",
            "sec_per_iter": slope, "rpc_intercept_s": round(icept, 4),
            "r2": round(r2_, 5),
            "gcells_per_s": round(cells / slope / 1e9, 1),
            "contigs_per_s": round(B / slope, 1),
            "points": [[k, round(t, 5)] for k, t in pts],
        }, out)


BENCHES = {
    "matmul": bench_matmul,
    "jump": bench_jump,
    "jump_pallas": bench_jump_pallas,
    "jump_pallas_bounded": bench_jump_pallas_bounded,
    "split_exact": bench_split_exact,
    "split_pallas": bench_split_pallas,
    "split_mxu": bench_split_mxu,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="all",
                    choices=["all"] + sorted(BENCHES))
    ap.add_argument("--json", default=None,
                    help="append JSON lines to this file")
    ap.add_argument("--ks", default=None,
                    help="comma-separated K values (e.g. 1,16,64); "
                         "long-running programs through the tunnel can "
                         "trip a worker watchdog near ~60 s, so heavy "
                         "kernels need a smaller K range")
    args = ap.parse_args()
    if args.ks:
        global KS_DEFAULT
        KS_DEFAULT = tuple(int(x) for x in args.ks.split(","))

    import jax
    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(json.dumps({"error": f"no TPU (platform={plat})"}))
        sys.exit(1)

    out = open(args.json, "a") if args.json else None
    names = sorted(BENCHES) if args.kernel == "all" else [args.kernel]
    for name in names:
        try:
            BENCHES[name](out)
        except Exception as e:  # keep going; report the failure
            _emit({"kernel": name, "error": f"{type(e).__name__}: {e}"},
                  out)


if __name__ == "__main__":
    main()
