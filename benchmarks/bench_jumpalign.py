"""Contig jump-alignment throughput: device kernel vs host DP.

Measures the 'candidate contigs aligned/s' north-star metric
(SURVEY.md section 6): batched two-reference jump-alignment scoring
(reference: GlobalJumpAligner.hpp:36) of assembled contigs against a
pair of breakend reference windows.

- device: manta_tpu/align/device_jumpscore.batched_jump_score — a
  lax.scan over reference columns with an in-column max-plus prefix
  for the insert chain; exact int32 score parity with the host DP.
- host:   the production native C++ aligner (with backtrace, as used
  by the refiner), one contig at a time.

Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_inputs(rng, B, Lq, Lr):
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref1 = ["".join(map(chr, bases[rng.integers(0, 4, Lr)]))
            for _ in range(B)]
    ref2 = ["".join(map(chr, bases[rng.integers(0, 4, Lr)]))
            for _ in range(B)]
    queries = []
    for b in range(B):
        # contig straddles the junction: prefix from ref1, suffix ref2
        k = int(rng.integers(Lq // 4, 3 * Lq // 4))
        p1 = int(rng.integers(0, Lr - k))
        p2 = int(rng.integers(0, Lr - (Lq - k)))
        queries.append(ref1[b][p1:p1 + k] + ref2[b][p2:p2 + Lq - k])
    return queries, ref1, ref2


def main():
    import jax

    from manta_tpu.align.aligners import AlignmentScores, GlobalJumpAligner

    sc = AlignmentScores(1, -9, -19, -1, -1)  # refiner spanning scores
    jump = -100
    rng = np.random.default_rng(0)
    B, Lq, Lr = 512, 200, 700
    queries, ref1, ref2 = make_inputs(rng, B, Lq, Lr)

    # host: production path (score + backtrace)
    host_aligner = GlobalJumpAligner(sc, jump)
    n_host = 32  # sample; extrapolate
    t0 = time.perf_counter()
    host_res = [host_aligner.align(queries[i].encode(), ref1[i].encode(),
                                   ref2[i].encode())
                for i in range(n_host)]
    host_dt = (time.perf_counter() - t0) / n_host

    # device: staged device arrays + best-of-5 dispatches (tunnel RPC
    # latency fluctuates ~10x; same methodology as bench.py)
    qb = [q.encode() for q in queries]
    r1b = [r.encode() for r in ref1]
    r2b = [r.encode() for r in ref2]

    import jax.numpy as jnp

    from manta_tpu.align.device_jumpscore import batched_jump_score

    def pad_to(seqs, n, fill):
        out = np.full((B, n), fill, np.int32)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(seqs):
            arr = np.frombuffer(s, np.uint8).astype(np.int32)
            out[i, :len(arr)] = arr
            lens[i] = len(arr)
        return out, lens

    q, ql = pad_to(qb, Lq, 1)
    r1a, r1l = pad_to(r1b, Lr, 2)
    r2a, r2l = pad_to(r2b, Lr, 2)
    staged = [jax.device_put(jnp.asarray(a))
              for a in (q, ql, r1a, r1l, r2a, r2l)]

    # device timing: fetch-synchronized K-iteration slope fit — the
    # tunnel's dispatch is fire-and-forget, so naive block_until_ready
    # timing measures RPC latency, not compute (see
    # benchmarks/device_timing.py for the method + its MFU anchor).
    # The production TPU path is the Pallas VMEM kernel; off TPU the
    # XLA scan form runs.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from functools import partial as _partial

    from device_timing import slope_time
    if jax.default_backend() == "tpu":
        from manta_tpu.align.pallas_jumpscore import (
            pallas_jump_score as kernel)
    else:
        kernel = batched_jump_score

    @_partial(jax.jit, static_argnames=("k",))
    def run_k(q, ql, r1, r1l, r2, r2l, k):
        def body(i, acc):
            s = kernel(q + (i & 1), ql, r1, r1l, r2, r2l,
                       sc.match, sc.mismatch, sc.open, sc.extend,
                       sc.off_edge, jump, Lq, Lr, Lr)
            return acc + s.sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    slope, _icept, _r2, _pts = slope_time(
        lambda k: run_k(*staged, k=k), ks=(1, 8, 32), reps=3)
    dev_dt = slope / B
    out = kernel(*staged, sc.match, sc.mismatch, sc.open, sc.extend,
                 sc.off_edge, jump, Lq, Lr, Lr)

    # parity check LAST and opt-in: one device->host transfer through
    # the tunnel can take minutes and permanently degrades subsequent
    # dispatches in this process to ~270 ms. Device/host score parity
    # is also asserted by tests/test_device_jumpscore.py.
    if os.environ.get("MANTA_TPU_BENCH_CHECK") == "1":
        dev = np.asarray(out)
        assert all(int(dev[i]) == host_res[i].score
                   for i in range(n_host)), "device/host score mismatch"

    cells = Lq * 2 * Lr
    for name, dt in (("host", host_dt), ("device", dev_dt)):
        print(json.dumps({
            "metric": f"jump_align_throughput_{name}",
            "contigs_per_s": round(1.0 / dt, 1),
            "gcells_per_s": round(cells / dt / 1e9, 2),
            "batch": B if name == "device" else 1,
        }))


if __name__ == "__main__":
    main()
