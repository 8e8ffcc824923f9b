"""Headline kernel benchmark: batched split-read scoring throughput.

Measures the phase-2 scoring hot loop — the sliding basecall-likelihood
scan of reads across breakpoint junctions (reference:
GenerateSVCandidates/SplitReadAlignment.cpp) — using the MXU
(matmul/Toeplitz) formulation that production ships behind
--device-scoring mxu (manta_tpu/align/device_splitscore_mxu.py):
junctions share their target across reads, factoring the scan into a
(R x 5L) @ (5L x S) matmul per junction batch, putting the O(R*S*L)
term evaluation on the systolic array. The exact (bit-identical)
gather kernel remains the production default and is benchmarked by
benchmarks/bench_jumpalign.py-style harnesses; earlier rounds reported
it here under the metric name "splitread_score_throughput".

Baseline: the reference evaluates one (read, scan-position) base term
per scalar loop iteration. BASELINE.md's headline config is 20 physical
cores (dual Xeon E5-2680 v2); a generous estimate for the reference's
C++ inner loop is ~1e9 base-terms/s/core => 2e10 base-terms/s for the
full 20-core baseline machine. vs_baseline is device throughput over
that whole-machine figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_TERMS_PER_S = 2.0e10  # 20 cores x ~1e9 scalar base-terms/s


def main():
    import jax
    import jax.numpy as jnp

    from manta_tpu.align.device_splitscore import make_luts
    from manta_tpu.align.device_splitscore_mxu import junction_split_score

    # production-shaped large wave: many junctions x reads-per-junction
    G, R, L, T = 512, 64, 150, 500
    n_scan = T
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    targets = bases[rng.integers(0, 4, (G, T))].copy()
    idx = rng.integers(0, T - L, (G, R))
    reads = np.empty((G, R, L), np.uint8)
    for g in range(G):
        for r in range(R):
            reads[g, r] = targets[g, idx[g, r]:idx[g, r] + L]
    quals = rng.integers(10, 40, (G, R, L)).astype(np.uint8)
    bp_beg = rng.integers(60, T - 60, G).astype(np.int32)
    bp_end = (bp_beg + rng.integers(0, 5, G)).astype(np.int32)
    read_len = np.full((G, R), L, np.int32)
    target_len = np.full(G, T, np.int32)
    s0 = np.zeros(G, np.int32)
    lut_m, lut_x = make_luts(0.0)

    # one large dispatch per measurement: the batch amortizes the
    # tunnel RPC latency (which fluctuates ~10x) and, unlike an in-jit
    # repeat loop, a single call with all outputs consumed cannot be
    # collapsed by compiler loop-invariant motion. Device arrays are
    # staged once so host->device transfer is excluded from the timing.
    dev_args = [jax.device_put(jnp.asarray(a)) for a in
                (reads, quals, targets, s0, bp_beg, bp_end, read_len,
                 target_len)]

    def run():
        best, best_pos = junction_split_score(
            *dev_args, 50, lut_m, lut_x, n_scan=n_scan)
        jax.block_until_ready((best, best_pos))
        return best, best_pos

    run()  # warmup + compile
    best_dt = None
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(4):
            run()
        dt = (time.perf_counter() - t0) / 4
        if best_dt is None or dt < best_dt:
            best_dt = dt
    dt = best_dt

    terms = G * R * n_scan * L  # base-terms evaluated per launch
    terms_per_s = terms / dt
    print(json.dumps({
        "metric": "splitread_mxu_score_throughput",
        "value": round(terms_per_s / 1e9, 3),
        "unit": "Gterms/s",
        "vs_baseline": round(terms_per_s / BASELINE_TERMS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
