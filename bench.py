"""Headline benchmark: end-to-end phase-2 throughput (graph edges/s).

Runs the full production pipeline — candidate generation, assembly,
contig jump alignment, and scoring — over the tiled HCC1954 stress
workload (benchmarks/stress_workload.py) at full host parallelism, and
reports edges/s of the candidate-generation phase, one of BASELINE.md's
efficiency metrics. This is honest wall-clock through the real code
path (native + vectorized host work, plus device kernels when
--device-scoring resolves on), not a kernel microbenchmark.

Why not a device kernel number: on this machine the TPU is attached
through a tunnel whose dispatch is fire-and-forget — jax
block_until_ready returns in ~0.1 ms regardless of work — so any
kernel timing here measures RPC latency, not compute (an earlier round
reported 25.1 Tterms/s "measured" against a ~20 Tterms/s analytic v5e
ceiling; that number was a tunnel artifact, see
docs/developerGuide.md). Kernel envelopes are assessed analytically
and with benchmarks/bench_jumpalign.py on co-located hardware.

Baseline derivation: the reference calls a 50x NA12878 WGS in <20 min
on 20 physical cores (BASELINE.md). A WGS breakend graph has on the
order of 7e5 edges (methods.tex describes ~1e5-1e6 across samples), and
the reference spends roughly half the run in phase 2, giving
~7e5 edges / 600 s ~= 1170 edges/s on 20 cores ~= 58 edges/s per
2 cores. vs_baseline scales the measured figure against that per-core-
normalized estimate on this host's core count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_EDGES_PER_S_PER_CORE = 58.0 / 2  # see module docstring


def main():
    sys.path.insert(0, REPO)
    n_cores = os.cpu_count() or 1

    bam, fa = "/tmp/bench_stress.bam", "/tmp/bench_stress.fa"
    if not (os.path.exists(bam) and os.path.exists(fa)):
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "benchmarks", "stress_workload.py"),
             "--tiles", "32", "--out", "/tmp/bench_stress"],
            check=True, capture_output=True)

    from manta_tpu.workflow.run import run_workflow
    run_dir = tempfile.mkdtemp(prefix="bench_")
    t0 = time.perf_counter()
    run_workflow([], [bam], fa, run_dir, is_exome=True,
                 n_jobs=n_cores, verbose=False)
    wall = time.perf_counter() - t0

    log = open(os.path.join(run_dir, "workspace",
                            "workflow_log.txt")).read()
    m = re.search(r"processed (\d+) graph edges", log)
    n_edges = int(m.group(1)) if m else 0
    tsv = open(os.path.join(run_dir, "results", "stats",
                            "svCandidateGenerationStats.tsv")).read()
    mt = re.search(r"SVGenTotalHours\t([0-9.]+)h wall", tsv)
    phase2_s = float(mt.group(1)) * 3600.0 if mt else wall
    shutil.rmtree(run_dir, ignore_errors=True)

    edges_per_s = n_edges / max(phase2_s, 1e-9)
    baseline = BASELINE_EDGES_PER_S_PER_CORE * n_cores
    print(json.dumps({
        "metric": "phase2_graph_edges_per_s",
        "value": round(edges_per_s, 2),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / baseline, 3),
        "edges": n_edges,
        "phase2_s": round(phase2_s, 2),
        "e2e_s": round(wall, 2),
        "cores": n_cores,
    }))


if __name__ == "__main__":
    main()
