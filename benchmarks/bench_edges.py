"""Phase-2 throughput: graph-edges/s through candidate generation,
assembly refinement, and scoring.

One of the BASELINE.md efficiency metrics ("graph-edges/s"). Times the
full workflow over the tiled stress BAM and reports edges processed per
second of candidate-generation wall time (the workflow's own phase
timing), plus the end-to-end figure.

Usage:
    python benchmarks/stress_workload.py --tiles 32 --out /tmp/stress
    python benchmarks/bench_edges.py --bam /tmp/stress.bam \
        --fasta /tmp/stress.fa [-j N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bam", default="/tmp/stress.bam")
    ap.add_argument("--fasta", default="/tmp/stress.fa")
    ap.add_argument("-j", "--jobs", type=int, default=1)
    args = ap.parse_args()

    from manta_tpu.workflow.run import run_workflow

    run_dir = tempfile.mkdtemp(prefix="bench_edges_")
    t0 = time.perf_counter()
    run_workflow([], [args.bam], args.fasta, run_dir,
                 is_exome=True, n_jobs=args.jobs, verbose=False)
    wall = time.perf_counter() - t0

    # edge count from the workflow log; phase timing from the edge
    # stats tracker's own wall measurement (SVGenTotalHours), which has
    # much finer resolution than the 1 s log timestamps
    log = open(os.path.join(run_dir, "workspace",
                            "workflow_log.txt")).read()
    m = re.search(r"processed (\d+) graph edges", log)
    n_edges = int(m.group(1)) if m else 0
    tsv = open(os.path.join(run_dir, "results", "stats",
                            "svCandidateGenerationStats.tsv")).read()
    mt = re.search(r"SVGenTotalHours\t([0-9.]+)h wall", tsv)
    phase2_s = float(mt.group(1)) * 3600.0 if mt else wall

    print(json.dumps({
        "metric": "graph_edges_per_s",
        "value": round(n_edges / max(phase2_s, 1e-9), 2),
        "unit": "edges/s",
        "edges": n_edges,
        "phase2_s": round(phase2_s, 2),
        "e2e_s": round(wall, 2),
        "jobs": args.jobs,
    }))
    shutil.rmtree(run_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
