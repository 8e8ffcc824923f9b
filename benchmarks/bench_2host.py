"""2-host division-of-work accounting on the WGS workload.

Round 3 proved the 2-host distributed flow byte-identical to the
single-host run at 44.7 M-read scale but executed both hosts
sequentially on one box, so BASELINE.md's "graph-edges/s at N>=2
hosts" had no efficiency number. This records one: each phase runs in
its OWN subprocess (clean rusage separation — still sequential on one
box, stated openly), and the per-host CPU-seconds are compared against
a fresh single-host run of the same workload, so the division-of-work
overhead (extra CPU burned because the work was split: duplicate
planning, per-host stats re-derivation, shard merge) gets a measured
value.

Usage:
  python benchmarks/bench_2host.py --workload /tmp/wgs45 [--jobs 2]

Output: one JSON line with per-host cpu_s/edges/edges_per_cpu_s, the
single-host totals, and overhead_pct.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, re, resource, sys, time
sys.path.insert(0, {repo!r})
t0 = time.perf_counter()
{body}
wall = time.perf_counter() - t0
ru_s = resource.getrusage(resource.RUSAGE_SELF)
ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
cpu = ru_s.ru_utime + ru_s.ru_stime + ru_c.ru_utime + ru_c.ru_stime
peak = max(ru_s.ru_maxrss, ru_c.ru_maxrss) / 1e6
print("CHILD_JSON " + json.dumps(
    dict(wall_s=round(wall, 2), cpu_s=round(cpu, 1),
         peak_rss_gb=round(peak, 2), **extra)))
"""


def run_child(body: str) -> dict:
    code = _CHILD.format(repo=REPO, body=body)
    p = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-4000:] + p.stderr[-4000:])
        raise RuntimeError("child failed")
    m = re.search(r"CHILD_JSON (.*)", p.stdout)
    out = json.loads(m.group(1))
    # the workflow's verbose log lines go to stderr; the edge-count
    # parse below needs them
    out["log"] = p.stdout + p.stderr
    return out


def edges_from_log(run_dir: str) -> int:
    log = open(os.path.join(run_dir, "workspace",
                            "workflow_log.txt")).read()
    mm = re.findall(r"processed (\d+) graph edges", log)
    return int(mm[-1]) if mm else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", required=True,
                    help="prefix of wgs_workload outputs (.bam/.fa)")
    ap.add_argument("--jobs", type=int, default=2,
                    help="worker processes per host")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    bam, fa = args.workload + ".bam", args.workload + ".fa"
    assert os.path.exists(bam) and os.path.exists(fa)

    d2 = tempfile.mkdtemp(prefix="h2_")
    d1 = tempfile.mkdtemp(prefix="h1_")
    res = {"metric": "2host_accounting", "workload": args.workload,
           "jobs_per_host": args.jobs}

    # ---- 2-host flow: bootstrap (host 0), phase-2 per host, finalize
    boot = run_child(f"""
from manta_tpu.parallel.distributed import bootstrap_shared_run
bootstrap_shared_run([{bam!r}], [], {fa!r}, {d2!r},
                     n_jobs={args.jobs}, verbose=False)
extra = dict(stage="bootstrap")
""")
    res["bootstrap"] = {k: boot[k] for k in ("wall_s", "cpu_s",
                                             "peak_rss_gb")}

    per_host = []
    for h in (0, 1):
        r = run_child(f"""
from manta_tpu.parallel.distributed import run_host_phase2
run_host_phase2({h}, 2, [{bam!r}], [], {fa!r}, {d2!r},
                n_jobs={args.jobs}, verbose=True,
                use_device_scoring=False)
extra = dict(stage="host{h}")
""")
        m = re.findall(r"host processed (\d+) graph edges", r["log"])
        edges = int(m[-1]) if m else 0
        per_host.append({"host": h, "wall_s": r["wall_s"],
                         "cpu_s": r["cpu_s"], "edges": edges,
                         "edges_per_cpu_s": round(
                             edges / max(r["cpu_s"], 1e-9), 2)})
    res["hosts"] = per_host

    fin = run_child(f"""
from manta_tpu.parallel.distributed import finalize_phase2
finalize_phase2(2, [{bam!r}], [], {fa!r}, {d2!r},
                n_jobs={args.jobs}, verbose=False,
                use_device_scoring=False)
extra = dict(stage="finalize")
""")
    res["finalize"] = {k: fin[k] for k in ("wall_s", "cpu_s",
                                           "peak_rss_gb")}

    # ---- single-host baseline, same workload + jobs
    single = run_child(f"""
from manta_tpu.workflow.run import run_workflow
run_workflow([{bam!r}], [], {fa!r}, {d1!r}, n_jobs={args.jobs},
             verbose=False, use_device_scoring=False)
extra = dict(stage="single")
""")
    res["single_host"] = {
        "wall_s": single["wall_s"], "cpu_s": single["cpu_s"],
        "peak_rss_gb": single["peak_rss_gb"],
        "edges": edges_from_log(d1),
    }

    cpu_2host = (boot["cpu_s"] + sum(h["cpu_s"] for h in per_host)
                 + fin["cpu_s"])
    res["cpu_s_2host_total"] = round(cpu_2host, 1)
    res["overhead_pct"] = round(
        100.0 * (cpu_2host - single["cpu_s"]) / single["cpu_s"], 2)
    res["edges_total"] = sum(h["edges"] for h in per_host)

    # byte parity of the final VCFs (the round-3 guarantee, re-checked)
    import gzip

    def body(d):
        path = os.path.join(d, "results", "variants", "diploidSV.vcf.gz")
        with gzip.open(path, "rt") as f:
            return [ln for ln in f if not ln.startswith("#")]
    res["vcf_parity"] = body(d1) == body(d2)

    if not args.keep:
        import shutil
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
    outdir = os.path.join(REPO, "benchmarks", "results")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "2host_accounting.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
