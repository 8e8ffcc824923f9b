"""TPU end-to-end A/B on the high-spanning-contig shape (round-5
verdict item 2: one measured e2e shape where the chip wins).

Workload: stress tiles at depth_frac=0.2 with SA evidence stripped —
many distinct deep-somatic junctions whose phase-2 cost concentrates
in jump-contig alignment (3 contigs/junction; the host fallback
full-aligns all three with traceback, the device path scores all on
chip and tracebacks only the winner).

Per tile count: run the workflow host-only, then with
--device-scoring jump (MANTA_TPU_EDGE_CHUNK amortizes the tunnel's
~30 ms per-dispatch RPC intercept; a second device run measures the
warm-compile steady state a co-located chip lives in). Reports e2e
and phase-2 walls, asserts VCF parity between modes, and writes the
break-even curve to benchmarks/results/tpu_e2e_<tag>.json.

Usage:
  python benchmarks/bench_tpu_e2e.py [--tiles 512 2048] [--chunk 256]
      [--reps 2] [--tag r05]
"""

from __future__ import annotations

import argparse
import datetime
import gzip
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_log(run_dir):
    log = open(os.path.join(run_dir, "workspace",
                            "workflow_log.txt")).read()

    def stamp(pattern):
        mm = re.search(rf"\[([0-9T:.-]+)\] {pattern}", log)
        return (datetime.datetime.fromisoformat(mm.group(1))
                if mm else None)

    p2 = stamp(r"generating and scoring SV candidates")
    done = stamp(r"processed \d+ graph edges")
    m = re.search(r"processed (\d+) graph edges", log)
    return {
        "phase2_s": round((done - p2).total_seconds(), 2)
        if p2 and done else None,
        "edges": int(m.group(1)) if m else 0,
    }


def vcf_body(run_dir, name="tumorSV.vcf.gz"):
    with gzip.open(os.path.join(run_dir, "results", "variants", name),
                   "rt") as f:
        return [l for l in f if not l.startswith("#")]


def run_one(bam, fa, run_dir, device, chunk, jobs):
    shutil.rmtree(run_dir, ignore_errors=True)
    env = dict(os.environ)
    env["MANTA_TPU_EDGE_CHUNK"] = str(chunk)
    cmd = [sys.executable, "-m", "manta_tpu.workflow.run",
           "--tumor-bam", bam, "--reference", fa, "--run-dir", run_dir,
           "--exome", "-j", str(jobs)]
    if device:
        cmd += ["--device-scoring", "jump"]
    else:
        cmd += ["--device-scoring", "off"]
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    assert r.returncode == 0, r.stderr[-3000:]
    rec = parse_log(run_dir)
    rec["wall_s"] = round(wall, 2)
    # per-process device dispatch exit report, if any
    m = re.findall(r"device-dispatch pid=\d+: (\d+) calls, (\d+) jobs,"
                   r" \d+ padded rows, ([0-9.]+)s total,"
                   r" first ([0-9.]+)s",
                   r.stderr + r.stdout)
    if m:
        rec["device_calls"] = sum(int(x[0]) for x in m)
        rec["device_jobs"] = sum(int(x[1]) for x in m)
        rec["device_total_s"] = round(sum(float(x[2]) for x in m), 2)
        rec["device_first_s"] = round(max(float(x[3]) for x in m), 2)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, nargs="+", default=[512, 2048])
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--jobs", type=int, default=1)
    ap.add_argument("--reps", type=int, default=2,
                    help="device-mode repeats (last = warm steady state)")
    ap.add_argument("--tag", default="r05")
    args = ap.parse_args()

    import stress_workload as sw
    curve = []
    for tiles in args.tiles:
        out = f"/tmp/hspan{tiles}"
        bam, fa, total = sw.generate(tiles, out, depth_frac=0.2,
                                     strip_sa=True)
        host = run_one(bam, fa, out + "_host", False, args.chunk,
                       args.jobs)
        devs = []
        for rep in range(args.reps):
            devs.append(run_one(bam, fa, out + f"_dev{rep}", True,
                                args.chunk, args.jobs))
        # parity: identical variant bodies host vs every device run
        hb = vcf_body(out + "_host")
        for rep in range(args.reps):
            assert vcf_body(out + f"_dev{rep}") == hb, \
                f"device VCF diverged at tiles={tiles} rep={rep}"
        dev = devs[-1]
        point = {
            "tiles": tiles, "reads": total,
            "host": host, "device_runs": devs,
            "device_warm": dev,
            "phase2_speedup_warm": round(
                host["phase2_s"] / dev["phase2_s"], 3)
            if host["phase2_s"] and dev["phase2_s"] else None,
            "e2e_speedup_warm": round(dev and host["wall_s"]
                                      / dev["wall_s"], 3),
            "vcf_parity": True,
        }
        curve.append(point)
        print(json.dumps(point))
        for rep in range(args.reps):
            shutil.rmtree(out + f"_dev{rep}", ignore_errors=True)
        shutil.rmtree(out + "_host", ignore_errors=True)
        for suf in (".bam", ".bam.bai", ".fa", ".fa.fai"):
            if os.path.exists(out + suf):
                os.remove(out + suf)

    res = {
        "metric": "tpu_e2e_highspan_ab",
        "shape": "stress tiles, depth_frac=0.2, strip_sa (3 jump "
                 "contigs/junction, pair-only evidence)",
        "edge_chunk": args.chunk,
        "jobs": args.jobs,
        "curve": curve,
        "measured_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
    }
    path = os.path.join(REPO, "benchmarks", "results",
                        f"tpu_e2e_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "curve"}))


if __name__ == "__main__":
    main()
