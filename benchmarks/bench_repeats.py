"""Adversarial repeat benchmark at statistical power (round-5 verdict
item 5): >=100 repeat-proximal planted SVs across >=3 seeds.

Per seed: generate a --repeats WGS workload with --repeat-anchors SV
junctions planted inside satellite arrays (plus the read-level
mapper-confusion model), run the germline workflow, and score against
truth split by repeat proximity. Aggregates recall with Wilson 95%
intervals and the complexity-abort telemetry, and writes
benchmarks/results/repeats_check_r05.json.

Usage:
  python benchmarks/bench_repeats.py [--seeds 3 5 7] [--anchors 40]
      [--chroms 8] [--mb 16] [--jobs 2] [--keep]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wilson(k: int, n: int, z: float = 1.96):
    if n == 0:
        return (0.0, 0.0, 1.0)
    p = k / n
    d = 1 + z * z / n
    c = (p + z * z / (2 * n)) / d
    h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / d
    return (round(p, 4), round(max(0.0, c - h), 4),
            round(min(1.0, c + h), 4))


def run_seed(seed: int, args) -> dict:
    out = f"/tmp/reps_s{seed}"
    gen = [sys.executable, os.path.join(REPO, "benchmarks",
                                        "wgs_workload.py"),
           "--out", out, "--chroms", str(args.chroms), "--mb",
           str(args.mb), "--depth", "35", "--seed", str(seed),
           "--repeats", "--repeat-anchors", str(args.anchors),
           "--jobs", str(args.jobs)]
    t0 = time.time()
    subprocess.run(gen, check=True, capture_output=True, text=True)
    chk = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks",
                                      "wgs_workload.py"),
         "--out", out, "--check", "--jobs", str(args.jobs)],
        check=True, capture_output=True, text=True)
    rec = json.loads(chk.stdout.strip().splitlines()[-1])
    rec["seed"] = seed
    rec["gen_plus_check_s"] = round(time.time() - t0, 1)
    if not args.keep:
        run_dir = rec.get("run_dir")
        if run_dir and os.path.isdir(run_dir):
            shutil.rmtree(run_dir, ignore_errors=True)
        for suf in (".bam", ".bam.bai", ".fa", ".fa.fai", ".truth.tsv",
                    ".repeats.tsv", ".gen.log"):
            p = out + suf
            if os.path.exists(p):
                os.remove(p)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[3, 5, 7])
    ap.add_argument("--anchors", type=int, default=40)
    ap.add_argument("--chroms", type=int, default=8)
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--tag", default="r05")
    args = ap.parse_args()

    seeds = []
    rep_k = rep_n = clean_k = clean_n = fp = 0
    ins_k = ins_n = edge_k = edge_n = 0
    aborts = 0
    for seed in args.seeds:
        rec = run_seed(seed, args)
        print(json.dumps(rec))
        seeds.append(rec)
        n_rep = rec["truth_in_repeat"]
        rep_n += n_rep
        rep_k += round(rec["recall_in_repeat"] * n_rep)
        n_clean = rec["truth_n"] - n_rep
        clean_n += n_clean
        clean_k += round(rec["recall_clean"] * n_clean)
        ins_n += rec.get("truth_inside_tandem", 0)
        ins_k += round(rec.get("recall_inside_tandem", 0)
                       * rec.get("truth_inside_tandem", 0))
        edge_n += rec.get("truth_repeat_edge", 0)
        edge_k += round(rec.get("recall_repeat_edge", 0)
                        * rec.get("truth_repeat_edge", 0))
        fp += rec["fp_records"]
        aborts += int(bool(rec.get("graph_abort_count_hit"))
                      or bool(rec.get("graph_abort_density_hit")))

    p, lo, hi = wilson(rep_k, rep_n)
    cp, clo, chi = wilson(clean_k, clean_n)
    out = {
        "metric": "repeats_recall_powered",
        "seeds": args.seeds,
        "anchors_per_seed": args.anchors,
        "repeat_proximal": {"found": rep_k, "n": rep_n,
                            "recall": p, "ci95": [lo, hi]},
        "inside_tandem": {"found": ins_k, "n": ins_n,
                          "recall": wilson(ins_k, ins_n)[0],
                          "ci95": list(wilson(ins_k, ins_n)[1:])},
        "repeat_edge": {"found": edge_k, "n": edge_n,
                        "recall": wilson(edge_k, edge_n)[0],
                        "ci95": list(wilson(edge_k, edge_n)[1:])},
        "clean": {"found": clean_k, "n": clean_n,
                  "recall": cp, "ci95": [clo, chi]},
        "fp_records_total": fp,
        "runs_with_complexity_abort": aborts,
        "per_seed": seeds,
    }
    res = os.path.join(REPO, "benchmarks", "results",
                       f"repeats_check_{args.tag}.json")
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_seed"}))


if __name__ == "__main__":
    main()
