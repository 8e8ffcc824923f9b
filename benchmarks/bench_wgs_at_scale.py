"""At-scale WGS measurement: run the workload end-to-end (default
config), score against planted truth, extract the phase breakdown and
serial tail from the instrumented workflow log, and write the
measured-run artifact that bench.py's headline cites
(benchmarks/results/wgs_measured.json).

Usage:
  python benchmarks/bench_wgs_at_scale.py --workload /tmp/wgs420 \
      [--jobs 2] [--device-scoring off|jump] [--tag r04]

The reference baseline being chased: NA12878 50x (840 M reads),
< 20 min on 20 physical cores, 2.35 GB peak RSS
(/root/reference/docs/userGuide/README.md:474-484).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import resource
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WGS_READS_M = 840.0
BASELINE_WALL_MIN = 20.0
BASELINE_CORES = 20


class RssSampler:
    """Samples the whole process tree's memory every interval,
    splitting anonymous from file-backed RSS (/proc/<pid>/status
    RssAnon / RssFile). ru_maxrss conflates the two: this workflow
    mmaps the input BAM, so touched CLEAN file pages — page cache the
    kernel can drop at any moment — inflate RSS far beyond the real
    (anonymous) footprint. The reference's 2.35 GB figure is
    read()-based and contains no such pages, so the honest comparison
    is peak SUM of RssAnon across live processes."""

    def __init__(self, interval=3.0):
        import threading
        self.interval = interval
        self.peak_anon = 0
        self.peak_file = 0
        self.peak_total = 0
        # largest single-process anonymous RSS ever seen, with the
        # process role (argv tail; forked workers share argv, so the
        # elapsed-seconds stamp is what locates the owning stage in
        # the ms-stamped workflow log) and the tree-sum peak's stamp
        self.peak_proc_anon = 0
        self.peak_proc_role = ""
        self.peak_proc_at_s = 0.0
        self.peak_anon_at_s = 0.0
        # RssAnon double-counts COW pages shared between the workflow
        # parent and its forked workers; Pss_Anon (smaps_rollup)
        # apportions shared pages, so its tree sum is the true unique
        # anonymous footprint — the number comparable to the
        # reference's reported peak
        self.peak_pss_anon = 0
        self.trace = []          # (t_s, anon_sum, pss_anon_sum, nproc)
        self._t0 = time.perf_counter()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _tree(self):
        me = os.getpid()
        kids = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                kids.setdefault(int(parts[1]), []).append(int(pid))
            except OSError:
                continue
        out, queue = [], [me]
        while queue:
            p = queue.pop()
            out.append(p)
            queue.extend(kids.get(p, []))
        return out

    def _run(self):
        while not self._stop.is_set():
            anon = filp = tot = pss = nproc = 0
            for pid in self._tree():
                try:
                    with open(f"/proc/{pid}/smaps_rollup") as f:
                        mm = re.search(r"Pss_Anon:\s+(\d+) kB",
                                       f.read())
                    if mm:
                        pss += int(mm.group(1)) * 1024
                except OSError:
                    pass
                try:
                    with open(f"/proc/{pid}/status") as f:
                        s = f.read()
                    p_anon = 0
                    for key, tgt in (("RssAnon:", "a"), ("RssFile:", "f"),
                                     ("VmRSS:", "t")):
                        m = re.search(rf"{key}\s+(\d+) kB", s)
                        if m:
                            v = int(m.group(1)) * 1024
                            if tgt == "a":
                                anon += v
                                p_anon = v
                            elif tgt == "f":
                                filp += v
                            else:
                                tot += v
                    if p_anon > self.peak_proc_anon:
                        try:
                            with open(f"/proc/{pid}/cmdline") as f:
                                argv = f.read().split("\0")
                        except OSError:
                            argv = []
                        self.peak_proc_anon = p_anon
                        self.peak_proc_role = " ".join(
                            a for a in argv if a)[-120:]
                        self.peak_proc_at_s = (time.perf_counter()
                                               - self._t0)
                except OSError:
                    continue
                nproc += 1
            if anon > self.peak_anon:
                self.peak_anon_at_s = time.perf_counter() - self._t0
            self.peak_anon = max(self.peak_anon, anon)
            self.peak_file = max(self.peak_file, filp)
            self.peak_total = max(self.peak_total, tot)
            self.peak_pss_anon = max(self.peak_pss_anon, pss)
            self.trace.append((round(time.perf_counter() - self._t0, 1),
                               anon, pss, nproc))
            self._stop.wait(self.interval)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._thread.join(timeout=5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", required=True)
    ap.add_argument("--jobs", type=int, default=0, help="0 = all cores")
    ap.add_argument("--device-scoring", default="off",
                    choices=("off", "jump", "exact", "mxu"))
    ap.add_argument("--reads-m", type=float, default=None,
                    help="read count in millions (from the generator "
                         "log); parsed from <workload>.gen.log or "
                         "counted if omitted")
    ap.add_argument("--tag", default="")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--mode", default="germline")
    args = ap.parse_args()

    bam, fa = args.workload + ".bam", args.workload + ".fa"
    reads_m = args.reads_m
    if reads_m is None:
        for cand in (args.workload + ".gen.log",):
            if os.path.exists(cand):
                m = re.findall(r"wrote .* \((\d+) reads",
                               open(cand).read())
                if m:
                    reads_m = int(m[-1]) / 1e6
    assert reads_m, "pass --reads-m (generator log not found)"

    n_jobs = args.jobs or (os.cpu_count() or 1)
    run_dir = args.run_dir or tempfile.mkdtemp(prefix="atscale_")

    from manta_tpu.workflow.run import run_workflow
    r0s = resource.getrusage(resource.RUSAGE_SELF)
    r0c = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.perf_counter()
    with RssSampler() as rss:
        run_workflow([bam], [], fa, run_dir, n_jobs=n_jobs, verbose=True,
                     use_device_scoring=(False
                                         if args.device_scoring == "off"
                                         else args.device_scoring))
    wall = time.perf_counter() - t0
    r1s = resource.getrusage(resource.RUSAGE_SELF)
    r1c = resource.getrusage(resource.RUSAGE_CHILDREN)
    cpu_s = (r1s.ru_utime - r0s.ru_utime + r1s.ru_stime - r0s.ru_stime
             + r1c.ru_utime - r0c.ru_utime + r1c.ru_stime - r0c.ru_stime)
    peak_gb = max(r1s.ru_maxrss, r1c.ru_maxrss) / 1e6

    log = open(os.path.join(run_dir, "workspace",
                            "workflow_log.txt")).read()

    def stamp(pattern):
        mm = re.search(rf"\[([0-9T:.-]+)\] {pattern}", log)
        return (datetime.datetime.fromisoformat(mm.group(1))
                if mm else None)

    stamps = {
        "start": stamp(r"estimating (?:alignment|fragment)") or
        stamp(r".*"),
        "depth": stamp(r"estimating chromosome depth"),
        "graph": stamp(r"building breakend graph") or
        stamp(r"scanning genome"),
        "phase2": stamp(r"generating and scoring SV candidates"),
        "done": stamp(r"processed \d+ graph edges"),
    }
    m = re.search(r"processed (\d+) graph edges", log)
    edges = int(m.group(1)) if m else 0
    phase2_s = ((stamps["done"] - stamps["phase2"]).total_seconds()
                if stamps["done"] and stamps["phase2"] else None)

    tail = 0.0
    for pat in (r"merged \d+ graph parts in ([0-9.]+)s",
                r"finalized in ([0-9.]+)s, saved in ([0-9.]+)s",
                r"loaded for phase 2 in ([0-9.]+)s",
                r"bin shards in ([0-9.]+)s",
                r"final VCFs in ([0-9.]+)s"):
        for mm in re.finditer(pat, log):
            tail += sum(float(g) for g in mm.groups())

    cpu_per_mread = (cpu_s - tail) / reads_m
    tail_per_mread = tail / reads_m
    proj_min = (cpu_per_mread * WGS_READS_M / BASELINE_CORES
                + tail_per_mread * WGS_READS_M) / 60.0

    out = {
        "metric": "wgs_at_scale_measured",
        "tag": args.tag,
        "workload": args.workload,
        "reads_m": round(reads_m, 2),
        "pct_of_840m": round(100 * reads_m / WGS_READS_M, 1),
        "cores": n_jobs,
        "device_scoring": args.device_scoring,
        "wall_s": round(wall, 1),
        "wall_min": round(wall / 60.0, 2),
        "cpu_s": round(cpu_s, 1),
        "peak_rss_gb": round(peak_gb, 2),
        "peak_anon_gb": round(rss.peak_anon / 1e9, 2),
        "peak_pss_anon_gb": round(rss.peak_pss_anon / 1e9, 2),
        "peak_anon_at_s": round(rss.peak_anon_at_s, 1),
        "peak_filepages_gb": round(rss.peak_file / 1e9, 2),
        "peak_tree_rss_gb": round(rss.peak_total / 1e9, 2),
        "peak_proc_anon_gb": round(rss.peak_proc_anon / 1e9, 2),
        "peak_proc_at_s": round(rss.peak_proc_at_s, 1),
        "peak_proc_role": rss.peak_proc_role,
        "edges": edges,
        "phase2_s": round(phase2_s, 1) if phase2_s else None,
        "edges_per_s": (round(edges / phase2_s, 2)
                        if phase2_s else None),
        "serial_tail_s": round(tail, 2),
        "cpu_s_per_mread": round(cpu_per_mread, 2),
        "wgs840_20core_projection_min": round(proj_min, 2),
        "vs_baseline": round(BASELINE_WALL_MIN / proj_min, 3),
        "run_dir": run_dir,
        "measured_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
    }
    os.makedirs(os.path.join(REPO, "benchmarks", "results"),
                exist_ok=True)
    name = f"wgs_measured{('_' + args.tag) if args.tag else ''}.json"
    with open(os.path.join(REPO, "benchmarks", "results", name),
              "w") as f:
        json.dump(out, f, indent=1)
    with open(os.path.join(REPO, "benchmarks", "results",
                           name.replace(".json", ".memtrace.json")),
              "w") as f:
        json.dump({"columns": ["t_s", "rss_anon_sum", "pss_anon_sum",
                               "nproc"], "rows": rss.trace}, f)
    print(json.dumps(out))
    if not args.keep and args.run_dir is None:
        import shutil
        shutil.rmtree(run_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
