"""Multi-host phase-1 scale-out: two simulated hosts building disjoint
group-graph shares into a shared directory must merge to the identical
graph (and identical final VCF inputs) as a single host — partitioning
is a pure function of group index, merge order is group order."""

import json
import os

import numpy as np
import pytest

from manta_tpu.parallel import distributed as dist


@pytest.fixture(scope="module")
def stats_path(tmp_path_factory, normal_bam, tumor_bam):
    from manta_tpu.core.fragstats import (
        ReadGroupStatsSet, extract_read_group_stats,
    )
    p = str(tmp_path_factory.mktemp("dist") / "alignmentStats.json")
    ss = ReadGroupStatsSet()
    for b in (normal_bam, tumor_bam):
        ss.set_stats(b, extract_read_group_stats(b))
    ss.save(p)
    return p


def _graph_fingerprint(locus_set):
    out = []
    for locus in locus_set.loci:
        if locus.empty():
            continue
        nodes = tuple(
            (n.tid, n.beg, n.end, n.ev_beg, n.ev_end,
             tuple(sorted(n.edges.items())))
            for n in locus.nodes)
        out.append(nodes)
    return out


def test_two_hosts_match_single_host(tmp_path, demo_fasta, normal_bam,
                                     tumor_bam, stats_path):
    bams = [normal_bam, tumor_bam]
    is_tumor = [False, True]
    groups = dist.plan_phase1(bams, demo_fasta)
    assert len(groups) >= 2

    # every group is owned by exactly one host
    own = [dist.host_items(len(groups), h, 2) for h in range(2)]
    assert sorted(own[0] + own[1]) == list(range(len(groups)))

    d2 = str(tmp_path / "two_hosts")
    for h in range(2):
        dist.run_host_phase1(h, 2, d2, bams, is_tumor, demo_fasta,
                             stats_path)
        dist.barrier(d2, "phase1", h, h + 1)  # h hosts so far have run
    merged2 = dist.finalize_phase1(d2, len(groups))

    d1 = str(tmp_path / "one_host")
    dist.run_host_phase1(0, 1, d1, bams, is_tumor, demo_fasta, stats_path)
    merged1 = dist.finalize_phase1(d1, len(groups))

    assert _graph_fingerprint(merged2) == _graph_fingerprint(merged1)
    assert merged2.non_empty_size() > 0

    # manifests record disjoint ownership
    g2 = os.path.join(d2, "graphParts")
    manifests = [json.load(open(os.path.join(g2, f)))
                 for f in sorted(os.listdir(g2)) if f.startswith("manifest")]
    got = sorted(gi for m in manifests for gi in m["groups"])
    assert got == list(range(len(groups)))


def test_barrier_times_out(tmp_path):
    with pytest.raises(TimeoutError):
        dist.barrier(str(tmp_path), "p", 0, 2, poll_s=0.05, timeout_s=0.3)


def test_init_runtime_single_process_noop():
    dist.init_runtime(num_processes=1)  # must not require a coordinator


def test_phase2_two_hosts_match_single_host(tmp_path, demo_fasta,
                                            normal_bam, tumor_bam):
    """Full multi-host pipeline parity: host-0 bootstrap (phases 0-1 on
    the shared run dir), both hosts processing their global edge-bin
    slices, then the host-0 finalize merge — final VCFs must be
    byte-identical to a plain single-host run (and hence to the demo
    oracle)."""
    import gzip

    kw = dict(is_exome=True, verbose=False)
    shared = str(tmp_path / "shared_run")
    dist.bootstrap_shared_run([normal_bam], [tumor_bam], demo_fasta,
                              shared, **kw)
    assert os.path.exists(os.path.join(shared, "workspace",
                                       "svLocusGraph.npz"))
    for h in range(2):
        dist.run_host_phase2(h, 2, [normal_bam], [tumor_bam], demo_fasta,
                             shared, **kw)
        dist.barrier(shared, "phase2", h, h + 1)
    dist.finalize_phase2(2, [normal_bam], [tumor_bam], demo_fasta,
                         shared, **kw)

    single = str(tmp_path / "single_run")
    from manta_tpu.workflow.run import run_workflow
    run_workflow([normal_bam], [tumor_bam], demo_fasta, single, **kw)

    def records(run, name):
        with gzip.open(f"{run}/results/variants/{name}", "rt") as f:
            return [l for l in f if not l.startswith("#")]

    for name in ("candidateSV.vcf.gz", "diploidSV.vcf.gz",
                 "somaticSV.vcf.gz"):
        assert records(shared, name) == records(single, name), name


def test_two_concurrent_coordinated_processes(tmp_path, demo_fasta,
                                              normal_bam, tumor_bam,
                                              stats_path):
    """TWO genuinely concurrent jax.distributed-coordinated processes
    (localhost coordinator, CPU backend): each joins the runtime, runs
    a cross-process psum, then drives its host-sharded share of phase 1
    AND phase 2 concurrently — synchronized only by jax.distributed and
    the file-sentinel barriers. Final VCFs must be byte-identical to a
    plain single-host run (and the somatic VCF to the demo oracle)."""
    import gzip
    import socket
    import subprocess
    import sys

    work = str(tmp_path / "work")
    os.makedirs(work)

    # host-0 bootstrap of the shared phase-2 run dir (stats + depth +
    # merged graph), as a pod job would before the per-host fan-out
    shared_run = os.path.join(work, "shared_run")
    dist.bootstrap_shared_run([normal_bam], [tumor_bam], demo_fasta,
                              shared_run, is_exome=True, verbose=False)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "dist2proc_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(h), str(port), work,
             demo_fasta, normal_bam, tumor_bam, stats_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for h in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    # the collective really spanned both processes
    for h in range(2):
        rec = json.load(open(os.path.join(work, f"psum.host{h}.json")))
        assert rec["processes"] == 2
        assert rec["global_devices"] >= 2

    # concurrent host-sharded phase 1 == single-host graph
    from manta_tpu.graph.locusgraph import SVLocusSet
    merged = SVLocusSet.load(os.path.join(work, "merged_graph.npz"))
    d1 = str(tmp_path / "one_host")
    bams = [normal_bam, tumor_bam]
    dist.run_host_phase1(0, 1, d1, bams, [False, True], demo_fasta,
                         stats_path)
    groups = dist.plan_phase1(bams, demo_fasta)
    single_graph = dist.finalize_phase1(d1, len(groups))
    assert _graph_fingerprint(merged) == _graph_fingerprint(single_graph)

    # concurrent phase 2 == single-host VCFs
    single = str(tmp_path / "single_run")
    from manta_tpu.workflow.run import run_workflow
    run_workflow([normal_bam], [tumor_bam], demo_fasta, single,
                 is_exome=True, verbose=False)

    def records(run, name):
        with gzip.open(f"{run}/results/variants/{name}", "rt") as f:
            return [l for l in f if not l.startswith("#")]

    for name in ("candidateSV.vcf.gz", "diploidSV.vcf.gz",
                 "somaticSV.vcf.gz"):
        assert records(shared_run, name) == records(single, name), name
