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
