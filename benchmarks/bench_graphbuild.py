"""Phase-1 graph-build throughput: reads/s through scan + native merge.

One of the BASELINE.md efficiency metrics ("reads/s (graph build)").
Times estimate_sv_loci alone — fragment-stats estimation, read
ingestion, evidence scanning, and breakend-graph construction — over
the tiled stress BAM (benchmarks/stress_workload.py tiles the demo
junction neighborhoods so the evidence density is realistic).

Usage:
    python benchmarks/stress_workload.py --tiles 32 --out /tmp/stress
    python benchmarks/bench_graphbuild.py --bam /tmp/stress.bam \
        --fasta /tmp/stress.fa
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bam", default="/tmp/stress.bam")
    ap.add_argument("--fasta", default="/tmp/stress.fa")
    ap.add_argument("--scan-size-mb", type=int, default=12)
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="fork workers (host-level reads/s)")
    args = ap.parse_args()

    from manta_tpu.core.fragstats import extract_read_group_stats
    from manta_tpu.graph.finder import estimate_sv_loci
    from manta_tpu.graph.locusgraph import SVLocusSetOptions
    from manta_tpu.io.bam import BamReader
    from manta_tpu.io.fasta import FastaReader
    from manta_tpu.scan.scanner import ScannerOptions, SVScanner
    from manta_tpu.workflow.run import segment_regions

    t0 = time.perf_counter()
    stats = extract_read_group_stats(args.bam)
    t_stats = time.perf_counter() - t0

    reader = BamReader(args.bam)
    header = reader.header
    fasta = FastaReader(args.fasta)
    scanner = SVScanner(ScannerOptions(), [stats.frag_stats],
                        header.ref_lengths, header.ref_names)
    regions = segment_regions(
        [(tid, 0, ln) for tid, ln in enumerate(header.ref_lengths)],
        args.scan_size_mb * 1_000_000)

    t0 = time.perf_counter()
    if args.jobs > 1:
        import tempfile

        from manta_tpu.graph.locusgraph import SVLocusSet
        from manta_tpu.workflow.run import _estimate_sv_loci_parallel
        out_npz = tempfile.mktemp(suffix=".npz")
        _estimate_sv_loci_parallel(
            [args.bam], [False], scanner,
            SVLocusSetOptions(observation_weight=3), regions,
            args.fasta, None, args.jobs, out_path=out_npz)
        locus_set = SVLocusSet.load(out_npz)
        os.remove(out_npz)
    else:
        locus_set = estimate_sv_loci(
            [args.bam], [False], scanner,
            SVLocusSetOptions(observation_weight=3), regions, fasta)
    t_graph = time.perf_counter() - t0

    n_reads = sum(c.get("total", 0) + c.get("split_supplementary_segment", 0)
                  + c.get("min_mapq", 0)
                  for c in locus_set.sample_counts)
    print(json.dumps({
        "metric": "graph_build_reads_per_s",
        "value": round(n_reads / t_graph, 1),
        "unit": "reads/s",
        "reads": n_reads,
        "stats_s": round(t_stats, 2),
        "graph_s": round(t_graph, 2),
        "loci": locus_set.non_empty_size(),
        "nodes": locus_set.total_node_count(),
        "edges": locus_set.total_edge_count(),
        "jobs": args.jobs,
    }))


if __name__ == "__main__":
    main()
