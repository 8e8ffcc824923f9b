"""Phase-2 edge binning strategies.

Contiguous observation-weighted bins
(reference: EdgeRetrieverBin.cpp:38-61) and interleaved jump bins
(reference: EdgeRetrieverJumpBin.cpp:35-124; the reference variant
carries a documented repetition/dropout bug from per-process load
accounting — the centralized partitioner here must be free of it).
"""

from manta_tpu.candidates.svfinder import iterate_edges
from manta_tpu.graph.locusgraph import (
    SVLocus, SVLocusSet, SVLocusSetOptions,
)
from manta_tpu.workflow.run import _partition_edges, _partition_edges_jump


def _make_set(n_loci=6, weight=3):
    s = SVLocusSet(SVLocusSetOptions())
    for i in range(n_loci):
        locus = SVLocus()
        n1 = locus.add_node(0, 1000 * i + 10, 1000 * i + 20)
        n2 = locus.add_node(1, 1000 * i + 10, 1000 * i + 20)
        locus.link_nodes(n1, n2, weight + i, weight)
        s.merge_locus(locus)
    return s


def _flat(bins):
    return [e for b in bins for e in b]


def test_contiguous_bins_cover_all_edges_once():
    s = _make_set()
    edges = list(iterate_edges(s))
    bins = _partition_edges(s, edges, 3)
    assert _flat(bins) == edges  # order preserving, no dropout/repeat


def test_jump_bins_cover_all_edges_once():
    # the reference jump-bin is flagged for repetition/dropout; the
    # single-pass partitioner must assign every edge exactly once
    s = _make_set(n_loci=17)
    edges = list(iterate_edges(s))
    for n_bins in (1, 2, 3, 5, 8):
        bins = _partition_edges_jump(s, edges, n_bins)
        flat = sorted(_flat(bins))
        assert flat == sorted(edges)
        assert len(flat) == len(set(flat))


def test_jump_bins_interleave_round_robin():
    # with equal weights and capacity to spare, assignment is pure
    # round-robin by edge index (EdgeRetrieverJumpBin.cpp:91-97)
    s = _make_set(n_loci=9, weight=1)
    edges = list(iterate_edges(s))
    bins = _partition_edges_jump(s, edges, 3)
    assert len(bins) == 3
    for bi, b in enumerate(bins):
        assert b == edges[bi::3]


def test_jump_bins_skip_full_bin():
    # one heavy edge saturates its bin; later round-robin hits on that
    # bin jump forward to the next non-full bin
    s = SVLocusSet(SVLocusSetOptions())
    weights = [100, 1, 1, 1, 1, 1]
    for i, w in enumerate(weights):
        locus = SVLocus()
        n1 = locus.add_node(0, 1000 * i + 10, 1000 * i + 20)
        n2 = locus.add_node(1, 1000 * i + 10, 1000 * i + 20)
        locus.link_nodes(n1, n2, w, 0)
        s.merge_locus(locus)
    edges = list(iterate_edges(s))
    bins = _partition_edges_jump(s, edges, 2)
    flat = sorted(_flat(bins))
    assert flat == sorted(edges)
    # the heavy edge (index 0) landed in bin 0 and filled it past the
    # average; all later even-index edges must jump to bin 1
    assert edges[0] in bins[0]
    assert all(e in bins[1] for e in edges[1:])
