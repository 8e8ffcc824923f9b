"""SVFinder unit behavior: edge filters and candidate significance."""


from manta_tpu.candidates.svfinder import (
    SVFinder, is_breakpoint_significant, iterate_edges,
)
from manta_tpu.graph.locusgraph import (
    SVLocus, SVLocusSet, SVLocusSetOptions,
)


def _set_with(edges):
    opt = SVLocusSetOptions(observation_weight=3,
                            min_merge_edge_observations=3)
    ls = SVLocusSet(opt, ["chr1"], [1_000_000], 1)
    locus = SVLocus()
    n = max(max(a, b) for a, b, _c, _c2 in edges) + 1
    for i in range(n):
        locus.add_node(0, 1000 * (i + 1), 1000 * (i + 1) + 100)
    for (a, b, c1, c2) in edges:
        locus.link_nodes(a, b, c1, c2)
    ls.merge_locus(locus)
    return ls


def test_iterate_edges_node_cap():
    # a node with > cap edges is skipped unless the partner is small
    edges = [(0, i, 9, 9) for i in range(1, 12)]
    ls = _set_with(edges)
    got = list(iterate_edges(ls, graph_node_max_edge_count=10))
    # node 0 has 11 edges (over cap) but every partner has 1 edge, so
    # all survive the both-nodes-over-cap rule
    assert len(got) == 11
    got_small_cap = list(iterate_edges(ls, graph_node_max_edge_count=0))
    assert len(got_small_cap) == 11  # cap 0 disables the filter


def test_breakpoint_significance_binomial():
    """(reference: SVFinder.cpp isBreakPointSignificant:807) — sliding
    window of sorted evidence read indexes vs one-sided binomial at the
    noise rate."""
    # tight cluster of evidence read-indexes: 5 hits within 6 reads
    assert is_breakpoint_significant(0.03, 0.01, [100, 101, 102, 104, 105])
    # the same 5 hits spread over 100k reads: background dominates
    assert not is_breakpoint_significant(
        0.03, 0.01, [100, 20100, 40100, 60100, 99100])
    # fewer than 2 observations can never be significant
    assert not is_breakpoint_significant(0.03, 0.01, [5])
    assert not is_breakpoint_significant(0.03, 0.01, [])
