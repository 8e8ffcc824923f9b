"""Breakend-graph tests: locus merge semantics, set-level mergeable-node
search, denoising, serialization (mirroring the reference's
svgraph/test scenarios)."""

import numpy as np

from manta_tpu.graph.locusgraph import (
    SVLocus, SVLocusSet, SVLocusSetOptions,
)


def make_pair_locus(tid1, beg1, end1, tid2, beg2, end2, w1=1, w2=0):
    locus = SVLocus()
    n1 = locus.add_node(tid1, beg1, end1)
    n2 = locus.add_node(tid2, beg2, end2)
    locus.link_nodes(n1, n2, w1, w2)
    return locus


def test_locus_merge_node():
    locus = SVLocus()
    n1 = locus.add_node(0, 10, 20)
    n2 = locus.add_node(0, 15, 30)
    n3 = locus.add_node(1, 100, 200)
    locus.link_nodes(n1, n3, 2, 0)
    locus.link_nodes(n2, n3, 1, 0)
    locus.merge_node(n2, n1)
    locus.erase_node(n2)
    assert len(locus) == 2
    assert locus.nodes[n1].beg == 10 and locus.nodes[n1].end == 30
    assert locus.nodes[n1].edges[1] == 3  # merged edge counts to n3
    locus.check_state(True)


def test_locus_merge_chimera_max_rule():
    # nodes connected to each other merge: edge counts take max, not sum
    locus = SVLocus()
    n1 = locus.add_node(0, 10, 30)
    n2 = locus.add_node(0, 20, 40)
    locus.link_nodes(n1, n2, 3, 2)
    locus.merge_node(n1, n2)
    locus.erase_node(n1)
    assert len(locus) == 1
    # self-edge on remaining node with max(3,2)=3
    assert locus.nodes[0].edges == {0: 3}


def test_merge_self_overlap():
    locus = SVLocus()
    locus.add_node(0, 10, 30)
    locus.add_node(0, 20, 40)
    locus.add_node(1, 100, 110)
    locus.link_nodes(0, 2, 1, 0)
    locus.link_nodes(1, 2, 1, 0)
    locus.merge_self_overlap()
    assert len(locus) == 2
    tids = sorted(n.tid for n in locus.nodes)
    assert tids == [0, 1]
    locus.check_state(True)


def test_set_below_threshold_no_merge():
    s = SVLocusSet(SVLocusSetOptions())
    s.merge_locus(make_pair_locus(0, 10, 60, 1, 100, 160))
    s.merge_locus(make_pair_locus(0, 20, 70, 1, 110, 170))
    # 1+1 = 2 < 3: nodes stay unmerged in separate loci
    assert s.non_empty_size() == 2
    assert s.total_node_count() == 4
    s.check_state(True, True)


def test_set_merge_at_threshold():
    s = SVLocusSet(SVLocusSetOptions())
    for k in range(3):
        s.merge_locus(make_pair_locus(0, 10 + k, 60 + k, 1, 100 + k, 160 + k))
    # third locus pushes shared edge evidence to 3 -> all merge
    assert s.non_empty_size() == 1
    assert s.total_node_count() == 2
    nodes = sorted((n.tid, n.beg, n.end) for l in s.loci if not l.empty()
                   for n in l.nodes)
    assert nodes == [(0, 10, 62), (1, 100, 162)]
    # edge count should be 3 in the evidence direction
    locus = [l for l in s.loci if not l.empty()][0]
    counts = sorted(c for n in locus.nodes for c in n.edges.values())
    assert counts == [0, 3]
    s.check_state(True, True)


def test_set_merge_heavy_edges():
    # observation-weight edges (3 per read-pair observation) merge at 2 loci
    s = SVLocusSet(SVLocusSetOptions())
    s.merge_locus(make_pair_locus(0, 10, 60, 1, 100, 160, w1=3))
    s.merge_locus(make_pair_locus(0, 20, 70, 1, 110, 170, w1=3))
    assert s.non_empty_size() == 1
    assert s.total_node_count() == 2
    s.check_state(True, True)


def test_clean_removes_noise():
    s = SVLocusSet(SVLocusSetOptions())
    s.merge_locus(make_pair_locus(0, 10, 60, 1, 100, 160))
    s.merge_locus(make_pair_locus(0, 200, 260, 1, 300, 360, w1=3))
    s.clean()
    # weight-1 edge locus cleaned away entirely; weight-3 locus survives
    assert s.total_node_count() == 2
    assert s.total_observation_count() == 3
    assert s.total_cleaned == 1


def test_finalize_and_checkstate():
    s = SVLocusSet(SVLocusSetOptions())
    for k in range(4):
        s.merge_locus(make_pair_locus(0, 10 + k, 60 + k, 1, 100 + k, 160 + k))
    s.finalize()
    s.check_state(True, True)
    assert s.is_finalized


def test_save_load_roundtrip(tmp_path):
    s = SVLocusSet(SVLocusSetOptions(), ["chr1", "chr2"], [1000, 2000])
    for k in range(3):
        s.merge_locus(make_pair_locus(0, 10 + k, 60 + k, 1, 100 + k, 160 + k))
    s.finalize()
    p = str(tmp_path / "graph.npz")
    s.save(p)
    s2 = SVLocusSet.load(p)
    assert s2.total_node_count() == s.total_node_count()
    assert s2.total_observation_count() == s.total_observation_count()
    assert s2.chrom_names == ["chr1", "chr2"]
    assert s2.is_finalized
    s2.check_state(True, True)


def test_self_edge_complex_locus():
    # complex (single-node self-edge) loci merge on overlap
    s = SVLocusSet(SVLocusSetOptions())
    for k in range(3):
        locus = SVLocus()
        n = locus.add_node(0, 100 + k, 160 + k)
        locus.link_nodes(n, n, 3)
        s.merge_locus(locus)
    assert s.non_empty_size() == 1
    assert s.total_node_count() == 1
    locus = [l for l in s.loci if not l.empty()][0]
    assert locus.nodes[0].edges[0] >= 3
    s.check_state(True, True)


def test_region_clean():
    s = SVLocusSet(SVLocusSetOptions())
    s.merge_locus(make_pair_locus(0, 10, 60, 1, 100, 160))  # noise
    s.clean_region(0, 0, 1000)
    # local node cleaned: noise edge removed; remote node also erased
    assert s.total_node_count() == 0
