"""Differential tests: the native graph merge engine must reproduce
the Python SVLocusSet byte-for-byte on randomized operation streams,
including noise cleaning and the complexity-abort paths."""

import numpy as np

from manta_tpu.graph.locusgraph import SVLocus, SVLocusSet, SVLocusSetOptions
from manta_tpu.graph.native_set import NativeLocusSet


def py_insert_read(s, tid1, beg1, end1, ev_beg, ev_end, w1, is_complex,
                   tid2=0, beg2=0, end2=0, w2=0):
    """The finder's per-read locus construction (graph/finder.py)."""
    locus = SVLocus()
    n1 = locus.add_node(tid1, beg1, end1)
    locus.set_node_evidence(n1, ev_beg, ev_end)
    if is_complex:
        locus.link_nodes(n1, n1, w1)
    else:
        n2 = locus.add_node(tid2, beg2, end2)
        locus.link_nodes(n1, n2, w1, w2)
        locus.merge_self_overlap()
    if not locus.empty():
        s.merge_locus(locus)


def py_flat(s: SVLocusSet):
    """Flatten like SVLocusSet.save()."""
    metas, node_arr, edge_arr = [], [], []
    for locus in s.loci:
        if locus.empty():
            continue
        metas.append(len(locus))
        for node in locus.nodes:
            node_arr.append((node.tid, node.beg, node.end,
                             node.ev_beg, node.ev_end, len(node.edges)))
            for j, c in sorted(node.edges.items()):
                edge_arr.append((j, c))
    return (np.array(metas, np.int64),
            np.array(node_arr, np.int64).reshape(-1, 6),
            np.array(edge_arr, np.int64).reshape(-1, 2))


def random_ops(rng, n_ops, span=3000, tids=2):
    ops = []
    for _ in range(n_ops):
        if rng.random() < 0.1:
            tid = int(rng.integers(0, tids))
            beg = int(rng.integers(0, span))
            ops.append(("clean", tid, beg, beg + int(rng.integers(50, 800))))
            continue
        tid1 = int(rng.integers(0, tids))
        beg1 = int(rng.integers(0, span))
        end1 = beg1 + int(rng.integers(20, 200))
        evb = beg1 + int(rng.integers(0, 20))
        eve = evb + int(rng.integers(1, 100))
        w1 = int(rng.integers(1, 4))
        if rng.random() < 0.15:
            ops.append(("ins", tid1, beg1, end1, evb, eve, w1, True,
                        0, 0, 0, 0))
        else:
            tid2 = int(rng.integers(0, tids))
            beg2 = int(rng.integers(0, span))
            end2 = beg2 + int(rng.integers(20, 200))
            w2 = int(rng.integers(0, 3))
            ops.append(("ins", tid1, beg1, end1, evb, eve, w1, False,
                        tid2, beg2, end2, w2))
    return ops


def run_both(ops, opt, tids=2):
    ps = SVLocusSet(opt, [f"c{i}" for i in range(tids)], [10**6] * tids, 1)
    ns = NativeLocusSet(opt, tids)
    for op in ops:
        if op[0] == "clean":
            ps.clean_region(*op[1:])
            ns.clean_region(*op[1:])
        else:
            py_insert_read(ps, *op[1:])
            ns.insert_read_locus(*op[1:])
    return ps, ns


def assert_equal_state(ps, ns):
    pls, pnd, ped = py_flat(ps)
    nls, nnd, ned, stats = ns.export_flat()
    np.testing.assert_array_equal(pls, nls)
    np.testing.assert_array_equal(pnd, nnd)
    np.testing.assert_array_equal(ped, ned)
    assert stats["total_cleaned"] == ps.total_cleaned
    assert stats["highest_search_count"] == ps.highest_search_count
    assert stats["highest_search_density"] == ps.highest_search_density
    assert stats["is_max_search_count"] == ps.is_max_search_count
    assert stats["is_max_search_density"] == ps.is_max_search_density


def test_native_graph_randomized_parity():
    for seed in range(6):
        rng = np.random.default_rng(seed)
        ops = random_ops(rng, 400)
        ps, ns = run_both(ops, SVLocusSetOptions())
        assert_equal_state(ps, ns)
        ns.free()


def test_native_graph_abort_paths():
    """Tight complexity limits exercise the search-count/density aborts."""
    for seed, kw in ((11, dict(max_search_count=12)),
                     (12, dict(max_search_density=0.02))):
        rng = np.random.default_rng(seed)
        ops = random_ops(rng, 500, span=1200)
        ps, ns = run_both(ops, SVLocusSetOptions(**kw))
        assert ps.is_max_search_count or ps.is_max_search_density
        assert_equal_state(ps, ns)
        ns.free()


def test_native_graph_merge_graph_parity():
    """Native graph-to-graph merge == Python merge_set, including via
    the flat load/export round trip."""
    rng = np.random.default_rng(42)
    ops_a = random_ops(rng, 250)
    ops_b = random_ops(rng, 250)
    opt = SVLocusSetOptions()
    ps_a, ns_a = run_both(ops_a, opt)
    ps_b, ns_b = run_both(ops_b, opt)
    ps_a.merge_set(ps_b)
    ns_a.merge_native(ns_b)
    assert_equal_state(ps_a, ns_a)

    # flat round trip: python graph -> native handle -> export
    ns_rt = NativeLocusSet.from_locus_set(ps_a, 2)
    assert_equal_state(ps_a, ns_rt)
    # and rehydration back to a python set preserves save() layout
    back = ns_a.to_locus_set(["c0", "c1"], [10**6] * 2, 1)
    pls, pnd, ped = py_flat(ps_a)
    bls, bnd, bed = py_flat(back)
    np.testing.assert_array_equal(pls, bls)
    np.testing.assert_array_equal(pnd, bnd)
    np.testing.assert_array_equal(ped, bed)
    back.check_state(False, True)
    ns_a.free()
    ns_b.free()
    ns_rt.free()


def test_native_graph_finalize_parity():
    """mt_graph_finalize == Python SVLocusSet.finalize (whole-graph
    noise clean + finalization), on randomized graphs with noise
    edges below the merge threshold."""
    for seed in range(4):
        rng = np.random.default_rng(100 + seed)
        ops = random_ops(rng, 400)
        ps, ns = run_both(ops, SVLocusSetOptions())
        ps.finalize()
        ns.finalize_native()
        assert_equal_state(ps, ns)
        ns.free()


def test_native_save_npz_matches_python_save(tmp_path):
    """NativeLocusSet.save_npz round-trips through SVLocusSet.load
    identically to a Python-side save of the same graph."""
    rng = np.random.default_rng(7)
    ops = random_ops(rng, 300)
    ps, ns = run_both(ops, SVLocusSetOptions())
    ps.finalize()
    ns.finalize_native()
    p_py = tmp_path / "py.npz"
    p_nat = tmp_path / "nat.npz"
    ps.save(str(p_py))
    ns.save_npz(str(p_nat), ps.chrom_names, ps.chrom_lengths,
                ps.sample_count, ps.sample_counts, is_finalized=True)
    a = SVLocusSet.load(str(p_py), check=True)
    b = SVLocusSet.load(str(p_nat), check=True)
    pa = py_flat(a)
    pb = py_flat(b)
    for x, y in zip(pa, pb):
        np.testing.assert_array_equal(x, y)
    assert a.is_finalized == b.is_finalized
    assert a.total_cleaned == b.total_cleaned
    assert list(a._inodes) == list(b._inodes)
    ns.free()
