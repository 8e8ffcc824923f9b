"""DepthSweep vs the scalar pileup accumulation it replaces."""

import numpy as np

from manta_tpu.core.depthsweep import DepthSweep


def scalar_start_depths(batches, window):
    """Simulate the reference's sequential pileup: increment the buffer
    for each contributing read in order, then record the value at the
    read's start offset (clipped exactly like the scalar loops)."""
    beg, end = window
    depth = np.zeros(end - beg, np.int64)
    out = []
    for pos, lens, contrib in batches:
        vals = np.empty(len(pos), np.int64)
        for k in range(len(pos)):
            if contrib[k]:
                s = max(0, int(pos[k]) - beg)
                e = min(end - beg, int(pos[k]) - beg + int(lens[k]))
                if e > s:
                    depth[s:e] += 1
            off = int(pos[k]) - beg
            vals[k] = depth[off] if 0 <= off < end - beg else -1
        out.append(vals)
    return out


def test_depthsweep_matches_scalar_pileup():
    rng = np.random.default_rng(7)
    beg, end = 1000, 2000
    for trial in range(20):
        batches = []
        for _ in range(rng.integers(1, 4)):
            n = int(rng.integers(1, 200))
            pos = np.sort(rng.integers(beg - 150, end - 1, n)).astype(
                np.int64)
            lens = rng.integers(0, 180, n).astype(np.int64)
            contrib = rng.random(n) < 0.8
            batches.append((pos, lens, contrib))
        want = scalar_start_depths(batches, (beg, end))
        sweep = DepthSweep()
        for (pos, lens, contrib), w in zip(batches, want):
            got = sweep.start_depth(pos, lens, contrib)
            in_win = (pos >= beg) & (pos < end)
            assert np.array_equal(got[in_win], w[in_win]), trial


def test_depthsweep_ties_and_empty():
    sweep = DepthSweep()
    pos = np.array([5, 5, 5, 9], np.int64)
    lens = np.array([10, 10, 0, 2], np.int64)
    contrib = np.array([True, True, True, True])
    got = sweep.start_depth(pos, lens, contrib)
    # zero-length read never contributes, sees the first two stacks
    assert got.tolist() == [1, 2, 2, 3]
    # second batch sees the base coverage from the first
    got2 = sweep.start_depth(np.array([5], np.int64),
                             np.array([1], np.int64),
                             np.array([True]))
    assert got2.tolist() == [3]
    empty = DepthSweep().start_depth(np.zeros(0, np.int64),
                                     np.zeros(0, np.int64),
                                     np.zeros(0, bool))
    assert empty.size == 0
