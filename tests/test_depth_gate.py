"""Differential tests for the vectorized streaming depth gate.

_depth_gate_batch replays, fully vectorized, the scalar semantics the
per-read loop used to implement (reference: depth_buffer.hpp:82-119
driven from SVLocusSetFinder::update — inc the NORMAL-sample read's
sequence length first, then test the buffer value at the read's own
start position). These tests pin the replay against a literal scalar
re-implementation across pileups that cross the threshold, position
ties, tumor/normal interleaving, filtered reads, and carried state
over sequential batches.
"""

import numpy as np
import pytest

from manta_tpu.graph.finder import DepthBuffer, _depth_gate_batch


class _Batch:
    def __init__(self, pos, lens):
        self.pos = np.asarray(pos, np.int64)
        self.n = len(pos)
        self.seq_off = np.concatenate(
            [[0], np.cumsum(np.asarray(lens, np.int64))])


class _Finder:
    def __init__(self, is_tumor, max_depth):
        self.depth = DepthBuffer()
        self.is_tumor = is_tumor
        self.max_depth = max_depth


def scalar_gate(finder, batches, osi, oi, core_bads):
    """Literal replay of the original per-read loop's depth section."""
    out = np.zeros(len(osi), bool)
    for k, (si, i) in enumerate(zip(osi.tolist(), oi.tolist())):
        b = batches[si]
        if core_bads[si][i]:
            continue
        pos = int(b.pos[i])
        if not finder.is_tumor[si]:
            finder.depth.inc(pos, int(b.seq_off[i + 1] - b.seq_off[i]))
        out[k] = not (finder.depth.val(pos) > finder.max_depth)
    return out


def _merged_stream(batches, rng):
    """Position-sorted merged (sample, index) stream over the batches
    (stable order for ties, like merge_sorted_batches)."""
    parts = [(int(b.pos[i]), si, i)
             for si, b in enumerate(batches) for i in range(b.n)]
    parts.sort(key=lambda t: t[0])
    osi = np.array([p[1] for p in parts], np.int32)
    oi = np.array([p[2] for p in parts], np.int64)
    return osi, oi


def _random_case(rng, n_samples, is_tumor, max_depth, n_reads,
                 pileup_at=None, pileup_reads=0, span=20000):
    batches, core_bads = [], []
    for si in range(n_samples):
        pos = np.sort(rng.integers(0, span, n_reads))
        if pileup_at is not None and pileup_reads and si == 0:
            pile = np.full(pileup_reads, pileup_at) + \
                rng.integers(-40, 40, pileup_reads)
            pos = np.sort(np.concatenate([pos, pile]))
        lens = rng.integers(30, 150, len(pos))
        batches.append(_Batch(pos, lens))
        core_bads.append(rng.random(len(pos)) < 0.1)
    return batches, core_bads


@pytest.mark.parametrize("seed", range(6))
def test_depth_gate_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    is_tumor = [False, True, False][: 2 + seed % 2]
    max_depth = [7.0, 12.5, 40.0][seed % 3]
    batches, core_bads = _random_case(
        rng, len(is_tumor), is_tumor, max_depth, n_reads=400,
        pileup_at=9000, pileup_reads=300)
    osi, oi = _merged_stream(batches, rng)

    fv = _Finder(is_tumor, max_depth)
    fs = _Finder(is_tumor, max_depth)
    got = _depth_gate_batch(fv, batches, osi, oi, core_bads)
    want = scalar_gate(fs, batches, osi, oi, core_bads)
    np.testing.assert_array_equal(got, want)
    # the pileup must actually exercise the threshold, else the test
    # only covers the trivially-passing bound path
    assert (~want[~np.array([core_bads[si][i] for si, i in
                             zip(osi.tolist(), oi.tolist())])]).any()


def test_depth_gate_carried_state_across_batches():
    """A pileup split across two sequential update calls: the second
    batch must see the depth carried from the first."""
    rng = np.random.default_rng(42)
    is_tumor = [False]
    max_depth = 5.0
    # batch 2 starts at batch 1's last position (the production
    # sub-window streams are position-partitioned, so positions never
    # regress across batches); batch 1's reads extend ~100 bp past the
    # boundary, so batch 2's early bins carry batch-1 depth
    b1 = _Batch(np.sort(rng.integers(1000, 1100, 80)),
                np.full(80, 100))
    lo2 = int(b1.pos[-1])
    b2 = _Batch(np.sort(rng.integers(lo2, lo2 + 150, 80)),
                np.full(80, 100))
    cb1 = [np.zeros(80, bool)]
    cb2 = [np.zeros(80, bool)]
    s1 = (np.zeros(80, np.int32), np.arange(80, dtype=np.int64))
    s2 = (np.zeros(80, np.int32), np.arange(80, dtype=np.int64))

    fv = _Finder(is_tumor, max_depth)
    fs = _Finder(is_tumor, max_depth)
    got1 = _depth_gate_batch(fv, [b1], *s1, cb1)
    want1 = scalar_gate(fs, [b1], *s1, cb1)
    got2 = _depth_gate_batch(fv, [b2], *s2, cb2)
    want2 = scalar_gate(fs, [b2], *s2, cb2)
    np.testing.assert_array_equal(got1, want1)
    np.testing.assert_array_equal(got2, want2)
    assert (~want2).any()          # the carry-over actually fires
    # carried bins agree wherever a future read could still look
    cut = (int(b2.pos[-1]) - 10) // fv.depth.c
    for k, v in fs.depth.bins.items():
        if k >= cut:
            assert fv.depth.bins.get(k, 0) == v


def test_depth_gate_tumor_only_never_fires():
    """Tumor samples never inc, so a tumor-only stream keeps depth 0
    and every unfiltered read passes (matches scalar semantics)."""
    rng = np.random.default_rng(7)
    b = _Batch(np.sort(rng.integers(0, 200, 500)), np.full(500, 100))
    cb = [np.zeros(500, bool)]
    stream = (np.zeros(500, np.int32), np.arange(500, dtype=np.int64))
    fv = _Finder([True], 3.0)
    got = _depth_gate_batch(fv, [b], *stream, cb)
    assert got.all()
    assert fv.depth.bins == {}
