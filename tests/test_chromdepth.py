"""Chromosome median-depth estimation vs a direct per-position oracle."""

import numpy as np

from manta_tpu.core.chromdepth import (
    _median, _visit_observations, estimate_chrom_depths, read_chrom_depth,
)
from manta_tpu.io.bam import BamReader


def test_median_tracker_semantics():
    # zero excluded; even-count midpoint averaging
    assert _median({0: 100, 4: 1}, 101) == 4.0
    assert _median({2: 1, 4: 1}, 2) == 3.0
    assert _median({2: 3, 4: 1}, 4) == 2.0
    assert _median({}, 0) == 0.0


def _oracle_visit(starts, lengths):
    """Scalar re-implementation of the flush-time block buffer."""
    p0, plast = int(starts[0]), int(starts[-1])
    vals = []
    for p in range(p0, plast + 1):
        b = p // 16
        s = 0
        for st, ln in zip(starts, lengths):
            if st > p:
                continue
            lo = max(st, b * 16)
            hi = min(st + ln, b * 16 + 16)
            s += max(0, hi - lo)
        vals.append((s + 8) // 16)
    return np.asarray(vals)


def test_visit_observations_matches_scalar_oracle():
    rng = np.random.default_rng(3)
    starts = np.sort(rng.integers(1000, 1400, 200)).astype(np.int64)
    lengths = rng.integers(50, 150, 200).astype(np.int64)
    p0, plast, vals = _visit_observations(starts, lengths)
    oracle = _oracle_visit(starts, lengths)
    assert p0 == starts[0] and plast == starts[-1]
    np.testing.assert_array_equal(vals, oracle)


def test_demo_chrom_depth(tumor_bam):
    reader = BamReader(tumor_bam)
    # demo BAM covers a small region of chr8 and chr11; median depth over
    # covered positions should be in a plausible deep-coverage range
    tid8 = reader.header.name_to_tid["8"]
    d = read_chrom_depth(reader, tid8, reader.header.ref_lengths[tid8])
    # direct per-position nonzero-median oracle for this BAM is ~510
    assert 450 < d < 600, d


def test_estimate_sums_over_bams(tumor_bam):
    single = estimate_chrom_depths([tumor_bam])
    double = estimate_chrom_depths([tumor_bam, tumor_bam])
    for k in single:
        assert abs(double[k] - 2 * single[k]) < 1e-9
