"""Parity tests for the batched native split-alignment helpers against
the per-read host implementations they replace."""

import numpy as np

from manta_tpu.io.bam import BamReader
from manta_tpu.scan.scanner import get_alignment
from manta_tpu.candidates.assembler_reads import BreakendReadAssembler
from manta_tpu.scoring.evidence import (
    SRAlignmentInfo, finalize_split_alignment,
    finalize_split_alignment_counts, matchify_ranges_batch,
    split_finalize_multi,
)


def test_matchify_ranges_batch_matches_host(tumor_bam):
    batch = BamReader(tumor_bam).fetch("8", 107652000, 107655000)
    beg, end = matchify_ranges_batch(batch)
    assert matchify_ranges_batch(batch) == (beg, end)  # cached
    for i in range(batch.n):
        rng = BreakendReadAssembler._matchify_ref_range(
            get_alignment(batch, i))
        assert (int(beg[i]), int(end[i])) == rng, i


def test_split_finalize_multi_matches_host(tumor_bam):
    rng = np.random.default_rng(3)
    batch = BamReader(tumor_bam).fetch("8", 107652000, 107655000)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    targets = [bases[rng.integers(0, 5, 400)].copy(),
               bases[rng.integers(0, 4, 350)].copy()]
    bp_ranges = [(120, 124), (200, 200)]
    idx = np.arange(0, batch.n, 3, dtype=np.int64)
    # winner positions within the legal scan window of each target
    best_pos = np.empty((len(idx), 2), np.int32)
    for r, i in enumerate(idx):
        nq = batch.read_len(int(i))
        for t, (b, e) in enumerate(bp_ranges):
            lo = max(0, b - nq + 2)
            hi = max(lo, min(e, len(targets[t]) - nq))
            best_pos[r, t] = rng.integers(lo, hi + 1)
    mm = split_finalize_multi(batch, idx, targets, bp_ranges, best_pos)
    for r, i in enumerate(idx):
        read = batch.seq[batch.seq_off[int(i)]:batch.seq_off[int(i) + 1]]
        for t in range(2):
            host = finalize_split_alignment(
                SRAlignmentInfo(), -1.5, int(best_pos[r, t]), read,
                targets[t], *bp_ranges[t])
            fast = finalize_split_alignment_counts(
                SRAlignmentInfo(), -1.5, int(best_pos[r, t]), len(read),
                *bp_ranges[t], mm[r, t])
            for attr in ("left_size", "hom_size", "right_size",
                         "left_mismatches", "hom_mismatches",
                         "right_mismatches", "align_score", "align_pos",
                         "is_evidence", "is_tier2_evidence", "evidence"):
                assert getattr(host, attr) == getattr(fast, attr), \
                    (r, t, attr)


def test_finalize_split_evidence_multi_matches_scalar(tumor_bam):
    """Vectorized (reads x targets) evidence summary must bit-match the
    scalar finalize_split_alignment_counts + _set_evidence path."""
    from manta_tpu.scoring.evidence import finalize_split_evidence_multi

    rng = np.random.default_rng(7)
    batch = BamReader(tumor_bam).fetch("8", 107652000, 107655000)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    targets = [bases[rng.integers(0, 5, 400)].copy(),
               bases[rng.integers(0, 4, 350)].copy()]
    bp_ranges = [(120, 124), (200, 200)]
    idx = np.arange(0, batch.n, 3, dtype=np.int64)
    best_pos = np.empty((len(idx), 2), np.int32)
    for r, i in enumerate(idx):
        nq = batch.read_len(int(i))
        for t, (b, e) in enumerate(bp_ranges):
            lo = max(0, b - nq + 2)
            hi = max(lo, min(e, len(targets[t]) - nq))
            best_pos[r, t] = rng.integers(lo, hi + 1)
    mm = split_finalize_multi(batch, idx, targets, bp_ranges, best_pos)
    nq_arr = batch.seq_off[idx + 1] - batch.seq_off[idx]
    is_ev, is_t2, evd = finalize_split_evidence_multi(
        nq_arr, best_pos, bp_ranges, mm)
    for r, i in enumerate(idx):
        for t in range(2):
            host = finalize_split_alignment_counts(
                SRAlignmentInfo(), -1.5, int(best_pos[r, t]),
                int(nq_arr[r]), *bp_ranges[t], mm[r, t])
            assert bool(is_ev[r, t]) == host.is_evidence, (r, t)
            assert bool(is_t2[r, t]) == host.is_tier2_evidence, (r, t)
            assert float(evd[r, t]) == host.evidence, (r, t)
