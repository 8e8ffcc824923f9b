"""Scoring model unit tests: diploid genotype likelihoods, pair
weights, and fragment evidence combination."""

import math

import numpy as np

from manta_tpu.core.svmodel import (
    BND_LEFT_OPEN, BND_RIGHT_OPEN, SVCandidate,
)
from manta_tpu.scoring.fragbank import AL_ALT, AL_REF, FragmentBank
from manta_tpu.scoring.scorer import (
    DGT_HET, DGT_HOM, DGT_REF, DGT_SIZE, add_diploid_loglhood,
    get_spanning_pair_weight,
)


def _add_frag(bank, qname, alt_prob=None, ref_prob=None, split_alt=None,
              split_ref=None, mapq=60):
    """A fragment with anchored reads and optional pair/split support."""
    r = bank.row(qname.encode())
    for rd in (0, 1):
        bank.set_read_evidence(r, rd, 15, 5, mapq, 100, False)
    if alt_prob is not None:
        for bp in (0, 1):
            bank.set_pair_support(r, AL_ALT, bp, alt_prob)
    if ref_prob is not None:
        for bp in (0, 1):
            bank.set_pair_support(r, AL_REF, bp, ref_prob)
    if split_alt is not None:
        # the scorer marks all four breakend-reads evaluated together
        ref_lnl = split_ref if split_ref is not None else -50.0
        bank.sp_eval[r, :, :, 0] = True
        bank.sp_lnl[r, AL_ALT, :, 0] = split_alt
        bank.sp_lnl[r, AL_REF, :, 0] = ref_lnl
        bank.sp_sup[r, AL_ALT, 0, 0] = True
        if split_ref is not None and split_ref > split_alt:
            bank.sp_sup[r, AL_REF, 0, 0] = True
    return r


def _genotype(track):
    loglhood = [0.0] * DGT_SIZE
    add_diploid_loglhood(1.0, track, loglhood)
    return int(np.argmax(loglhood)), loglhood


def test_all_ref_pairs_genotype_ref():
    track = FragmentBank()
    for i in range(10):
        _add_frag(track, f"q{i}", ref_prob=0.4)
    gt, _ = _genotype(track)
    assert gt == DGT_REF


def test_mixed_pairs_genotype_het():
    track = FragmentBank()
    for i in range(10):
        _add_frag(track, f"r{i}", ref_prob=0.4)
        _add_frag(track, f"a{i}", alt_prob=0.4)
    gt, lh = _genotype(track)
    assert gt == DGT_HET, lh


def test_all_alt_pairs_genotype_hom():
    track = FragmentBank()
    for i in range(12):
        _add_frag(track, f"a{i}", alt_prob=0.4)
    gt, lh = _genotype(track)
    assert gt == DGT_HOM, lh


def test_split_reads_drive_genotype():
    # strong alt split-read lhoods with no pair information
    track = FragmentBank()
    for i in range(8):
        _add_frag(track, f"s{i}", split_alt=-2.0, split_ref=-60.0)
    gt, lh = _genotype(track)
    assert gt == DGT_HOM, lh


def _del_candidate(size):
    sv = SVCandidate()
    sv.bp1.state = BND_RIGHT_OPEN
    sv.bp2.state = BND_LEFT_OPEN
    sv.bp1.interval.tid = sv.bp2.interval.tid = 0
    sv.bp1.interval.beg = 1000
    sv.bp1.interval.end = 1001
    sv.bp2.interval.beg = 1000 + size
    sv.bp2.interval.end = 1001 + size
    sv.is_imprecise = False
    return sv


def test_spanning_pair_weight_ramp():
    """(reference: getSpanningPairWeight — 300-500b linear ramp)."""
    assert get_spanning_pair_weight(_del_candidate(200)) == 0.0
    assert get_spanning_pair_weight(_del_candidate(600)) == 1.0
    mid = get_spanning_pair_weight(_del_candidate(400))
    assert 0.45 < mid < 0.55
