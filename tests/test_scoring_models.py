"""Scoring model unit tests: diploid genotype likelihoods, pair
weights, and fragment evidence combination."""

import math

import numpy as np

from manta_tpu.core.svmodel import (
    BND_LEFT_OPEN, BND_RIGHT_OPEN, SVCandidate,
)
from manta_tpu.scoring.evidence import FragmentEvidence, set_read_evidence
from manta_tpu.scoring.scorer import (
    DGT_HET, DGT_HOM, DGT_REF, DGT_SIZE, add_diploid_loglhood,
    get_spanning_pair_weight,
)


def _frag(alt_prob=None, ref_prob=None, split_alt=None, split_ref=None,
          mapq=60):
    """A fragment with anchored reads and optional pair/split support."""
    f = FragmentEvidence()
    for is_r1 in (True, False):
        set_read_evidence(15, 5, mapq, 100, False, f.get_read(is_r1))
    if alt_prob is not None:
        for bp in (f.alt.bp1, f.alt.bp2):
            bp.is_fragment_support = True
            bp.frag_length_prob = alt_prob
    if ref_prob is not None:
        for bp in (f.ref.bp1, f.ref.bp2):
            bp.is_fragment_support = True
            bp.frag_length_prob = ref_prob
    if split_alt is not None:
        # the scorer marks all four breakend-reads evaluated together
        for allele, lnl in ((f.alt, split_alt),
                            (f.ref, split_ref if split_ref is not None
                             else -50.0)):
            for bp in (allele.bp1, allele.bp2):
                r = bp.ensure_read(True)
                r.is_split_evaluated = True
                r.split_ln_lhood = lnl
        f.alt.bp1.ensure_read(True).is_split_support = True
        if split_ref is not None and split_ref > split_alt:
            f.ref.bp1.ensure_read(True).is_split_support = True
    return f


def _genotype(track):
    loglhood = [0.0] * DGT_SIZE
    add_diploid_loglhood(1.0, track, loglhood)
    return int(np.argmax(loglhood)), loglhood


def test_all_ref_pairs_genotype_ref():
    track = {f"q{i}": _frag(ref_prob=0.4) for i in range(10)}
    gt, _ = _genotype(track)
    assert gt == DGT_REF


def test_mixed_pairs_genotype_het():
    track = {}
    for i in range(10):
        track[f"r{i}"] = _frag(ref_prob=0.4)
        track[f"a{i}"] = _frag(alt_prob=0.4)
    gt, lh = _genotype(track)
    assert gt == DGT_HET, lh


def test_all_alt_pairs_genotype_hom():
    track = {f"a{i}": _frag(alt_prob=0.4) for i in range(12)}
    gt, lh = _genotype(track)
    assert gt == DGT_HOM, lh


def test_split_reads_drive_genotype():
    # strong alt split-read lhoods with no pair information
    track = {f"s{i}": _frag(split_alt=-2.0, split_ref=-60.0)
             for i in range(8)}
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
