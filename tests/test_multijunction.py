"""Multi-junction grouping: reciprocal translocation pairing and
spanning-count filtration (reference: manta/MultiJunctionUtil.cpp:158-260)."""

from manta_tpu.candidates.multijunction import find_multi_junction_candidates
from manta_tpu.core.svmodel import (
    BND_COMPLEX, BND_LEFT_OPEN, BND_RIGHT_OPEN, BND_UNKNOWN, EV_PAIR,
    GenomeInterval, SVBreakend, SVCandidate,
)


def _span_sv(tid1, beg1, st1, tid2, beg2, st2, pairs=5):
    sv = SVCandidate(
        bp1=SVBreakend(GenomeInterval(tid1, beg1, beg1 + 100), st1),
        bp2=SVBreakend(GenomeInterval(tid2, beg2, beg2 + 100), st2))
    sv.bp1.evidence[EV_PAIR] = pairs
    sv.bp2.evidence[EV_PAIR] = pairs
    return sv


def test_reciprocal_translocation_groups():
    sva = _span_sv(0, 1000, BND_RIGHT_OPEN, 1, 5000, BND_RIGHT_OPEN)
    svb = _span_sv(0, 1050, BND_LEFT_OPEN, 1, 5050, BND_LEFT_OPEN)
    lone = _span_sv(0, 500000, BND_RIGHT_OPEN, 0, 800000, BND_LEFT_OPEN,
                    pairs=4)
    groups = find_multi_junction_candidates([sva, svb, lone], 3,
                                            is_rna=False)
    assert len(groups) == 2
    assert groups[0] == [sva, svb]
    assert groups[1] == [lone]


def test_rna_mode_never_groups():
    sva = _span_sv(0, 1000, BND_RIGHT_OPEN, 1, 5000, BND_RIGHT_OPEN)
    svb = _span_sv(0, 1050, BND_LEFT_OPEN, 1, 5050, BND_LEFT_OPEN)
    groups = find_multi_junction_candidates([sva, svb], 3, is_rna=True)
    assert groups == [[sva], [svb]]


def test_low_spanning_count_filtered():
    weak = _span_sv(0, 1000, BND_RIGHT_OPEN, 1, 5000, BND_RIGHT_OPEN,
                    pairs=1)
    groups = find_multi_junction_candidates([weak], 3, is_rna=False)
    assert groups == []


def test_small_deletion_excluded_from_grouping():
    """Nearby INDEL-type candidates (<100 kb span) must not pair."""
    dela = _span_sv(0, 1000, BND_RIGHT_OPEN, 0, 3000, BND_LEFT_OPEN)
    delb = _span_sv(0, 1050, BND_LEFT_OPEN, 0, 3050, BND_RIGHT_OPEN)
    groups = find_multi_junction_candidates([dela, delb], 3,
                                            is_rna=False)
    assert groups == [[dela], [delb]]


def test_complex_sv_passes_through():
    cx = SVCandidate(
        bp1=SVBreakend(GenomeInterval(0, 100, 300), BND_COMPLEX),
        bp2=SVBreakend(GenomeInterval(0, 0, 0), BND_UNKNOWN))
    sva = _span_sv(0, 1000, BND_RIGHT_OPEN, 1, 5000, BND_RIGHT_OPEN)
    groups = find_multi_junction_candidates([cx, sva], 3, is_rna=False)
    assert groups == [[sva], [cx]]
