"""RNA-mode unit tests: the fusion scorer branches, kmer-masked
reference cutting, masked-alignment translation, and the RNA contig
selection rule (reference: SVScorer.cpp scoreRNASV:1158,
SVCandidateAssemblyRefiner.cpp kmerMaskReference:1139 /
translateMaskedAlignment:1101 / selectJumpContigRNA:1312)."""

import numpy as np

from manta_tpu.align.aligners import Alignment, JumpAlignmentResult
from manta_tpu.assembly.assembler import AssembledContig
from manta_tpu.candidates.refiner import (
    AssemblyData, kmer_mask_reference, translate_masked_alignment,
)
from manta_tpu.core.svmodel import (
    BND_LEFT_OPEN, BND_RIGHT_OPEN, SVCandidate,
)
from manta_tpu.io.bam import C_EQ, C_M
from manta_tpu.scoring.evidence import SampleInfo, ScoreInfo
from manta_tpu.scoring.scorer import RnaResult, SVScorer


def _rna_candidate(tid2=1, dist=500_000, imprecise=False):
    sv = SVCandidate()
    sv.bp1.state = BND_RIGHT_OPEN
    sv.bp2.state = BND_LEFT_OPEN
    sv.bp1.interval.tid = 0
    sv.bp2.interval.tid = tid2
    sv.bp1.interval.beg, sv.bp1.interval.end = 1000, 1001
    sv.bp2.interval.beg, sv.bp2.interval.end = 1000 + dist, 1001 + dist
    sv.is_imprecise = imprecise
    return sv


def _score(sv, split=1, conf_pair=1):
    base = ScoreInfo(samples=[SampleInfo()])
    base.samples[0].alt.split_read_count = split
    base.samples[0].alt.confident_spanning_pair_count = conf_pair
    result = RnaResult()
    scorer = SVScorer.__new__(SVScorer)
    scorer.score_rna([(sv, None, base, 1.0)], result)
    return result


def test_rna_scorer_pass():
    r = _score(_rna_candidate())
    assert r.alt_score == 42  # SVScoreInfoRna::defaultScore
    assert not r.filters


def test_rna_scorer_imprecise_short_circuits():
    r = _score(_rna_candidate(imprecise=True))
    assert r.filters == {"Imprecise"}


def test_rna_scorer_local_filter():
    # same-chromosome junction below the 100 kb fusion-distance floor
    r = _score(_rna_candidate(tid2=0, dist=50_000))
    assert "Local" in r.filters
    r2 = _score(_rna_candidate(tid2=0, dist=200_000))
    assert "Local" not in r2.filters


def test_rna_scorer_low_evidence_branches():
    assert "LowEvidence" in _score(_rna_candidate(), split=0).filters
    assert "LowEvidence" in _score(_rna_candidate(), conf_pair=0).filters
    assert not _score(_rna_candidate(), split=2, conf_pair=3).filters


def test_kmer_mask_reference_cuts_nonmatching_stretch():
    rng = np.random.default_rng(3)
    bases = "ACGT"
    left = "".join(bases[b] for b in rng.integers(0, 4, 300))
    gap = "".join(bases[b] for b in rng.integers(0, 4, 2000))
    right = "".join(bases[b] for b in rng.integers(0, 4, 300))
    contig = left[-80:] + right[:80]
    ref = left + gap + right
    cut, excl = kmer_mask_reference(ref, contig)
    assert len(cut) < len(ref) - 1000, "long kmer-free stretch not cut"
    assert excl, "no exclusion blocks recorded"
    # translation maps a masked-space alignment back to full-reference
    # coordinates: an alignment starting right of the cut shifts by the
    # excluded length minus its spacer
    start, length, spacer = excl[0]
    al = Alignment(begin_pos=start + spacer + 5,
                   ops=np.array([C_M], np.int32),
                   lens=np.array([40], np.int32))
    assert translate_masked_alignment(al, excl)
    assert al.begin_pos == start + length + 5


def test_translate_masked_alignment_rejects_match_over_cut():
    # a match segment spanning an excluded block cannot be translated
    excl = [(100, 500, 25)]
    al = Alignment(begin_pos=90,
                   ops=np.array([C_M], np.int32),
                   lens=np.array([60], np.int32))
    assert not translate_masked_alignment(al, excl)


def _spanning_result(score, seg_len=120):
    ops = np.array([C_EQ], np.int32)
    lens = np.array([seg_len], np.int32)
    return JumpAlignmentResult(
        score=score,
        align1=Alignment(0, ops.copy(), lens.copy()),
        align2=Alignment(0, ops.copy(), lens.copy()))


def test_select_jump_contig_rna_prefers_support_reads():
    """(reference: selectJumpContigRNA:1312-1360): among contigs within
    2x of the max score, the one with more supporting reads wins."""
    from manta_tpu.candidates.refiner import SVCandidateAssemblyRefiner
    data = AssemblyData()
    data.spanning_alignments = [_spanning_result(200),
                                _spanning_result(150)]
    data.contigs = [
        AssembledContig(seq="A" * 120, support_reads=set(range(3))),
        AssembledContig(seq="C" * 120, support_reads=set(range(10))),
    ]
    ref = SVCandidateAssemblyRefiner.__new__(SVCandidateAssemblyRefiner)
    from manta_tpu.candidates.refiner import RefinerOptions
    ref._contig_filter_scores = RefinerOptions().contig_filter_scores
    assert ref._select_jump_contig_rna(data)
    assert data.best_alignment_index == 1

    # a contig below half the max score cannot win on support reads
    data.spanning_alignments[1] = _spanning_result(90)
    assert ref._select_jump_contig_rna(data)
    assert data.best_alignment_index == 0
