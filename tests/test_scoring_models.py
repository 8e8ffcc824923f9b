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


def _split_frag(bank, qname, alt_lnl, ref_lnl):
    """A fragment whose read 1 carries split evidence at bp1 for the
    better-scoring allele (the scorer's do_ref/do_alt routing marks
    support only for the winning side)."""
    r = bank.row(qname.encode())
    for rd in (0, 1):
        bank.set_read_evidence(r, rd, 15, 5, 60, 100, False)
    bank.sp_eval[r, :, :, 0] = True
    bank.sp_lnl[r, AL_ALT, :, 0] = alt_lnl
    bank.sp_lnl[r, AL_REF, :, 0] = ref_lnl
    winner = AL_ALT if alt_lnl > ref_lnl else AL_REF
    bank.sp_sup[r, winner, 0, 0] = True
    return r


def test_small_hom_dup_called_het_ambiguity_pin():
    """Executable pin for the small-hom-DUP genotype ambiguity
    (reference: SVScorer.cpp scoreDiploidSV:926+ via
    addDiploidLoglhood:767-801; methods.tex:579-627).

    For a tandem duplication smaller than the read length, a read
    sampled from the INTERIOR of either copy aligns cleanly to the
    single-copy reference around the breakpoint position — the
    reference haplotype contig and the duplicated sample sequence are
    locally identical — so it registers as reference-allele split
    support even though the sample carries zero reference alleles.
    Only junction-crossing reads see the alt haplotype. At hom-alt
    truth both read populations exist in roughly equal numbers, so the
    diploid mixture model's likelihood

        L(gt) = sum_frags log( f_gt * exp(alt_lnl)
                             + (1 - f_gt) * exp(ref_lnl) ),
        f = (0.0, 0.5, 0.99)   # DGT alt fractions

    is maximized at the het fraction 0.5: each fragment is one-sided
    (its winning allele dwarfs the loser), so L(het) ~ N*log(0.5) + S
    while L(hom) pays ~log(0.01) for every clean-interior fragment.
    The reference's identical model shares this bias — this test is
    the regression-proof artifact for the WGS checker's observed
    gt_acc of 85-92% on small hom DUPs (docs/PERF_r03.md).

    Round 5: the production default (dup_gt_model="tandem-aware")
    corrects this with tandem-structure fractions + a depth term (see
    test_tandem_dup_fractions_recover_hom below); this pin covers the
    reference-parity path that add_diploid_loglhood's default fractions
    still implement (dup_gt_model="reference")."""
    track = FragmentBank()
    # 8 junction-crossing reads (alt wins) + 8 copy-interior reads
    # spanning the reference breakpoint projection (ref wins)
    for i in range(8):
        _split_frag(track, f"jx{i}", alt_lnl=-2.0, ref_lnl=-60.0)
        _split_frag(track, f"in{i}", alt_lnl=-60.0, ref_lnl=-2.0)
    gt, lh = _genotype(track)
    assert gt == DGT_HET, lh
    # hom must lose by a wide, quantified margin
    assert lh[DGT_HET] - lh[DGT_HOM] > 10.0, lh

    # pin the exact arithmetic against an independent recomputation of
    # the native mt_frag_lhood path (split branch): per read,
    #   ref_split = logsum(ln(1-1e-6) + ref_align, ln(1e-5))
    #   alt_split = logsum(ln(1-1e-5) + alt_align, ln(1e-6))
    # then the genotype mixture above.
    def logsum(a, b):
        m, n = max(a, b), min(a, b)
        return m + math.log1p(math.exp(n - m))

    expect = [0.0, 0.0, 0.0]
    for alt_align, ref_align in [(-2.0, -60.0)] * 8 + [(-60.0, -2.0)] * 8:
        ref_split = logsum(math.log(1 - 1e-6) + ref_align, math.log(1e-5))
        alt_split = logsum(math.log(1 - 1e-5) + alt_align, math.log(1e-6))
        for gt_i, f in enumerate((0.0, 0.5, 0.99)):
            ref_gt = ref_split + math.log(1 - f) if f < 1.0 else -math.inf
            alt_gt = alt_split + math.log(f) if f > 0.0 else -math.inf
            expect[gt_i] += logsum(ref_gt, alt_gt)
    np.testing.assert_allclose(lh, expect, rtol=1e-12)


def test_small_hom_dup_depth_ratio_breaks_tie_toward_hom():
    """Counterpoint pin: when junction evidence outnumbers clean
    interior evidence ~4:1 (deep coverage of a DUP long enough that
    most breakend-overlapping reads cross a junction), hom wins —
    the ambiguity is a property of the evidence mixture, not a hard
    bias in the model."""
    track = FragmentBank()
    for i in range(16):
        _split_frag(track, f"jx{i}", alt_lnl=-2.0, ref_lnl=-60.0)
    for i in range(4):
        _split_frag(track, f"in{i}", alt_lnl=-60.0, ref_lnl=-2.0)
    gt, lh = _genotype(track)
    assert gt == DGT_HET or gt == DGT_HOM
    # with a 4:1 ratio the het/hom gap must narrow vs the 1:1 case
    lh_even = [0.0] * DGT_SIZE
    even = FragmentBank()
    for i in range(8):
        _split_frag(even, f"jx{i}", alt_lnl=-2.0, ref_lnl=-60.0)
        _split_frag(even, f"in{i}", alt_lnl=-60.0, ref_lnl=-2.0)
    add_diploid_loglhood(1.0, even, lh_even)
    assert (lh[DGT_HET] - lh[DGT_HOM]) < (lh_even[DGT_HET]
                                          - lh_even[DGT_HOM])


# ---------------------------------------------------------------------------
# tandem-DUP genotype refinement (production default; the pins above
# cover the reference-parity model kept under dup_gt_model="reference")

def test_tandem_dup_fractions_recover_hom():
    """With the tandem-structure fractions (het 0.2, hom 1/3), the
    1:1 junction/interior mixture that the reference model miscalls
    het (pin above) genotypes hom — exactly the hom-DUP evidence
    signature, where the alt haplotype itself emits reference-junction
    fragments (scorer.py _DGT_ALT_FRACTION_TANDUP derivation)."""
    from manta_tpu.scoring.scorer import _DGT_ALT_FRACTION_TANDUP

    track = FragmentBank()
    for i in range(8):
        _split_frag(track, f"jx{i}", alt_lnl=-2.0, ref_lnl=-60.0)
        _split_frag(track, f"in{i}", alt_lnl=-60.0, ref_lnl=-2.0)
    lh = [0.0] * DGT_SIZE
    add_diploid_loglhood(1.0, track, lh,
                         fractions=_DGT_ALT_FRACTION_TANDUP)
    assert int(np.argmax(lh)) == DGT_HOM, lh

    # het signature: 1 alt junction locus per 4 ref loci
    track2 = FragmentBank()
    for i in range(4):
        _split_frag(track2, f"jx{i}", alt_lnl=-2.0, ref_lnl=-60.0)
    for i in range(16):
        _split_frag(track2, f"in{i}", alt_lnl=-60.0, ref_lnl=-2.0)
    lh2 = [0.0] * DGT_SIZE
    add_diploid_loglhood(1.0, track2, lh2,
                         fractions=_DGT_ALT_FRACTION_TANDUP)
    assert int(np.argmax(lh2)) == DGT_HET, lh2


def _depth_test_scorer(tmp_path, dup_beg, dup_end, interior_ratio,
                       chrom_len=20000, rate_per_bp=0.35):
    """A minimal scorer over a synthetic single-chromosome BAM whose
    read-start density is rate_per_bp outside [dup_beg, dup_end) and
    rate_per_bp * interior_ratio inside."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from batchutil import make_batch
    from manta_tpu.io.bam import BamReader, FLAG_PAIRED
    from manta_tpu.io.bamwriter import BamWriter
    from manta_tpu.scoring.scorer import SVScorer

    rng = np.random.default_rng(7)
    reads = []
    pos = 0
    k = 0
    while pos < chrom_len - 120:
        r = rate_per_bp * (interior_ratio
                           if dup_beg <= pos < dup_end else 1.0)
        step = max(1, int(rng.exponential(1.0 / r)))
        pos += step
        reads.append(dict(pos=pos, flag=FLAG_PAIRED, name=f"d{k}",
                          next_refid=0, next_pos=pos + 200, tlen=300))
        k += 1
    batch = make_batch(reads)
    bam = str(tmp_path / f"depth_{interior_ratio}.bam")
    w = BamWriter(bam, "@HD\tVN:1.6\n@SQ\tSN:chrT\tLN:%d\n" % chrom_len,
                  ["chrT"], [chrom_len])
    for i in range(batch.n):
        w.add_record(batch, i)
    w.close()

    scorer = SVScorer.__new__(SVScorer)
    scorer.readers = [BamReader(bam)]
    scorer.is_tumor = [False]

    class _Sc:
        chrom_lengths = [chrom_len]
    scorer.scanner = _Sc()
    return scorer


def _dup_sv(beg, end):
    sv = SVCandidate()
    sv.bp1.state = BND_LEFT_OPEN
    sv.bp2.state = BND_RIGHT_OPEN
    sv.bp1.interval.tid = sv.bp2.interval.tid = 0
    sv.bp1.interval.beg, sv.bp1.interval.end = beg, beg + 1
    sv.bp2.interval.beg, sv.bp2.interval.end = end, end + 1
    return sv


def test_dup_depth_loglhood_separates_genotypes(tmp_path):
    """Interior/flank read-start Poisson term: 2x interior favors hom,
    1.5x favors het, 1x favors ref."""
    beg, end = 8000, 12000
    for ratio, want in ((2.0, DGT_HOM), (1.5, DGT_HET), (1.0, DGT_REF)):
        scorer = _depth_test_scorer(tmp_path, beg, end, ratio)
        lh = scorer._dup_depth_loglhood(_dup_sv(beg, end), 0)
        assert int(np.argmax(lh)) == want, (ratio, lh)


def test_dup_depth_loglhood_skips_tiny_and_cross_chrom(tmp_path):
    scorer = _depth_test_scorer(tmp_path, 8000, 12000, 2.0)
    # interval too small for an interior window
    lh = scorer._dup_depth_loglhood(_dup_sv(8000, 8060), 0)
    assert lh == [0.0] * DGT_SIZE
    # breakends on different chromosomes
    sv = _dup_sv(8000, 12000)
    sv.bp2.interval.tid = 1
    assert scorer._dup_depth_loglhood(sv, 0) == [0.0] * DGT_SIZE


def test_dup_crossing_fragments_separate_small_hom_het(tmp_path):
    """Whole-DUP-crossing fragment channel: for a duplication smaller
    than the fragment size, hom produces ~zero normal-tlen crossing
    fragments (the dup haplotype would need a fragment spanning BOTH
    copies) while het keeps ~half the reference rate."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from batchutil import make_batch
    from manta_tpu.core.sizedist import SizeDistribution
    from manta_tpu.io.bam import BamReader, FLAG_PAIRED
    from manta_tpu.io.bamwriter import BamWriter
    from manta_tpu.scoring.scorer import SVScorer

    chrom_len = 20000
    beg, end = 9000, 9120                      # 120 bp DUP
    rng = np.random.default_rng(3)

    def build(crossing_frac):
        """Uniform 0.35/bp read starts; fragments ~N(300,30). A
        fraction of the fragments that WOULD cross [beg,end] keep
        normal tlen (ref haplotype); the rest are dropped (the dup
        haplotype contributes no normal crossing fragment)."""
        reads = []
        k = 0
        pos = 0
        while pos < chrom_len - 600:
            pos += max(1, int(rng.exponential(1 / 0.35)))
            frag = int(np.clip(rng.normal(300, 30), 210, 440))
            crosses = pos + 100 <= beg and pos + frag >= end + 30
            if crosses and rng.random() > crossing_frac:
                continue
            reads.append(dict(pos=pos, flag=FLAG_PAIRED, name=f"c{k}",
                              next_refid=0, next_pos=pos + frag - 100,
                              tlen=frag))
            k += 1
        batch = make_batch(reads)
        bam = str(tmp_path / f"cross_{crossing_frac}.bam")
        w = BamWriter(bam, "@HD\tVN:1.6\n@SQ\tSN:chrT\tLN:%d\n"
                      % chrom_len, ["chrT"], [chrom_len])
        for i in range(batch.n):
            w.add_record(batch, i)
        w.close()
        return bam

    frag_dist = SizeDistribution()
    frag_dist.add_observations(
        np.clip(rng.normal(300, 30, 20000), 210, 440).astype(int))

    class _St:
        proper_pair = (float(frag_dist.quantile(0.01)),
                       float(frag_dist.quantile(0.99)))

    results = {}
    for name, frac in (("het", 0.5), ("hom", 0.0), ("ref", 1.0)):
        scorer = SVScorer.__new__(SVScorer)
        scorer.readers = [BamReader(build(frac))]
        scorer.is_tumor = [False]

        class _Sc:
            chrom_lengths = [chrom_len]
            frag_dists = [frag_dist]
            stats = [_St()]
        scorer.scanner = _Sc()
        # the scorer halves the rate for fwd-only anchors; the
        # generator emits only the fwd mate, so present both halves
        rate = 0.70
        lh = scorer._dup_crossing_frag_loglhood(
            scorer.readers[0], 0, beg, end, rate, 0)
        results[name] = lh
    # the channel's production job is het-vs-hom at an already
    # confident non-ref site (ref-vs-nonref is decided by junction
    # evidence): hom truth must win outright, and het truth must
    # prefer het over hom by a wide margin
    assert int(np.argmax(results["hom"])) == DGT_HOM, results["hom"]
    assert results["het"][DGT_HET] - results["het"][DGT_HOM] > 5.0, \
        results["het"]
    assert results["ref"][DGT_REF] >= results["ref"][DGT_HOM], \
        results["ref"]
