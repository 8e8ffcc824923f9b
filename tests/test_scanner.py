"""Evidence-scanner tests, mirroring the reference's SVLocusScannerTest
scenarios: indel candidates, SA split candidates, anomalous pairs,
semi-aligned edges, and the fast pre-filter."""

import numpy as np
import pytest

from batchutil import encode_tag, make_batch
from manta_tpu.core.sizedist import SizeDistribution
from manta_tpu.core.svmodel import (
    BND_COMPLEX, BND_LEFT_OPEN, BND_RIGHT_OPEN, EV_CIGAR, EV_LOCAL_PAIR,
    EV_SEMIALIGN, EV_SPLIT_ALIGN,
)
from manta_tpu.io.bam import FLAG_MATE_REVERSE, FLAG_PAIRED
from manta_tpu.scan.scanner import ScannerOptions, SVScanner


@pytest.fixture
def scanner():
    dist = SizeDistribution()
    # tight fragment distribution around 250
    for s in range(200, 301):
        dist.add_observation(s, 10)
    opt = ScannerOptions()
    return SVScanner(opt, [dist], [1000000, 500000], ["chr1", "chr2"])


def _ref(n=400):
    # reads in these tests use all-C sequences; provide a matching ref
    return np.frombuffer(b"C" * n, np.uint8), 0


def test_indel_candidates_deletion(scanner):
    b = make_batch([{"pos": 100, "cigar": "50M40D50M", "seq": "C" * 100}])
    cands, ev = scanner.get_read_breakends(b, 0, 0, *_ref())
    assert ev == (100, 240)
    assert len(cands) == 1
    c = cands[0]
    assert c.ev_type == EV_CIGAR
    assert c.bp1.state == BND_RIGHT_OPEN and c.bp2.state == BND_LEFT_OPEN
    # breakends centered at 150 and 190 with +-20 pad
    assert (c.bp1.interval.beg, c.bp1.interval.end) == (130, 170)
    assert (c.bp2.interval.beg, c.bp2.interval.end) == (170, 210)


def test_indel_candidates_small_ignored(scanner):
    b = make_batch([{"pos": 100, "cigar": "50M5D50M", "seq": "C" * 100}])
    cands, _ = scanner.get_read_breakends(b, 0, 0, *_ref())
    assert not cands


def test_indel_candidates_insertion_complex(scanner):
    b = make_batch([{"pos": 100, "cigar": "50M20I30M", "seq": "C" * 100}])
    cands, _ = scanner.get_read_breakends(b, 0, 0, *_ref())
    assert len(cands) == 1
    assert cands[0].bp1.state == BND_RIGHT_OPEN  # mid-read insert: precise pair
    assert (cands[0].bp1.interval.beg, cands[0].bp1.interval.end) == (130, 170)


def test_swap_candidate(scanner):
    b = make_batch([{"pos": 100, "cigar": "40M10I10D50M", "seq": "C" * 100}])
    cands, _ = scanner.get_read_breakends(b, 0, 0, *_ref())
    assert len(cands) == 1
    assert (cands[0].bp1.interval.beg, cands[0].bp1.interval.end) == (120, 160)
    assert (cands[0].bp2.interval.beg, cands[0].bp2.interval.end) == (130, 170)


def test_sa_split_candidate(scanner):
    tags = encode_tag(b"SA", "Z", "chr2,1000,+,50S50M,60,0;")
    b = make_batch([{
        "pos": 100, "cigar": "50M50S", "seq": "C" * 100, "tags": tags,
    }])
    cands, _ = scanner.get_read_breakends(b, 0, 0, *_ref())
    assert len(cands) == 1
    c = cands[0]
    assert c.ev_type == EV_SPLIT_ALIGN
    # local: trail clip > lead clip -> RIGHT_OPEN at pos+50=150
    assert c.bp1.state == BND_RIGHT_OPEN
    assert (c.bp1.interval.beg, c.bp1.interval.end) == (130, 170)
    # remote: lead clip 50 > 0 -> LEFT_OPEN at 999
    assert c.bp2.state == BND_LEFT_OPEN
    assert c.bp2.interval.tid == 1
    assert (c.bp2.interval.beg, c.bp2.interval.end) == (979, 1019)


def test_sa_low_mapq_filtered(scanner):
    tags = encode_tag(b"SA", "Z", "chr2,1000,+,50S50M,10,0;")
    b = make_batch([{"pos": 100, "cigar": "50M50S", "seq": "C" * 100, "tags": tags}])
    cands, _ = scanner.get_read_breakends(b, 0, 0, *_ref())
    assert not cands


def test_sa_multi_segment_skipped(scanner):
    tags = encode_tag(b"SA", "Z", "chr2,1000,+,50S50M,60,0;chr2,2000,+,50S50M,60,0;")
    b = make_batch([{"pos": 100, "cigar": "50M50S", "seq": "C" * 100, "tags": tags}])
    cands, _ = scanner.get_read_breakends(b, 0, 0, *_ref())
    assert not cands


def test_anomalous_pair_distant(scanner):
    # innie pair with fragment far over proper-pair max (300*1.5)
    flag = FLAG_PAIRED | FLAG_MATE_REVERSE
    b = make_batch([{
        "pos": 1000, "flag": flag, "next_refid": 0, "next_pos": 51000,
        "tlen": 50100, "seq": "C" * 100,
    }])
    refarr = np.frombuffer(b"C" * 200, np.uint8)
    cands, _ = scanner.get_read_breakends(b, 0, 0, refarr, 1000)
    pair = [c for c in cands if c.ev_type == EV_LOCAL_PAIR]
    assert len(pair) == 1
    c = pair[0]
    assert c.bp1.state == BND_RIGHT_OPEN
    assert c.bp1.interval.beg == 1100  # read end
    assert c.bp2.state == BND_LEFT_OPEN
    assert c.bp2.interval.end == 51000
    # breakend size: large event scale ramps; fragment 50100 > 10x300 ->
    # scale 1 -> maxFrag = q(0.9) of dist
    assert c.bp1.interval.end > c.bp1.interval.beg


def test_proper_pair_not_anomalous(scanner):
    flag = FLAG_PAIRED | FLAG_MATE_REVERSE
    b = make_batch([{
        "pos": 1000, "flag": flag, "next_refid": 0, "next_pos": 1150,
        "tlen": 250, "seq": "C" * 100,
    }])
    refarr = np.frombuffer(b"C" * 400, np.uint8)
    cands, _ = scanner.get_read_breakends(b, 0, 0, refarr, 1000)
    assert not [c for c in cands if c.ev_type == EV_LOCAL_PAIR]


def test_semi_aligned_candidate(scanner):
    # read mismatches ref over its leading 10 bases
    ref = b"G" * 300
    seq = "T" * 10 + "G" * 90
    b = make_batch([{"pos": 100, "cigar": "100M", "seq": seq, "qual": 30}])
    cands, _ = scanner.get_read_breakends(
        b, 0, 0, np.frombuffer(ref, np.uint8), 0)
    semi = [c for c in cands if c.ev_type == EV_SEMIALIGN]
    assert len(semi) == 1
    assert semi[0].bp1.state == BND_COMPLEX
    # leading poor-alignment ends at ref pos 110
    assert (semi[0].bp1.interval.beg, semi[0].bp1.interval.end) == (90, 130)


def test_semi_aligned_low_quality_gated(scanner):
    ref = b"G" * 300
    seq = "T" * 10 + "G" * 90
    b = make_batch([{"pos": 100, "cigar": "100M", "seq": seq, "qual": 10}])
    cands, _ = scanner.get_read_breakends(
        b, 0, 0, np.frombuffer(ref, np.uint8), 0)
    assert not [c for c in cands if c.ev_type == EV_SEMIALIGN]


def test_sv_evidence_mask(scanner):
    ref = np.frombuffer(b"C" * 400, np.uint8)
    flag = FLAG_PAIRED | FLAG_MATE_REVERSE
    b = make_batch([
        # normal proper read: no evidence
        {"pos": 100, "flag": flag, "next_refid": 0, "next_pos": 250,
         "tlen": 250, "seq": "C" * 100},
        # large indel
        {"pos": 100, "flag": flag, "next_refid": 0, "next_pos": 250,
         "tlen": 250, "cigar": "50M40D50M", "seq": "C" * 100},
        # distant pair
        {"pos": 100, "flag": flag, "next_refid": 0, "next_pos": 50100,
         "tlen": 50100, "seq": "C" * 100},
    ])
    mask = scanner.sv_evidence_mask(b, 0, ref, 100)
    assert mask.tolist() == [False, True, True]


def test_loci_data_weights(scanner):
    # spanning deletion read: internal-read-event weight 3 on both nodes
    b = make_batch([{"pos": 100, "cigar": "50M40D50M", "seq": "C" * 100}])
    data = scanner.get_read_loci_data(b, 0, 0, *_ref())
    assert len(data) == 1
    bp1, bp2, w1, w2, ev_range, is_complex = data[0]
    assert not is_complex and w1 == 3 and w2 == 3
    assert ev_range == (100, 240)
    # close anomalous innie pair: weight 1
    flag = FLAG_PAIRED | FLAG_MATE_REVERSE
    b2 = make_batch([{
        "pos": 1000, "flag": flag, "next_refid": 0, "next_pos": 1500,
        "tlen": 600, "seq": "C" * 100,
    }])
    refarr = np.frombuffer(b"C" * 1000, np.uint8)
    data2 = scanner.get_read_loci_data(b2, 0, 0, refarr, 1000)
    pairdata = [d for d in data2 if d[0].get_local_pair_count()]
    assert len(pairdata) == 1
    assert pairdata[0][2] == 1  # close pair weight
    assert pairdata[0][3] == 0  # no remote evidence without mate record


def test_mate_align_stats_batch_parity():
    """Native mt_mate_align_stats == get_mate_alignment-derived values
    for MC-present (clipped/indel cigars) and MC-absent reads."""
    from batchutil import encode_tag, make_batch

    from manta_tpu.core import cigar as cg
    from manta_tpu.scan.scanner import (
        get_mate_alignment, mate_align_stats_batch,
    )

    reads = [
        dict(seq="A" * 100, next_refid=0, next_pos=500,
             tags=encode_tag(b"MC", "Z", "10S80M10S")),
        dict(seq="A" * 100, next_refid=1, next_pos=900,
             tags=encode_tag(b"MC", "Z", "5H20S70M2I3M")),
        dict(seq="A" * 151, next_refid=0, next_pos=700,
             tags=encode_tag(b"MC", "Z", "60M1000N40M51S")),
        dict(seq="A" * 76, next_refid=0, next_pos=10),  # no MC: faked match
        dict(seq="A" * 100, next_refid=0, next_pos=10,
             tags=encode_tag(b"NM", "i", 3)),  # other tag only
    ]
    batch = make_batch(reads)
    ref_len, read_len, un_pre, un_suf = mate_align_stats_batch(batch)
    for i in range(batch.n):
        mal = get_mate_alignment(batch, i)
        assert ref_len[i] == mal.ref_length, i
        assert read_len[i] == mal.read_length, i
        assert un_pre[i] == cg.unaligned_prefix_size(mal.ops, mal.lens), i
        assert un_suf[i] == cg.unaligned_suffix_size(mal.ops, mal.lens), i
