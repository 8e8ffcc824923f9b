"""RNA intron (splice) jump aligner behavior."""


from manta_tpu.align.aligners import (
    AlignmentScores, GlobalJumpIntronAligner,
)

SCORES = AlignmentScores(2, -8, -12, -1, -1)


def _ops_str(al):
    sym = {0: "M", 1: "I", 2: "D", 3: "N", 4: "S", 7: "=", 8: "X"}
    return "".join(f"{l}{sym[int(o)]}"
                   for o, l in zip(al.ops.tolist(), al.lens.tolist()))


def test_spliced_alignment_uses_intron_state():
    exon1 = b"ACGTACGTACGTACGTACGT"
    exon2 = b"TTGACCAGATTGACCAGATG"
    intron = b"GT" + b"CCCCCCCCCCCCCCCC" + b"AG"  # GT...AG motif
    ref1 = exon1 + intron + exon2
    ref2 = b"GGGGGGGGGGGGGGGGGGGG"
    query = exon1 + exon2

    aln = GlobalJumpIntronAligner(SCORES, -100, -15, -1)
    res = aln.align(query, ref1, ref2, True, True, True, seqmatch=False)
    # all query bases matched, one intron skip; no jump to ref2
    assert not res.align2.is_aligned
    path = _ops_str(res.align1)
    assert "N" in path, path
    assert path == f"{len(exon1)}M{len(intron)}N{len(exon2)}M", path
    assert res.score == 2 * len(query) - 15

    # without the splice motif the same gap must be a deletion (costly)
    bad_intron = b"CA" + b"CCCCCCCCCCCCCCCC" + b"CA"
    res2 = aln.align(query, exon1 + bad_intron + exon2, ref2,
                     True, True, True, seqmatch=False)
    assert res2.score < res.score
    assert "N" not in _ops_str(res2.align1)


def test_unstranded_accepts_reverse_motif():
    exon1 = b"ACGTACGTACGTACGTACGT"
    exon2 = b"TTGACCAGATTGACCAGATG"
    intron_rev = b"CT" + b"GGGGGGGGGGGGGGGG" + b"AC"  # CT...AC (rev strand)
    ref1 = exon1 + intron_rev + exon2
    ref2 = b"TTTTTTTTTTTTTTTTTTTT"
    query = exon1 + exon2

    aln = GlobalJumpIntronAligner(SCORES, -100, -15, -1)
    # stranded fw: motif not recognized
    res_fw = aln.align(query, ref1, ref2, True, True, True, seqmatch=False)
    assert "N" not in _ops_str(res_fw.align1)
    # unstranded: recognized
    res_un = aln.align(query, ref1, ref2, True, True, False, seqmatch=False)
    assert "N" in _ops_str(res_un.align1)
    assert res_un.score == 2 * len(query) - 15


def test_jump_still_works_with_intron_state():
    ref1 = b"ACGTACGTACGTACGTACGTAAAA"
    ref2 = b"CCCCTTGACCAGATTGACCAGATG"
    query = b"ACGTACGTACGTACGTACGT" + b"TTGACCAGATTGACCAGATG"
    aln = GlobalJumpIntronAligner(SCORES, -10, -15, -1)
    res = aln.align(query, ref1, ref2, True, True, True, seqmatch=False)
    assert res.align1.is_aligned and res.align2.is_aligned
    assert res.align2.begin_pos == 4
    assert res.score == 2 * len(query) - 10
