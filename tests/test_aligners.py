"""Golden alignment tests ported from the reference's aligner unit tests
(reference: alignment/test/GlobalAlignerTest.cpp,
GlobalJumpAlignerTest.cpp, GlobalLargeIndelAlignerTest.cpp)."""


from manta_tpu.align.aligners import (
    AlignmentScores, GlobalAligner, GlobalJumpAligner, GlobalLargeIndelAligner,
)
from manta_tpu.core.cigar import arrays_to_string


def cig(al):
    if not al.is_aligned:
        return ""
    return arrays_to_string(al.ops, al.lens)


def galign(seq, ref, off_edge=-4, edge_ins=False):
    scores = AlignmentScores(2, -4, -5, -1, off_edge, edge_ins)
    return GlobalAligner(scores).align(seq.encode(), ref.encode())


def jalign(seq, ref1, ref2):
    scores = AlignmentScores(2, -4, -5, -1, -1)
    return GlobalJumpAligner(scores, -3).align(
        seq.encode(), ref1.encode(), ref2.encode())


def jalign2(seq, ref1, ref2):
    scores = AlignmentScores(2, -4, -10, -1, -1)
    return GlobalJumpAligner(scores, -20).align(
        seq.encode(), ref1.encode(), ref2.encode())


class TestGlobalAligner:
    def test_basic(self):
        r = galign("D", "ABCDEF")
        assert cig(r.align) == "1=" and r.align.begin_pos == 3

    def test_delete(self):
        r = galign("BCDEFHIKLM", "ABCDEFGHIKLMN")
        assert cig(r.align) == "5=1D5=" and r.align.begin_pos == 1

    def test_insert(self):
        r = galign("BCDEFGXHIKLM", "ABCDEFGHIKLMN")
        assert cig(r.align) == "6=1I5=" and r.align.begin_pos == 1

    def test_insert_delete(self):
        r = galign("BBBBBBCDXYZHIKLMMMM", "ABBBBBBCDEFGHIKLMMMMN")
        assert cig(r.align) == "8=3I3D8=" and r.align.begin_pos == 1

    def test_insert_delete2(self):
        r = galign("BBBBBBCDEXYHIKLMMMM", "ABBBBBBCDEFGHIKLMMMMN")
        assert cig(r.align) == "9=2X8=" and r.align.begin_pos == 1

    def test_short_ref1(self):
        r = galign("ABCD", "BCD")
        assert cig(r.align) == "1S3=" and r.align.begin_pos == 0
        assert r.score == 2

    def test_short_ref2(self):
        r = galign("ABCD", "ABC")
        assert cig(r.align) == "3=1S" and r.align.begin_pos == 0
        assert r.score == 2

    def test_short_ref3(self):
        r = galign("ABCD", "B")
        assert cig(r.align) == "1S1=2S" and r.align.begin_pos == 0
        assert r.score == -10

    def test_left_shift_delete(self):
        r = galign("ABCDEFFFFFGHIJKL", "ABCDEFFFFFFGHIJKL")
        assert cig(r.align) == "5=1D11=" and r.align.begin_pos == 0

    def test_left_shift_insert(self):
        r = galign("ABCDEFFFFFFFGHIJKL", "ABCDEFFFFFFGHIJKL")
        assert cig(r.align) == "5=1I12=" and r.align.begin_pos == 0


class TestGlobalJumpAligner:
    def test_0(self):
        r = jalign("ABABACDCDC", "ABABA", "CDCDC")
        assert cig(r.align1) == "5=" and r.align1.begin_pos == 0
        assert cig(r.align2) == "5=" and r.align2.begin_pos == 0

    def test_1(self):
        r = jalign("ABABACDCDC", "ABABAX", "CDCDC")
        assert cig(r.align1) == "5=" and r.align1.begin_pos == 0
        assert cig(r.align2) == "5=" and r.align2.begin_pos == 0

    def test_2(self):
        r = jalign("ABABACDCDC", "ABABA", "XCDCDC")
        assert cig(r.align1) == "5=" and r.align1.begin_pos == 0
        assert cig(r.align2) == "5=" and r.align2.begin_pos == 1

    def test_long(self):
        r = jalign("ABABACDCDC", "dslfjfkjaslABABAlsjfkdsflsk",
                   "sdfldsklkjdCDCDCfsdlkjfslk")
        assert cig(r.align1) == "5=" and r.align1.begin_pos == 11
        assert cig(r.align2) == "5=" and r.align2.begin_pos == 11

    def test_simple_indels(self):
        r = jalign("ABABAABABACDCDCDyCDCDC", "xABABABABABAx", "xCDCDCDCDCDCDCx")
        assert cig(r.align1) == "5=1D5=" and r.align1.begin_pos == 1
        assert cig(r.align2) == "6=1I5=" and r.align2.begin_pos == 1

    def test_bp_insert(self):
        r = jalign("ABABABABABA1234CDCDCDCDCDC", "xABABABABABAx", "xCDCDCDCDCDCDCx")
        assert cig(r.align1) == "11=" and r.align1.begin_pos == 1
        assert cig(r.align2) == "11=" and r.align2.begin_pos == 1
        assert r.jump_insert_size == 4

    def test_bp_range(self):
        r = jalign("xyzxyzxyzABCABCABCxyzxyzxyz", "xyzxyzxyzxyzABCABCstustu",
                   "stustuABCABCxyzxyzxyzxyz")
        assert cig(r.align1) == "12=" and r.align1.begin_pos == 3
        assert cig(r.align2) == "15=" and r.align2.begin_pos == 6
        assert r.jump_insert_size == 0 and r.jump_range == 3

    def test_bp_range2(self):
        r = jalign("xyzxyzxyzABCABCABCxyzxyzxyz", "xyzxyzxyzxyzABCABCABCABCABC",
                   "ABCABCABCABCABCxyzxyzxyzxyz")
        assert cig(r.align1) == "9=" and r.align1.begin_pos == 3
        assert cig(r.align2) == "18=" and r.align2.begin_pos == 6
        assert r.jump_insert_size == 0 and r.jump_range == 9

    def test_insert(self):
        r = jalign("xyzxyzxyzABCABCABCABCABCABCxyzxyzxyz",
                   "xyzxyzxyzxyzABCABCstustu", "stustuABCABCxyzxyzxyzxyz")
        assert cig(r.align1) == "15=" and r.align1.begin_pos == 3
        assert cig(r.align2) == "15=" and r.align2.begin_pos == 6
        assert r.jump_insert_size == 6 and r.jump_range == 0

    def test_only1(self):
        r = jalign("ABABA", "xABABAx", "xCDCDCx")
        assert cig(r.align1) == "5=" and r.align1.begin_pos == 1
        assert cig(r.align2) == ""

    def test_only2(self):
        r = jalign("CDCDC", "xABABAx", "xCDCDCx")
        assert cig(r.align1) == ""
        assert cig(r.align2) == "5=" and r.align2.begin_pos == 1

    def test_off_edge(self):
        r = jalign("123456ABABACDCDC123456", "xABABAx", "xCDCDCx")
        assert cig(r.align1) == "5S1X5=" and r.align1.begin_pos == 0
        assert cig(r.align2) == "5=1X5S" and r.align2.begin_pos == 1

    def test_ref2_clip(self):
        r = jalign2("GGCAGAAAAGGAAATA", "TAAAAAGTAGAT", "AAAGGAAATA")
        assert cig(r.align1) == ""
        assert cig(r.align2) == "6S10=" and r.align2.begin_pos == 0
        assert r.jump_insert_size == 0 and r.jump_range == 0

    def test_ref1_clip(self):
        r = jalign2("TAAAAAGTAGATTTCGT", "TAAAAAGTAGAT", "AAAGGAAATA")
        assert cig(r.align1) == "12=5S" and r.align1.begin_pos == 0
        assert cig(r.align2) == ""
        assert r.jump_insert_size == 0 and r.jump_range == 0


class TestGlobalLargeIndelAligner:
    def lalign(self, seq, ref, indel_score=-10):
        scores = AlignmentScores(2, -4, -5, -1, -1)
        return GlobalLargeIndelAligner(scores, indel_score).align(
            seq.encode(), ref.encode())

    def test_large_delete(self):
        # a 40-base deletion: affine gap would cost open+40*extend=-45;
        # large-indel state costs flat -10
        seq = "ABCDEFGHIJ" + "KLMNOPQRST"
        ref = "ABCDEFGHIJ" + "x" * 40 + "KLMNOPQRST"
        r = self.lalign(seq, ref)
        assert cig(r.align) == "10=40D10="
        assert r.align.begin_pos == 0
        assert r.is_jumped
        assert r.score == 2 * 20 - 10

    def test_no_indel(self):
        r = self.lalign("ABCDEF", "xABCDEFx")
        assert cig(r.align) == "6=" and r.align.begin_pos == 1
        assert not r.is_jumped

    def test_small_delete_uses_affine(self):
        # 2-base deletion: affine cost -7 beats large-indel -10
        seq = "ABCDEFGHIJKLMNOPQR"
        ref = "ABCDEFGHIxxJKLMNOPQR"
        r = self.lalign(seq, ref)
        assert cig(r.align) == "9=2D9="
        assert not r.is_jumped
