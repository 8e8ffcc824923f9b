"""Assembler tests ported from the reference's IterativeAssemblerTest."""

from manta_tpu.assembly.assembler import (
    AssemblerOptions, _get_repeat_kmers, run_iterative_assembler,
)


def test_circle_detector():
    word_count = {w: 3 for w in
                  ["TACCA", "CCACC", "CACCA", "ACCAC", "CCACA", "CACAC",
                   "ACACA"]}
    word_count["AAAAA"] = 2
    repeats = _get_repeat_kmers(AssemblerOptions(), word_count)
    assert {"ACCAC", "CACCA", "CCACC"} <= repeats
    assert "TACCA" not in repeats and "CCACA" not in repeats
    assert {"CACAC", "ACACA"} <= repeats
    assert "AAAAA" in repeats  # homopolymer self-circle


def test_basic_assembler():
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=2)
    reads = ["ACGTGTATTACC", "GTGTATTACCTA", "ATTACCTAGTAC", "TACCTAGTACTC",
             "123456789123"]
    contigs, read_info = run_iterative_assembler(opt, reads)
    assert len(contigs) == 1
    assert contigs[0].seq == "GTGTATTACCTAGTAC"
    for i in range(4):
        assert read_info[i].is_used
        assert read_info[i].contig_ids[0] == 0
    assert not read_info[4].is_used


def test_iterative_kmer():
    opt = AssemblerOptions(min_word_length=3, max_word_length=9,
                           word_step_size=3, min_coverage=1)
    reads = ["ACACACACGATG", "GATGTCTCTCTC", "123456789123"]
    contigs, read_info = run_iterative_assembler(opt, reads)
    assert len(contigs) == 1
    assert contigs[0].seq == "ACACACACGATGTCTCTCTC"
    for i in range(2):
        assert read_info[i].is_used
        assert read_info[i].contig_ids[0] == 0
    assert not read_info[2].is_used


def test_branching_basic():
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=1, min_support_reads=1,
                           min_unused_reads=1)
    reads = ["ATATAGACGATG", "ACGATGTCTATCTT", "ACGATGTTGGCCTT"]
    contigs, read_info = run_iterative_assembler(opt, reads)
    assert len(contigs) == 2
    assert contigs[0].seq == "ATATAGACGATGTCTATCTT"
    assert contigs[1].seq == "ATATAGACGATGTTGGCCTT"
    assert read_info[0].is_used and read_info[0].contig_ids == [0, 1]
    assert read_info[1].is_used and read_info[1].contig_ids[0] == 0
    assert read_info[2].is_used and read_info[2].contig_ids[0] == 1


def test_branching_iterative():
    opt = AssemblerOptions(min_word_length=3, max_word_length=9,
                           word_step_size=3, min_coverage=1,
                           min_support_reads=1, min_unused_reads=1)
    reads = ["ACACACACGATG", "GATGGCCCCCCC", "GATGTCTCTCTC"]
    contigs, read_info = run_iterative_assembler(opt, reads)
    assert len(contigs) == 2
    assert contigs[0].seq == "ACACACACGATGGCCCCCCC"
    assert contigs[1].seq == "ACACACACGATGTCTCTCTC"
    assert read_info[0].is_used and read_info[0].contig_ids == [0, 1]
    assert read_info[1].is_used and read_info[1].contig_ids[0] == 0
