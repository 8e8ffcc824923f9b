"""Native assembler (mt_assemble) parity against the Python
implementation, which is the behavioral source of truth
(reference: src/c++/lib/assembly/IterativeAssembler.cpp)."""

import numpy as np

from manta_tpu.assembly.assembler import (
    AssemblerOptions, _run_native_assembler, _run_python_assembler,
)


def _cmp(opt, reads):
    cn, rin = _run_native_assembler(opt, list(reads))
    cp, rip = _run_python_assembler(opt, list(reads))
    assert [(c.seq, sorted(c.support_reads), c.conservative_beg,
             c.conservative_end) for c in cn] == \
           [(c.seq, sorted(c.support_reads), c.conservative_beg,
             c.conservative_end) for c in cp]
    assert [(a.is_used, a.contig_ids, a.is_pseudo) for a in rin] == \
           [(a.is_used, a.contig_ids, a.is_pseudo) for a in rip]
    return cn


def test_basic_contig():
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=1, min_support_reads=1,
                           min_unused_reads=1)
    contigs = _cmp(opt, ["ACGTGTATTACC", "GTGTATTACCTA",
                         "ATTACCTAGTAC", "TACCTAGTACTC"])
    assert contigs[0].seq == "ACGTGTATTACCTAGTACTC"


def test_repeat_rollover_and_homopolymer():
    # homopolymer and tandem-repeat reads force the repeat path and the
    # word-size iteration with pseudo-read rollover
    opt = AssemblerOptions(min_word_length=6, max_word_length=16,
                           word_step_size=5, min_coverage=1,
                           min_support_reads=1, min_unused_reads=1)
    reads = [
        "AAAAAAAAAAAAAAAAAAAAAAAA",
        "ACACACACACACACACACACAC",
        "ACGTGTATTACCTAGT",
        "GTGTATTACCTAGTAC",
        "TATTACCTAGTACTCG",
    ]
    _cmp(opt, reads)


def test_n_bases_skipped():
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=1, min_support_reads=1,
                           min_unused_reads=1)
    _cmp(opt, ["ACGTGTNTTACC", "GTGTATTACCTA", "ATTACCTAGTAC",
               "NNNNNNNNNNNN", "TACCTAGTACTC"])


def test_randomized_parity():
    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    for trial in range(40):
        # a random "genome" with embedded repeats; reads sampled with
        # errors and occasional Ns
        glen = int(rng.integers(60, 200))
        genome = "".join(rng.choice(bases, glen))
        if trial % 3 == 0:
            rep = genome[10:10 + int(rng.integers(8, 20))]
            genome = genome[:40] + rep * int(rng.integers(2, 4)) + \
                genome[40:]
        n_reads = int(rng.integers(4, 24))
        reads = []
        for _ in range(n_reads):
            rl = int(rng.integers(10, min(40, len(genome))))
            p = int(rng.integers(0, len(genome) - rl + 1))
            rd = list(genome[p:p + rl])
            for k in range(len(rd)):
                r = rng.random()
                if r < 0.02:
                    rd[k] = str(rng.choice(bases))
                elif r < 0.03:
                    rd[k] = "N"
            reads.append("".join(rd))
        opt = AssemblerOptions(
            min_word_length=int(rng.integers(5, 9)),
            max_word_length=int(rng.integers(12, 22)),
            word_step_size=int(rng.integers(3, 6)),
            min_coverage=int(rng.integers(1, 3)),
            min_support_reads=int(rng.integers(1, 3)),
            min_unused_reads=int(rng.integers(1, 3)),
            max_assembly_count=int(rng.integers(2, 6)))
        _cmp(opt, reads)


def test_production_word_sizes():
    # default 41..76 step 5 on longer synthetic reads
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    genome = "".join(rng.choice(bases, 600))
    reads = []
    for _ in range(30):
        p = int(rng.integers(0, 500))
        reads.append(genome[p:p + 100])
    contigs = _cmp(AssemblerOptions(), reads)
    assert contigs and len(contigs[0].seq) >= 100
