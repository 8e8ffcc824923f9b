"""Core SV data model: genome intervals, breakends, candidates.

Behavioral parity with the reference's GenomeInterval
(svgraph/GenomeInterval.hpp), SVBreakend (manta/SVBreakend.hpp) and
SVCandidate/SVObservation (manta/SVCandidate.hpp).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# SVEvidenceType (reference: SVBreakend.hpp:35-48)
EV_PAIR, EV_LOCAL_PAIR, EV_CIGAR, EV_SOFTCLIP, EV_SEMIALIGN, EV_SHADOW, \
    EV_SPLIT_ALIGN, EV_UNKNOWN = range(8)
EV_SIZE = 8
EV_LABELS = ["pair", "local_pair", "cigar", "softclip", "semialign", "shadow",
             "split_align", "unknown"]

# SVBreakendState (reference: SVBreakend.hpp:147-155)
BND_UNKNOWN, BND_RIGHT_OPEN, BND_LEFT_OPEN, BND_COMPLEX = range(4)

# SourceOfSVEvidenceInDNAFragment
FRAG_UNKNOWN, FRAG_READ1, FRAG_READ2, FRAG_READ_PAIR = range(4)


@dataclass
class GenomeInterval:
    tid: int = 0
    beg: int = 0   # 0-based inclusive
    end: int = 0   # 0-based exclusive

    def is_intersect(self, o: "GenomeInterval") -> bool:
        return self.tid == o.tid and self.beg < o.end and o.beg < self.end

    def size(self) -> int:
        return max(0, self.end - self.beg)

    def merge(self, o: "GenomeInterval") -> None:
        assert self.tid == o.tid
        self.beg = min(self.beg, o.beg)
        self.end = max(self.end, o.end)

    def contains(self, o: "GenomeInterval") -> bool:
        return self.tid == o.tid and self.beg <= o.beg and self.end >= o.end

    def __lt__(self, o: "GenomeInterval"):
        if self.tid != o.tid:
            return self.tid < o.tid
        if self.beg != o.beg:
            return self.beg < o.beg
        return self.end < o.end

    def copy(self) -> "GenomeInterval":
        return GenomeInterval(self.tid, self.beg, self.end)

    def __repr__(self):
        return f"GenomeInterval(tid={self.tid}:[{self.beg},{self.end}))"


@dataclass
class SVBreakend:
    interval: GenomeInterval = field(default_factory=GenomeInterval)
    state: int = BND_UNKNOWN
    evidence: np.ndarray = field(default_factory=lambda: np.zeros(EV_SIZE, np.int32))

    def add_evidence(self, i: int, count: int = 1):
        self.evidence[i] += count

    def get_pair_count(self) -> int:
        return int(self.evidence[EV_PAIR])

    def get_local_pair_count(self) -> int:
        return int(self.evidence[EV_LOCAL_PAIR])

    def get_any_non_pair_count(self) -> int:
        s = int(self.evidence.sum())
        return s - int(self.evidence[EV_PAIR]) - int(self.evidence[EV_LOCAL_PAIR]) \
            - int(self.evidence[EV_UNKNOWN])

    def get_spanning_count(self) -> int:
        return int(self.evidence[EV_PAIR] + self.evidence[EV_CIGAR]
                   + self.evidence[EV_SPLIT_ALIGN])

    def is_intersect(self, o: "SVBreakend") -> bool:
        if self.state != o.state:
            return False
        if self.state == BND_UNKNOWN:
            return True
        return self.interval.is_intersect(o.interval)

    def merge(self, o: "SVBreakend", expand_region: bool) -> bool:
        if not self.is_intersect(o):
            return False
        if expand_region:
            self.interval.merge(o.interval)
        self.evidence += o.evidence
        return True

    def left_side_of_bkpt_adjustment(self) -> int:
        return -1 if self.state == BND_LEFT_OPEN else 0

    def copy(self) -> "SVBreakend":
        return SVBreakend(self.interval.copy(), self.state, self.evidence.copy())


@dataclass
class SVCandidate:
    bp1: SVBreakend = field(default_factory=SVBreakend)
    bp2: SVBreakend = field(default_factory=SVBreakend)
    is_imprecise: bool = True
    # refined (assembly) fields, populated during candidate refinement:
    insert_seq: str = ""
    candidate_index: int = 0
    assembly_align_index: int = 0
    assembly_segment_index: int = 0
    is_unknown_size_insertion: bool = False
    unknown_size_insertion_left_seq: str = ""
    unknown_size_insertion_right_seq: str = ""
    forward_transcript_strand_read_count: int = 0
    reverse_transcript_strand_read_count: int = 0
    # insertAlignment/CIGAR of contig alignment for small indels
    insert_alignment: tuple | None = None

    def is_intersect(self, o: "SVCandidate") -> bool:
        return (self.bp1.is_intersect(o.bp1) and self.bp2.is_intersect(o.bp2)) or \
               (self.bp1.is_intersect(o.bp2) and self.bp2.is_intersect(o.bp1))

    def is_intersect_1to1(self, o: "SVCandidate") -> bool:
        return self.bp1.is_intersect(o.bp1) and self.bp2.is_intersect(o.bp2)

    def merge(self, o: "SVCandidate", expand_region: bool = True) -> bool:
        if not self.is_intersect(o):
            return False
        if self.bp1.is_intersect(o.bp1) and self.bp2.is_intersect(o.bp2):
            b1, b2 = o.bp1, o.bp2
        else:
            b1, b2 = o.bp2, o.bp1
        self.bp1.merge(b1, expand_region)
        self.bp2.merge(b2, expand_region)
        self.forward_transcript_strand_read_count += o.forward_transcript_strand_read_count
        self.reverse_transcript_strand_read_count += o.reverse_transcript_strand_read_count
        return True

    def is_forward_strand(self) -> bool:
        return self.forward_transcript_strand_read_count > \
            self.reverse_transcript_strand_read_count

    def is_transcript_strand_known(self) -> bool:
        fw, rv = (self.forward_transcript_strand_read_count,
                  self.reverse_transcript_strand_read_count)
        return (fw + rv >= 2) and (fw == 0 or rv == 0)

    def copy(self) -> "SVCandidate":
        c = SVCandidate(self.bp1.copy(), self.bp2.copy(), self.is_imprecise)
        c.insert_seq = self.insert_seq
        c.candidate_index = self.candidate_index
        c.is_unknown_size_insertion = self.is_unknown_size_insertion
        c.unknown_size_insertion_left_seq = self.unknown_size_insertion_left_seq
        c.unknown_size_insertion_right_seq = self.unknown_size_insertion_right_seq
        c.forward_transcript_strand_read_count = self.forward_transcript_strand_read_count
        c.reverse_transcript_strand_read_count = self.reverse_transcript_strand_read_count
        c.insert_alignment = self.insert_alignment
        return c


def is_complex_sv(cand: SVCandidate) -> bool:
    return cand.bp1.state == BND_COMPLEX and cand.bp2.state == BND_UNKNOWN


@dataclass
class SVObservation(SVCandidate):
    ev_type: int = EV_UNKNOWN
    frag_source: int = FRAG_UNKNOWN

    def is_single_read_source(self) -> bool:
        return self.frag_source in (FRAG_READ1, FRAG_READ2)

    def is_read1_source(self) -> bool:
        return self.frag_source == FRAG_READ1
