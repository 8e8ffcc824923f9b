"""BAI (BAM index) parser and region query.

Implements the UCSC-style R-tree binning index from the SAM/BAM spec
(section 5): 5-level bins over 512Mb, 16kb linear index. Used for
region-restricted read fetches (reference analogue: htslib index lookup
behind bam_streamer::resetRegion, htsapi/bam_streamer.hpp:69-76).
"""

from __future__ import annotations

import struct

PSEUDO_BIN = 37450


def reg2bins(beg: int, end: int) -> list[int]:
    """All bins that may overlap 0-based half-open [beg, end)."""
    if beg >= end:
        return []
    end -= 1
    bins = [0]
    for shift, off in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(off + (beg >> shift), off + (end >> shift) + 1))
    return bins


class BaiIndex:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] != b"BAI\x01":
            raise ValueError(f"{path}: not a BAI index")
        (n_ref,) = struct.unpack_from("<i", data, 4)
        off = 8
        self.refs = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            bins: dict[int, list[tuple[int, int]]] = {}
            meta = None
            for _ in range(n_bin):
                b, n_chunk = struct.unpack_from("<Ii", data, off)
                off += 8
                chunks = list(
                    struct.unpack_from(f"<{2 * n_chunk}Q", data, off)
                )
                off += 16 * n_chunk
                pairs = [(chunks[i], chunks[i + 1]) for i in range(0, len(chunks), 2)]
                if b == PSEUDO_BIN:
                    meta = pairs
                else:
                    bins[b] = pairs
            (n_intv,) = struct.unpack_from("<i", data, off)
            off += 4
            ioff = struct.unpack_from(f"<{n_intv}Q", data, off)
            off += 8 * n_intv
            self.refs.append((bins, list(ioff), meta))

    def first_indexed_pos(self, tid: int) -> int:
        """Inclusive lower bound on read start positions for tid: a
        BGZF virtual offset of 0 is the file header, so a leading
        linear-index window with offset 0 cannot contain an alignment
        start. (Index writers that backfill leading windows with the
        first read's offset just make this bound conservative.)"""
        if tid < 0 or tid >= len(self.refs):
            return 0
        _, linear, _ = self.refs[tid]
        for i, off in enumerate(linear):
            if off != 0:
                return i << 14
        return len(linear) << 14

    def last_indexed_end(self, tid: int) -> int:
        """Exclusive upper bound on read start positions for tid: the
        16 kb linear index only extends to the window of the last
        indexed read, so no read starts at or beyond
        n_intv << 14. Lets scans skip declared-but-empty chromosome
        tails (e.g. a header that declares the full chromosome while
        the data covers a small region)."""
        if tid < 0 or tid >= len(self.refs):
            return 0
        _, linear, _ = self.refs[tid]
        return len(linear) << 14

    def query(self, tid: int, beg: int, end: int) -> list[tuple[int, int]]:
        """Merged (voffset_start, voffset_end) chunk list overlapping region."""
        if tid < 0 or tid >= len(self.refs):
            return []
        bins, linear, _ = self.refs[tid]
        min_off = 0
        if linear:
            w = min(beg >> 14, len(linear) - 1)
            min_off = linear[w]
        chunks = []
        for b in reg2bins(beg, end):
            for cb, ce in bins.get(b, ()):
                if ce > min_off:
                    chunks.append((max(cb, min_off), ce))
        chunks.sort()
        merged: list[tuple[int, int]] = []
        for cb, ce in chunks:
            if merged and cb <= merged[-1][1]:
                if ce > merged[-1][1]:
                    merged[-1] = (merged[-1][0], ce)
            else:
                merged.append((cb, ce))
        return merged
