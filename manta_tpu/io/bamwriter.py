"""BAM output: record encoding, sorted writing, BAI indexing.

Native replacement for the reference's evidence-BAM output stack
(reference: htsapi/bam_dumper.hpp + SynchronizedBamWriter.hpp for
writing, redist samtools sort/index tasks in mantaWorkflow.py:331-346
and :441-460 for sort/merge/index). Records are re-encoded from the
struct-of-arrays ReadBatch (io/bam.py), buffered, position-sorted at
close, and indexed with the same R-tree binning used by the tabix
writer (format/tabix.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .bgzf import BgzfWriter

# 4-bit base codes: "=ACMGRSVTWYHKDBN"
_NIB = np.full(256, 15, np.uint8)
for _i, _b in enumerate(b"=ACMGRSVTWYHKDBN"):
    _NIB[_b] = _i
    _NIB[ord(chr(_b).lower())] = _i


def reg2bin(beg: int, end: int) -> int:
    from ..format.tabix import reg2bin as _r
    return _r(beg, end)


def encode_record(batch, i: int, extra_tags: bytes = b"") -> bytes:
    """Encode one ReadBatch row as a raw BAM alignment block (without
    the leading block_size)."""
    name = batch.name[batch.name_off[i]:batch.name_off[i + 1]].tobytes()
    cigar = batch.cigar[batch.cigar_off[i]:batch.cigar_off[i + 1]]
    seq = batch.seq[batch.seq_off[i]:batch.seq_off[i + 1]]
    qual = batch.qual[batch.qual_off[i]:batch.qual_off[i + 1]]
    tags = batch.tags[batch.tag_off[i]:batch.tag_off[i + 1]]

    l_seq = len(seq)
    pos = int(batch.pos[i])
    # reference span from cigar for the index bin
    ref_len = 0
    for c in cigar.tolist():
        op = c & 0xF
        if op in (0, 2, 3, 7, 8):  # M D N = X
            ref_len += c >> 4
    end = pos + max(ref_len, 1)

    nib = _NIB[seq]
    packed = np.zeros((l_seq + 1) // 2, np.uint8)
    packed |= nib[0::2] << 4
    if l_seq > 1:
        packed[:l_seq // 2] |= nib[1::2]

    head = struct.pack(
        "<iiBBHHHiiii",
        int(batch.refid[i]), pos,
        len(name) + 1, int(batch.mapq[i]), reg2bin(pos, end),
        len(cigar), int(batch.flag[i]), l_seq,
        int(batch.next_refid[i]), int(batch.next_pos[i]),
        int(batch.tlen[i]))
    return (head + name + b"\x00" + cigar.astype("<u4").tobytes() +
            packed.tobytes() + qual.tobytes() + tags + extra_tags)


class BamWriter:
    """Buffered, sorted BAM writer with BAI index output."""

    def __init__(self, path: str, header_text: str, ref_names: list[str],
                 ref_lengths: list[int]):
        self.path = path
        self.header_text = header_text
        self.ref_names = ref_names
        self.ref_lengths = ref_lengths
        self._records: list[tuple[int, int, bytes]] = []

    def add_record(self, batch, i: int, extra_tags: bytes = b""):
        cigar = batch.cigar[batch.cigar_off[i]:batch.cigar_off[i + 1]]
        ref_len = 0
        for c in cigar.tolist():
            if (c & 0xF) in (0, 2, 3, 7, 8):
                ref_len += c >> 4
        pos = int(batch.pos[i])
        self._records.append((int(batch.refid[i]), pos,
                              pos + max(ref_len, 1),
                              encode_record(batch, i, extra_tags)))

    def close(self):
        self._records.sort(key=lambda r: (r[0] if r[0] >= 0 else 1 << 30,
                                          r[1]))
        # bins per ref for the BAI
        bins: dict[int, dict[int, list[tuple[int, int]]]] = {}
        linear: dict[int, dict[int, int]] = {}
        with open(self.path, "wb") as f:
            wr = BgzfWriter(f)
            text = self.header_text.encode()
            wr.write(b"BAM\x01" + struct.pack("<i", len(text)) + text)
            wr.write(struct.pack("<i", len(self.ref_names)))
            for name, length in zip(self.ref_names, self.ref_lengths):
                nb = name.encode() + b"\x00"
                wr.write(struct.pack("<i", len(nb)) + nb +
                         struct.pack("<i", length))
            for tid, pos, end, rec in self._records:
                vbeg = wr.tell_virtual()
                wr.write(struct.pack("<i", len(rec)) + rec)
                vend = wr.tell_virtual()
                if tid < 0:
                    continue
                bin_ = struct.unpack_from("<H", rec, 10)[0]
                rbins = bins.setdefault(tid, {})
                chunks = rbins.setdefault(bin_, [])
                if chunks and chunks[-1][1] == vbeg:
                    chunks[-1] = (chunks[-1][0], vend)
                else:
                    chunks.append((vbeg, vend))
                lin = linear.setdefault(tid, {})
                for w in range(pos >> 14, ((end - 1) >> 14) + 1):
                    if w not in lin or vbeg < lin[w]:
                        lin[w] = vbeg
            wr.close()
        self._write_bai(bins, linear)

    def _write_bai(self, bins, linear):
        out = bytearray(b"BAI\x01")
        out += struct.pack("<i", len(self.ref_names))
        for tid in range(len(self.ref_names)):
            rbins = bins.get(tid, {})
            out += struct.pack("<i", len(rbins))
            for b in sorted(rbins):
                chunks = rbins[b]
                out += struct.pack("<Ii", b, len(chunks))
                for vb, ve in chunks:
                    out += struct.pack("<QQ", vb, ve)
            lin = linear.get(tid, {})
            n_intv = (max(lin) + 1) if lin else 0
            out += struct.pack("<i", n_intv)
            prev = 0
            for w in range(n_intv):
                if w in lin:
                    prev = lin[w]
                out += struct.pack("<Q", prev)
        with open(self.path + ".bai", "wb") as f:
            f.write(bytes(out))
