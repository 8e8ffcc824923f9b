"""BAM output: record encoding, sorted writing, BAI indexing.

Native replacement for the reference's evidence-BAM output stack
(reference: htsapi/bam_dumper.hpp + SynchronizedBamWriter.hpp for
writing, redist samtools sort/merge/index tasks in mantaWorkflow.py:331-346
and :441-460 for sort/merge/index). Records are buffered as
struct-of-arrays (batch, row-index) references, batch-encoded to raw
alignment blocks by the native core at close (mt_bam_encode,
native/manta_core.cpp), position-sorted, and indexed with the same
R-tree binning used by the tabix writer (format/tabix.py).
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
    the leading block_size). Pure-Python reference implementation; the
    production path is the native batch encoder (_encode_group)."""
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


def _encode_group(batch, idx_list, extras):
    """Batch-encode rows `idx_list` of `batch` (with per-row extra tag
    blobs) into one contiguous buffer of length-prefixed alignment
    blocks via the native core. Returns (blob u8[], out_off i64[n+1],
    end i32[n])."""
    import ctypes
    from .._native import get_lib, i32p, i64p, u8p, u16p, u32p
    lib = get_lib()
    n = len(idx_list)
    idx = np.asarray(idx_list, np.int64)
    lname = batch.name_off[idx + 1] - batch.name_off[idx]
    ncig = batch.cigar_off[idx + 1] - batch.cigar_off[idx]
    lseq = batch.seq_off[idx + 1] - batch.seq_off[idx]
    ltag = batch.tag_off[idx + 1] - batch.tag_off[idx]
    extra_off = np.zeros(n + 1, np.int64)
    np.cumsum([len(e) for e in extras], out=extra_off[1:])
    extra = np.frombuffer(b"".join(extras), np.uint8)
    sizes = (4 + 32 + lname + 1 + 4 * ncig + (lseq + 1) // 2 + lseq +
             ltag + (extra_off[1:] - extra_off[:-1]))
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=out_off[1:])
    out = np.empty(int(out_off[-1]), np.uint8)
    out_end = np.empty(n, np.int32)
    tags = np.frombuffer(batch.tags, np.uint8)

    def p(a, t):
        return a.ctypes.data_as(t)

    rc = lib.mt_bam_encode(
        n, p(idx, i64p),
        p(batch.refid, i32p), p(batch.pos, i32p), p(batch.mapq, u8p),
        p(batch.flag, u16p), p(batch.next_refid, i32p),
        p(batch.next_pos, i32p), p(batch.tlen, i32p),
        p(batch.name_off, i64p), p(batch.name, u8p),
        p(batch.cigar_off, i64p), p(batch.cigar, u32p),
        p(batch.seq_off, i64p), p(batch.seq, u8p),
        p(batch.qual_off, i64p), p(batch.qual, u8p),
        p(batch.tag_off, i64p), p(tags, u8p),
        p(extra_off, i64p), p(extra, u8p),
        p(out_off, i64p), p(out, u8p), p(out_end, i32p))
    assert rc == 0, "mt_bam_encode failed"
    return out, out_off, out_end


class BamWriter:
    """Buffered, sorted BAM writer with BAI index output.

    add_record() only banks a (batch, row) reference; encoding happens
    in one native pass per source batch at close()."""

    def __init__(self, path: str, header_text: str, ref_names: list[str],
                 ref_lengths: list[int]):
        self.path = path
        self.header_text = header_text
        self.ref_names = ref_names
        self.ref_lengths = ref_lengths
        # groups of consecutive adds from the same source batch:
        # [batch, [row indices], [extra tag blobs]]
        self._groups: list[list] = []

    def add_record(self, batch, i: int, extra_tags: bytes = b""):
        g = self._groups
        if not g or g[-1][0] is not batch:
            g.append([batch, [], []])
        g[-1][1].append(i)
        g[-1][2].append(extra_tags)

    def close(self):
        # encode every group natively, then globally position-sort
        blobs = []
        tid_all, pos_all, end_all, gid_all, off0_all, off1_all = \
            [], [], [], [], [], []
        for gi, (batch, idx_list, extras) in enumerate(self._groups):
            blob, out_off, out_end = _encode_group(batch, idx_list, extras)
            blobs.append(memoryview(blob))
            idx = np.asarray(idx_list, np.int64)
            tid_all.append(batch.refid[idx].astype(np.int64))
            pos_all.append(batch.pos[idx].astype(np.int64))
            end_all.append(out_end.astype(np.int64))
            gid_all.append(np.full(len(idx), gi, np.int64))
            off0_all.append(out_off[:-1])
            off1_all.append(out_off[1:])
        self._groups = []
        if blobs:
            tid = np.concatenate(tid_all)
            pos = np.concatenate(pos_all)
            end = np.concatenate(end_all)
            gid = np.concatenate(gid_all)
            off0 = np.concatenate(off0_all)
            off1 = np.concatenate(off1_all)
            # unmapped (tid<0) records sort last, as in samtools sort
            order = np.lexsort((pos, np.where(tid < 0, 1 << 30, tid)))
        else:
            order = np.empty(0, np.int64)
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
            for r in order.tolist():
                vbeg = wr.tell_virtual()
                wr.write(blobs[gid[r]][off0[r]:off1[r]])
                vend = wr.tell_virtual()
                t = int(tid[r])
                if t < 0:
                    continue
                p, e = int(pos[r]), int(end[r])
                bin_ = reg2bin(p, e)
                rbins = bins.setdefault(t, {})
                chunks = rbins.setdefault(bin_, [])
                if chunks and chunks[-1][1] == vbeg:
                    chunks[-1] = (chunks[-1][0], vend)
                else:
                    chunks.append((vbeg, vend))
                lin = linear.setdefault(t, {})
                for w in range(p >> 14, ((e - 1) >> 14) + 1):
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
