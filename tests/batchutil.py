"""Synthetic ReadBatch construction for hermetic tests.

Pattern mirrors the reference test fixture buildTestBamRecord
(reference: src/c++/lib/test/testAlignmentDataUtil.hpp:43-92): arbitrary
in-memory alignment records with cigar/tlen/mate/SA control, no real
sequencing data needed.
"""

from __future__ import annotations

import struct

import numpy as np

from manta_tpu.core import cigar as cg
from manta_tpu.io.bam import ReadBatch


def encode_tag(tag: bytes, typ: str, val) -> bytes:
    if typ == "Z":
        return tag + b"Z" + val.encode() + b"\x00"
    if typ == "i":
        return tag + b"i" + struct.pack("<i", val)
    if typ == "A":
        return tag + b"A" + val.encode()
    raise ValueError(typ)


def make_batch(reads: list[dict]) -> ReadBatch:
    """Each read dict: refid, pos, mapq, flag, next_refid, next_pos, tlen,
    cigar (string), seq (string), qual (int or list), name, tags (bytes)."""
    n = len(reads)
    refid = np.zeros(n, np.int32); pos = np.zeros(n, np.int32)
    mapq = np.zeros(n, np.uint8); flag = np.zeros(n, np.uint16)
    nref = np.zeros(n, np.int32); npos = np.zeros(n, np.int32)
    tlen = np.zeros(n, np.int32)
    cigar_off = np.zeros(n + 1, np.int64); seq_off = np.zeros(n + 1, np.int64)
    qual_off = np.zeros(n + 1, np.int64); name_off = np.zeros(n + 1, np.int64)
    tag_off = np.zeros(n + 1, np.int64)
    cigars, seqs, quals, names, tags = [], [], [], [], []
    for k, r in enumerate(reads):
        refid[k] = r.get("refid", 0)
        pos[k] = r.get("pos", 0)
        mapq[k] = r.get("mapq", 60)
        flag[k] = r.get("flag", 0)
        nref[k] = r.get("next_refid", -1)
        npos[k] = r.get("next_pos", -1)
        tlen[k] = r.get("tlen", 0)
        seq = r.get("seq", "A" * 100)
        cig = r.get("cigar", f"{len(seq)}M")
        ops, lens = cg.string_to_arrays(cig)
        cigars.append(((lens.astype(np.uint32) << 4) | ops.astype(np.uint32)))
        seqs.append(np.frombuffer(seq.encode(), np.uint8))
        q = r.get("qual", 30)
        if isinstance(q, int):
            q = [q] * len(seq)
        quals.append(np.array(q, np.uint8))
        names.append(np.frombuffer(r.get("name", f"read{k}").encode(), np.uint8))
        tags.append(r.get("tags", b""))
        cigar_off[k + 1] = cigar_off[k] + len(ops)
        seq_off[k + 1] = seq_off[k] + len(seq)
        qual_off[k + 1] = qual_off[k] + len(seq)
        name_off[k + 1] = name_off[k] + len(names[-1])
        tag_off[k + 1] = tag_off[k] + len(tags[-1])
    return ReadBatch(
        n=n, refid=refid, pos=pos, mapq=mapq, flag=flag, next_refid=nref,
        next_pos=npos, tlen=tlen, cigar_off=cigar_off,
        cigar=np.concatenate(cigars) if cigars else np.zeros(0, np.uint32),
        seq_off=seq_off,
        seq=np.concatenate(seqs) if seqs else np.zeros(0, np.uint8),
        qual_off=qual_off,
        qual=np.concatenate(quals) if quals else np.zeros(0, np.uint8),
        name_off=name_off,
        name=np.concatenate(names) if names else np.zeros(0, np.uint8),
        tag_off=tag_off, tags=b"".join(tags),
    )
