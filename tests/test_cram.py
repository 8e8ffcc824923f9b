"""CRAM 3.0 decoder tests: parity with the reference's bundled
CRAM/BAM test pair, .crai region fetch, synthetic round-trips over the
full codec surface (via the test-support encoder in cramgen.py), and
lossless re-reading of a real demo BAM through the CRAM path."""

import os
import struct

import numpy as np
import pytest

from cramgen import CramRec, write_cram
from manta_tpu.io.bam import BamReader, open_alignment_reader
from manta_tpu.io.cram import CramReader

import os as _os

_VTD = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "data", "htsapi") + _os.sep
TD = (_VTD if _os.path.isdir(_VTD)
      else "/root/reference/src/c++/lib/htsapi/test/testData/")

_TAG_SIZE = {ord("A"): 1, ord("c"): 1, ord("C"): 1, ord("s"): 2,
             ord("S"): 2, ord("i"): 4, ord("I"): 4, ord("f"): 4}


def aux_split(blob: bytes):
    """Split a BAM aux blob into (tag, type_char, raw value bytes)."""
    out = []
    i = 0
    while i + 3 <= len(blob):
        tag = blob[i:i + 2].decode()
        typ = blob[i + 2]
        i += 3
        if typ in _TAG_SIZE:
            sz = _TAG_SIZE[typ]
            out.append((tag, chr(typ), blob[i:i + sz]))
            i += sz
        elif typ in (ord("Z"), ord("H")):
            end = blob.index(0, i)
            out.append((tag, chr(typ), blob[i:end + 1]))
            i = end + 1
        elif typ == ord("B"):
            sub = blob[i]
            (cnt,) = struct.unpack_from("<I", blob, i + 1)
            sz = 5 + _TAG_SIZE[sub] * cnt
            out.append((tag, chr(typ), blob[i:i + sz]))
            i += sz
        else:
            raise ValueError(chr(typ))
    return out


def batch_rows(b):
    rows = []
    for i in range(b.n):
        rows.append((
            int(b.refid[i]), int(b.pos[i]), int(b.mapq[i]), int(b.flag[i]),
            int(b.next_refid[i]), int(b.next_pos[i]), int(b.tlen[i]),
            b.name_str(i), b.seq_str(i), bytes(b.qual_arr(i)),
            list(b.cigar_arr(i)),
            aux_split(bytes(b.tags[b.tag_off[i]:b.tag_off[i + 1]])),
        ))
    return rows


def test_reference_cram_matches_bam():
    bam = BamReader(TD + "alignment_test.bam").read_all()
    cram = CramReader(TD + "alignment_test.cram",
                      reference=TD + "alignment_test.fasta").read_all()
    assert cram.n == bam.n == 4
    assert batch_rows(cram) == batch_rows(bam)


def test_reference_cram_fetch_via_crai():
    rd = CramReader(TD + "alignment_test.cram",
                    reference=TD + "alignment_test.fasta")
    bm = BamReader(TD + "alignment_test.bam")
    assert rd.index is not None
    for (ref, beg, end) in [("chrA", 0, 10), ("chrB", 0, 14),
                            ("chrB", 7, 8), ("chrA", 9, 10)]:
        got = batch_rows(rd.fetch(ref, beg, end))
        want = batch_rows(bm.fetch(ref, beg, end))
        assert got == want, (ref, beg, end)


def test_open_alignment_reader_dispatch():
    rd = open_alignment_reader(TD + "alignment_test.cram",
                               reference=TD + "alignment_test.fasta")
    assert isinstance(rd, CramReader)
    rd2 = open_alignment_reader(TD + "alignment_test.bam")
    assert isinstance(rd2, BamReader)
    with pytest.raises(ValueError, match="open_alignment_reader"):
        BamReader(TD + "alignment_test.cram")


def _write_ref_fasta(path, chroms):
    with open(path, "w") as f, open(path + ".fai", "w") as fi:
        off = 0
        for name, seq in chroms:
            hdr = f">{name}\n"
            f.write(hdr)
            off += len(hdr)
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60].decode() + "\n")
            nlines = (len(seq) + 59) // 60
            fi.write(f"{name}\t{len(seq)}\t{off}\t60\t61\n")
            off += len(seq) + nlines


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    rng = np.random.default_rng(7)
    tmp = tmp_path_factory.mktemp("cram")
    chrA = bytes(rng.choice(list(b"ACGT"), 5000).astype(np.uint8))
    chrB = bytes(rng.choice(list(b"ACGT"), 3000).astype(np.uint8))
    fa = str(tmp / "ref.fa")
    _write_ref_fasta(fa, [("c1", chrA), ("c2", chrB)])

    def mkread(name, ref, refseq, pos, cigar, flag=0, mapq=37, subs=(),
               tags=(), mate=None, qual=True):
        seq = bytearray()
        g = pos
        for op, ln in cigar:
            if op == "M":
                seq += refseq[g:g + ln]
                g += ln
            elif op in "IS":
                seq += bytes(rng.choice(list(b"ACGT"), ln).astype(np.uint8))
            elif op in "DN":
                g += ln
        for sp in subs:
            seq[sp] = {65: 67, 67: 71, 71: 84, 84: 65}[seq[sp]]
        q = bytes(rng.integers(2, 41, len(seq)).astype(np.uint8)) \
            if qual else None
        return CramRec(name, flag, ref, pos, mapq, cigar, bytes(seq), q,
                       tags=tags, mate=mate)

    recs = [
        # pair linked within the slice (NF chain)
        mkread("p1", 0, chrA, 100, [("M", 100)], flag=0x1 | 0x40 | 0x20,
               subs=(5, 50), mate=("downstream", 0)),
        mkread("p1", 0, chrA, 300, [("S", 10), ("M", 80), ("I", 3),
                                    ("M", 7)], flag=0x1 | 0x80 | 0x10),
        # detached mate on the other chromosome, with SA/NM tags
        mkread("d1", 0, chrA, 500, [("M", 60), ("D", 5), ("M", 40)],
               flag=0x1 | 0x40 | 0x8 | 0x20, mate=("detached", 1, 999, 0),
               tags=[("SA", "Z", b"c2,1000,+,60S40M,30,2;\x00"),
                     ("NM", "i", struct.pack("<i", 3))]),
        # refskip + hardclip, qualities not stored
        mkread("n1", 0, chrA, 700, [("H", 5), ("M", 30), ("N", 100),
                                    ("M", 30)], qual=False),
        # unmapped read placed at its mate's position
        CramRec("u1", 0x1 | 0x4 | 0x40, 0, 900, 0, [], b"ACGTACGTAC",
                bytes(rng.integers(2, 41, 10).astype(np.uint8)),
                mate=("detached", 0, 900, 0)),
        mkread("q1", 1, chrB, 50, [("M", 75)], subs=(0, 74)),
        mkread("q2", 1, chrB, 200, [("M", 20), ("I", 1), ("M", 59)],
               tags=[("XT", "A", b"U")]),
    ]
    return tmp, fa, chrA, chrB, recs


@pytest.mark.parametrize("compress", ["gzip", "rans0", "rans1", "mixed",
                                      None])
def test_synthetic_roundtrip(synth, compress):
    tmp, fa, chrA, chrB, recs = synth
    path = str(tmp / f"t_{compress}.cram")
    write_cram(path, ["c1", "c2"], [len(chrA), len(chrB)],
               {0: chrA, 1: chrB}, recs, compress=compress,
               per_container=4)
    b = CramReader(path, reference=fa).read_all()
    assert b.n == len(recs)
    ops = "MIDNSHP=X"
    for i, r in enumerate(recs):
        assert b.name_str(i) == r.name
        assert int(b.pos[i]) == r.pos
        assert int(b.refid[i]) == r.ref_id
        assert b.seq_str(i) == r.seq.decode()
        if r.qual is not None:
            assert bytes(b.qual_arr(i)) == r.qual
        else:
            assert all(q == 0xFF for q in b.qual_arr(i))
        if r.cigar:
            got = [(int(c) >> 4, ops[int(c) & 0xF])
                   for c in b.cigar_arr(i)]
            assert got == [(n, op) for op, n in r.cigar]
        if not (r.flag & 0x4):
            assert int(b.mapq[i]) == r.mapq
    # in-slice mate resolution restored both directions
    assert int(b.next_refid[0]) == 0 and int(b.next_pos[0]) == 300
    assert int(b.next_refid[1]) == 0 and int(b.next_pos[1]) == 100
    assert int(b.flag[0]) & 0x20
    assert int(b.tlen[0]) == -int(b.tlen[1]) and int(b.tlen[0]) > 0
    # detached mate fields + tags
    assert int(b.next_refid[2]) == 1 and int(b.next_pos[2]) == 999
    assert b.get_tag(2, b"SA").startswith("c2,1000")
    assert b.get_tag(2, b"NM") == 3
    assert b.get_tag(6, b"XT") == "U"


def test_demo_bam_through_cram_is_lossless(tmp_path, demo_fasta,
                                           normal_bam):
    """Convert a real demo BAM into CRAM with the test encoder and
    re-read it: every ReadBatch field must match the BAM byte for
    byte (tags compared as parsed sets since CRAM's tag dictionary
    preserves order)."""
    src = BamReader(normal_bam)
    orig = src.read_all()
    from manta_tpu.io.fasta import FastaReader
    fr = FastaReader(demo_fasta)
    ref_seqs = {tid: fr.fetch(nm, 0, fr.chrom_length(nm))
                for tid, nm in enumerate(src.header.ref_names)
                if nm in fr._index}
    ops = "MIDNSHP=X"
    recs = []
    for i in range(orig.n):
        flag = int(orig.flag[i])
        cigar = [(ops[int(c) & 0xF], int(c) >> 4)
                 for c in orig.cigar_arr(i)]
        qual = bytes(orig.qual_arr(i))
        if qual and qual[0] == 0xFF:
            qual = None
        mate = None
        if flag & 0x1:
            mate = ("detached", int(orig.next_refid[i]),
                    int(orig.next_pos[i]), int(orig.tlen[i]))
        tags = aux_split(bytes(
            orig.tags[orig.tag_off[i]:orig.tag_off[i + 1]]))
        recs.append(CramRec(
            orig.name_str(i), flag, int(orig.refid[i]), int(orig.pos[i]),
            int(orig.mapq[i]), cigar, orig.seq_str(i).encode(), qual,
            tags=tags, mate=mate))
    path = str(tmp_path / "demo.cram")
    write_cram(path, src.header.ref_names, src.header.ref_lengths,
               ref_seqs, recs, compress="mixed", per_container=500)
    got = CramReader(path, reference=demo_fasta).read_all()
    assert got.n == orig.n
    assert batch_rows(got) == batch_rows(orig)


def test_fetch_without_crai_uses_container_scan(synth):
    """Generated CRAMs have no .crai; the reader must still serve
    region queries via the container-header scan index."""
    tmp, fa, chrA, chrB, recs = synth
    path = str(tmp / "t_gzip.cram")  # written by the roundtrip test
    if not os.path.exists(path):
        write_cram(path, ["c1", "c2"], [len(chrA), len(chrB)],
                   {0: chrA, 1: chrB}, recs, compress="gzip",
                   per_container=4)
    rd = CramReader(path, reference=fa)
    assert rd.index is not None and len(rd.index.entries) >= 2
    got = rd.fetch("c2", 40, 130)
    assert got.n == 1 and got.name_str(0) == "q1"
    got = rd.fetch("c1", 0, 5000)
    names = {got.name_str(i) for i in range(got.n)}
    assert names == {"p1", "d1", "n1", "u1"}
    assert rd.fetch("c2", 2900, 3000).n == 0
