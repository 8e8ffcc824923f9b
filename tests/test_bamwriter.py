"""BAM writer round-trip through the native reader + BAI queries."""

import numpy as np

from manta_tpu.io.bam import BamReader
from manta_tpu.io.bamwriter import BamWriter


def test_bam_roundtrip(tmp_path, tumor_bam):
    src = BamReader(tumor_bam)
    tid = src.header.name_to_tid["8"]
    batch = src.fetch(tid, 107650000, 107660000)
    assert batch.n > 100

    out = str(tmp_path / "rt.bam")
    w = BamWriter(out, src.header.text, src.header.ref_names,
                  src.header.ref_lengths)
    for i in range(batch.n):
        w.add_record(batch, i, b"ZMZtest|PR\x00")
    w.close()

    rd = BamReader(out)
    got = rd.read_all()
    assert got.n == batch.n
    # spot-check full field fidelity on a sample of records
    for i in range(0, batch.n, max(1, batch.n // 25)):
        assert got.refid[i] == batch.refid[i]
        assert got.pos[i] == batch.pos[i]
        assert got.flag[i] == batch.flag[i]
        assert got.mapq[i] == batch.mapq[i]
        assert got.tlen[i] == batch.tlen[i]
        assert got.name_str(i) == batch.name_str(i)
        assert got.seq_str(i) == batch.seq_str(i)
        np.testing.assert_array_equal(got.qual_arr(i), batch.qual_arr(i))
        np.testing.assert_array_equal(
            got.cigar[got.cigar_off[i]:got.cigar_off[i + 1]],
            batch.cigar[batch.cigar_off[i]:batch.cigar_off[i + 1]])
        assert got.get_tag(i, b"ZM") == "test|PR"
        # original tags preserved too
        assert got.get_tag(i, b"RG") == batch.get_tag(i, b"RG")

    # BAI-driven region fetch returns same-chromosome overlapping reads
    sub = rd.fetch(tid, 107653000, 107653500)
    assert sub.n > 0
    assert all(int(sub.refid[i]) == tid for i in range(sub.n))


def test_native_encode_parity(tumor_bam):
    """Native mt_bam_encode must byte-match the pure-Python encoder."""
    from manta_tpu.io.bamwriter import _encode_group, encode_record
    import struct

    src = BamReader(tumor_bam)
    tid = src.header.name_to_tid["8"]
    batch = src.fetch(tid, 107650000, 107655000)
    assert batch.n > 50
    idx = list(range(0, batch.n, 3))
    extras = [b"" if k % 2 else b"ZMZsv%d|SR\x00" % k
              for k in range(len(idx))]
    blob, out_off, out_end = _encode_group(batch, idx, extras)
    raw = blob.tobytes()
    for k, i in enumerate(idx):
        want = encode_record(batch, i, extras[k])
        got = raw[out_off[k]:out_off[k + 1]]
        assert struct.unpack_from("<I", got)[0] == len(want)
        assert got[4:] == want


def test_external_merge_writer_parity(tmp_path, tumor_bam):
    """External-merge path (spill_run + merge_runs_to_bam): identical
    record multiset and (tid,pos) order vs the in-memory writer, and a
    working BAI (fetch parity). The merge is the WGS-scale generation
    path (runs compressed BGZF, chunked contiguous-range inflation)."""
    import numpy as np

    from manta_tpu.io.bam import BamReader
    from manta_tpu.io.bamwriter import (
        BamWriter, merge_runs_to_bam, spill_run,
    )
    r = BamReader(tumor_bam)
    names, lens = r.header.ref_names, r.header.ref_lengths
    hdr = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{L}\n" for n, L in zip(names, lens))
    b1 = r.fetch("8", 107650000, 107660000)
    b2 = r.fetch("11", 94970000, 94990000)
    assert b1.n and b2.n

    mem = str(tmp_path / "mem.bam")
    bw0 = BamWriter(mem, hdr, names, lens)
    for b in (b1, b2):
        bw0._groups.append([b, list(range(b.n)), [b""] * b.n])
    bw0.close()

    ext = str(tmp_path / "ext.bam")
    bw1 = BamWriter(ext, hdr, names, lens)
    bw1._groups.append([b2, list(range(b2.n)), [b""] * b2.n])
    spill_run(bw1, str(tmp_path / "run0"))
    bw1._groups.append([b1, list(range(b1.n)), [b""] * b1.n])
    spill_run(bw1, str(tmp_path / "run1"))
    n = merge_runs_to_bam(
        [str(tmp_path / "run0"), str(tmp_path / "run1")], ext, hdr,
        names, lens, chunk_records=1000)
    assert n == b1.n + b2.n

    A = BamReader(mem).read_all()
    B = BamReader(ext).read_all()
    assert A.n == B.n
    assert np.array_equal(A.refid, B.refid)
    assert np.array_equal(A.pos, B.pos)

    def key(X):
        return sorted(
            (bytes(X.name[X.name_off[i]:X.name_off[i + 1]]),
             int(X.flag[i]), int(X.pos[i]),
             bytes(X.seq[X.seq_off[i]:X.seq_off[i + 1]]),
             X.cigar[X.cigar_off[i]:X.cigar_off[i + 1]].tobytes())
            for i in range(X.n))
    assert key(A) == key(B)
    fa = BamReader(mem).fetch("11", 94975000, 94980000)
    fb = BamReader(ext).fetch("11", 94975000, 94980000)
    assert fa.n == fb.n and np.array_equal(fa.pos, fb.pos)
